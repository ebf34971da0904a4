"""Measure the full paper schedule ladder on one chip (not the driver bench).

Extends bench.py's protocol to all three paper schedules for PixArt-α 256
(reference RTX A6000 wall-clock speedups: ours_fast 1.97×, ours_faster
2.40×, ours_fastest 2.58× — SURVEY.md §6). Prints one JSON line per
schedule. Run manually; `bench.py` remains the driver's single-metric
entry point.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync/time_denoise/BATCH etc.

LADDER = {
    "ours_fast": 165.74 / 84.09,
    "ours_faster": 165.74 / 69.17,
    "ours_fastest": 165.74 / 64.24,
}
SCHED_DIR = (  # vendored paper artifacts (schedules/README.md)
    pathlib.Path(__file__).resolve().parent.parent
    / "schedules/schedules_in_paper/pixart_alpha_256"
)


def main() -> None:
    import jax

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    config = PixArtConfig()
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (bench.BATCH, config.text_len, config.caption_dim)
    text = jax.random.normal(k1, shape).astype(config.dtype)
    neg = jax.random.normal(k2, shape).astype(config.dtype)
    noise = jax.random.normal(
        k3,
        (bench.BATCH, config.sample_size, config.sample_size,
         config.in_channels),
    ).astype(config.dtype)

    uncached = PixArtPipeline(pcfg, params, PixArtCacheSchedule.default())
    t_uncached = bench.time_denoise(uncached, params, text, neg, noise)

    for name, ref_speedup in LADDER.items():
        sched = PixArtCacheSchedule.from_json(SCHED_DIR / f"{name}.json")
        pipe = PixArtPipeline(pcfg, params, sched)
        t = bench.time_denoise(pipe, params, text, neg, noise)
        speedup = t_uncached / t
        print(
            json.dumps(
                {
                    "metric": f"pixart_alpha_256_{name}_wallclock_speedup",
                    "value": round(speedup, 4),
                    "unit": "x_vs_uncached",
                    "vs_baseline": round(speedup / ref_speedup, 4),
                    "detail": {
                        "batch": bench.BATCH,
                        "uncached_ms_per_image": round(
                            t_uncached / bench.BATCH * 1e3, 3
                        ),
                        "cached_ms_per_image": round(t / bench.BATCH * 1e3, 3),
                        "device": str(jax.devices()[0]),
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Stepwise (population-eval) mode throughput on one chip.

The NSGA-II evaluator runs candidates through `denoise_stepwise`: memoized
per-(step, mask) programs shared across the whole population (the TPU
answer to "72 schedules would need 72 compiled programs"). This measures,
with the full-size PixArt-α 256 model:

  1. per-image wall clock for ours_fast in stepwise mode (vs the unrolled
     serving mode bench.py measures),
  2. step-program pool reuse when a second schedule (ours_faster) runs on
     the same resident pipeline,

and prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync + cache-dir setup

SCHED_DIR = (  # vendored paper artifacts (schedules/README.md)
    pathlib.Path(__file__).resolve().parent.parent
    / "schedules/schedules_in_paper/pixart_alpha_256"
)
BATCH = 32
SAMPLES = 5


def time_stepwise(pipe, noise, text, neg) -> float:
    bench.sync(pipe.denoise_stepwise(noise, text, neg))  # compile + warm

    def run(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = pipe.denoise_stepwise(noise, text, neg)
        bench.sync(out)
        return time.perf_counter() - t0

    t1 = min(run(1) for _ in range(2))
    tk = min(run(1 + SAMPLES) for _ in range(2))
    return (tk - t1) / SAMPLES


def main() -> None:
    import jax

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    config = PixArtConfig()
    _, params = init_params(config, 0)
    pipe = PixArtPipeline(
        PixArtPipelineConfig(model=config),
        params,
        PixArtCacheSchedule.from_json(SCHED_DIR / "ours_fast.json"),
    )

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (BATCH, config.text_len, config.caption_dim)
    text = jax.random.normal(k1, shape).astype(config.dtype)
    neg = jax.random.normal(k2, shape).astype(config.dtype)
    noise = jax.random.normal(
        k3,
        (BATCH, config.sample_size, config.sample_size, config.in_channels),
    ).astype(config.dtype)

    results = {}
    for name in ("ours_fast", "ours_faster"):
        pool_before = len(pipe._step_fns)
        t_compile0 = time.perf_counter()
        pipe.set_schedule(
            PixArtCacheSchedule.from_json(SCHED_DIR / f"{name}.json")
        )
        t = time_stepwise(pipe, noise, text, neg)
        wall = time.perf_counter() - t_compile0
        pool_after = len(pipe._step_fns)
        results[name] = t
        print(
            json.dumps(
                {
                    "metric": f"pixart_alpha_256_{name}_stepwise_ms_per_image",
                    "value": round(t / BATCH * 1e3, 3),
                    "unit": "ms",
                    "detail": {
                        "batch": BATCH,
                        "new_step_programs": pool_after - pool_before,
                        "pool_size": pool_after,
                        "total_wall_incl_compile_s": round(wall, 1),
                        "device": str(jax.devices()[0]),
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

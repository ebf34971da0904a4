"""Cross-check the bench timer against a jax.profiler device trace.

bench.py's `time_fn` measures per-run wall clock through pipelined
dispatch deltas with scalar-fetch syncs, because `block_until_ready` is a
no-op on the tunneled TPU backend (VERDICT r2 weak item 6 asks for one
independent confirmation). This script:

1. builds the headline bench workload (PixArt-α 256, ours_fast, batch 32,
   denoise + VAE decode — the exact bench.py timed region),
2. times it with bench.time_fn,
3. wraps K untimed repetitions in a jax.profiler trace and sums the
   device-side XLA module execution events from the perfetto JSON,
4. prints both numbers and their ratio; the paragraph in
   docs/benchmarking.md quotes the result.

The trace's device time excludes host dispatch entirely, so
device_ms ≤ timer_ms is expected; agreement within ~10% means the timer
is measuring device execution, not tunnel artifacts.
"""

from __future__ import annotations

import glob
import gzip
import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

K = 4


def device_ms_from_trace(trace_dir: str, runs: int) -> tuple[float, dict]:
    """Sum device-track event durations from the perfetto trace, grouped
    by top-level XLA module name, divided by `runs`."""
    paths = glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True
    )
    assert paths, f"no trace files under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device tracks: process names like "/device:TPU:0" or "TPU:0"
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
        and "host" not in str(e.get("args", {}).get("name", "")).lower()
    }
    by_module: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        args = e.get("args", {}) or {}
        # top-level module executions carry run_id / program_id args in
        # XLA traces; fall back to jit_ prefix names
        if "run_id" in args or name.startswith("jit_"):
            key = name.split(".")[0]
            by_module[key] = by_module.get(key, 0.0) + e.get("dur", 0.0)
    total_ms = sum(by_module.values()) / 1e3 / runs
    return total_ms, {
        k: round(v / 1e3 / runs, 3) for k, v in by_module.items()
    }


def main() -> None:
    import jax

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig

    config = PixArtConfig()
    _, params = init_params(config, 0)
    params = serving_cast(params, config.dtype)
    pcfg = PixArtPipelineConfig(model=config)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    import jax.numpy as jnp  # noqa: F401

    text = jax.random.normal(
        k1, (bench.BATCH, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    neg = jax.random.normal(
        k2, (bench.BATCH, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    noise = jax.random.normal(
        k3,
        (bench.BATCH, config.sample_size, config.sample_size,
         config.in_channels),
    ).astype(config.dtype)
    vae = random_decoder_pipeline(latent_channels=config.in_channels)

    pipe = PixArtPipeline(pcfg, params, bench.load_schedule())
    fn = pipe.build_denoise_fn(donate=False)

    def one():
        return vae.decode_device(fn(params, noise, text, neg, None, None))

    timer_sec = bench.time_fn(one)
    timer_ms = timer_sec * 1e3

    trace_dir = tempfile.mkdtemp(prefix="prof_")
    bench.sync_image(one())  # ensure warm before tracing
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(K):
            out = one()
        bench.sync_image(out)
    device_ms, by_module = device_ms_from_trace(trace_dir, K)

    print(
        json.dumps(
            {
                "metric": "bench_timer_vs_profiler_device_ms",
                "value": round(timer_ms, 2),
                "unit": "ms_per_run",
                "detail": {
                    "profiler_device_ms_per_run": round(device_ms, 2),
                    "ratio_timer_over_device": round(
                        timer_ms / device_ms, 3
                    )
                    if device_ms
                    else None,
                    "per_module_ms": by_module,
                    "runs_traced": K,
                    "workload": "bench.py headline region (ours_fast, "
                    f"batch {bench.BATCH}, denoise + VAE decode)",
                    "trace_dir": trace_dir,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Push the single-chip 12B FLUX.1-dev batch to the 16 GiB HBM limit.

The reference's A6000 flux_256 rows amortize fixed costs over batch 18
(BASELINE.md); our int8_w + float8-cache rows previously stopped at
batch 4 (852 ms/img uncached). docs/flux_hbm_accounting.md predicts
batch 6-8 fits. This sweep measures ms/img at increasing batch until the
allocator refuses, reports the best as the `batch_max` row, and re-runs
ours_fast at the winning batch (cached schedules ADD cache HBM, so the
cached winner can be a smaller batch — measured, not assumed).

Round 5 (VERDICT r4 #2): the r4 sweep measured batch 6/8 WORSE per
image than batch 4 (852.5 -> 1018.4 -> 945.6 ms/img) and stopped without
its summary. This version (a) runs to the OOM boundary, (b) records
XLA's compiled memory_analysis per batch (peak/temp/argument bytes — the
HBM-pressure hypothesis is testable, not guessed), and (c) traces one
denoise at the best and the most-regressed batch and buckets device time
with bench_profile_breakdown's classifier, so the summary names WHERE
the extra per-image time goes (attention / projections / other).

Usage: python scripts/flux_12b_batch_sweep.py [batches...]  (default
4 6 8 10 12)
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import bench  # noqa: E402  (repo-root: sync + compile-cache env)
from bench_profile_breakdown import _classify, _device_events  # noqa: E402
from flux_12b_single_chip import GIB, LADDER, SCHED_DIR, time_flux  # noqa: E402


def _is_oom(e: Exception) -> bool:
    s = str(e)
    return "RESOURCE_EXHAUSTED" in s or "Out of memory" in s


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecad_tpu.models.common import random_serving_params
    from ecad_tpu.models.flux import FluxConfig, init_flux_params
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines.flux_pipeline import (
        FluxPipeline,
        FluxPipelineConfig,
    )
    from ecad_tpu.schedules import FluxCacheSchedule

    batches = [int(a) for a in sys.argv[1:]] or [4, 6, 8, 10, 12]

    config = FluxConfig(quant="int8_w", cache_dtype=jnp.float8_e4m3fn)
    shape_tree = jax.eval_shape(lambda: init_flux_params(config, 0)[1])
    params = random_serving_params(shape_tree)
    weight_bytes = sum(
        leaf.size * leaf.dtype.itemsize for leaf in jax.tree.leaves(params)
    )
    print(f"weights: {weight_bytes / GIB:.2f} GiB on device", flush=True)
    pcfg = FluxPipelineConfig(model=config, height=256, width=256)
    vae = random_decoder_pipeline(latent_channels=16)

    def inputs(b):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
        return (
            jax.random.normal(
                k1, (b, pcfg.image_seq_len, config.in_channels)
            ).astype(config.dtype),
            jax.random.normal(
                k2, (b, config.text_len, config.joint_dim)
            ).astype(config.dtype),
            jax.random.normal(k3, (b, config.pooled_dim)).astype(
                config.dtype
            ),
        )

    def pipe_for(name, b):
        sched = (
            None
            if name == "uncached"
            else FluxCacheSchedule.from_json(SCHED_DIR / f"{name}.json")
        )
        return FluxPipeline(pcfg, params, sched), inputs(b)

    def measure(name, b):
        pipe, (noise, txt, pooled) = pipe_for(name, b)
        t = time_flux(pipe, params, noise, txt, pooled, vae)
        return t / b * 1e3

    def mem_analysis(b) -> dict:
        """XLA's own accounting of the uncached denoise program at batch
        `b` (the VAE decode is a separate, smaller program)."""
        pipe, (noise, txt, pooled) = pipe_for("uncached", b)
        fn = pipe.build_denoise_fn(donate=False)
        ma = fn.lower(params, noise, txt, pooled).compile().memory_analysis()
        return {
            "argument_GiB": round(ma.argument_size_in_bytes / GIB, 2),
            "temp_GiB": round(ma.temp_size_in_bytes / GIB, 3),
            "peak_GiB": round(
                (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes) / GIB, 2),
        }

    def bucket_profile(b) -> dict:
        """One traced uncached denoise+decode at batch `b`, device time
        bucketed per image (attention/projections/vae/other)."""
        import tempfile

        pipe, (noise, txt, pooled) = pipe_for("uncached", b)
        from ecad_tpu.models.flux import unpack_latents

        gh, gw = pipe.config.grid_hw
        fn = pipe.build_denoise_fn(donate=False)

        def one():
            return vae.decode_device(
                unpack_latents(fn(params, noise, txt, pooled), gh, gw)
            )

        bench.sync_image(one())  # warm
        trace_dir = tempfile.mkdtemp(prefix=f"sweep_b{b}_")
        with jax.profiler.trace(trace_dir):
            bench.sync_image(one())
        buckets, _ = _classify(_device_events(trace_dir))
        return {
            k: round(v / 1e3 / b, 2) for k, v in buckets.items()
        }  # device ms per image

    sweep = {}
    mem = {}
    best_b, best_ms = None, float("inf")
    for b in batches:
        try:
            ms = measure("uncached", b)
        except Exception as e:  # noqa: BLE001 — OOM stops the sweep
            if not _is_oom(e):
                raise
            sweep[str(b)] = "OOM"
            print(json.dumps({"batch": b, "uncached": "OOM"}), flush=True)
            break
        sweep[str(b)] = round(ms, 2)
        try:
            mem[str(b)] = mem_analysis(b)
        except Exception as e:  # noqa: BLE001 — analysis is best-effort
            mem[str(b)] = f"unavailable: {type(e).__name__}"
        print(json.dumps({"batch": b, "uncached_ms_img": round(ms, 2),
                          "memory_analysis": mem[str(b)]}), flush=True)
        if ms < best_ms:
            best_b, best_ms = b, ms

    # regression attribution: bucket the best batch and the worst
    # measured batch (the one with the largest ms/img among those that
    # ran) — per-image device time by bucket names where the regression
    # lives (VERDICT r4 #2)
    ran = {int(k): v for k, v in sweep.items() if v != "OOM"}
    worst_b = max(ran, key=ran.get)
    profiles = {}
    for b in sorted({best_b, worst_b}):
        profiles[str(b)] = bucket_profile(b)
        print(json.dumps({"bucket_profile_batch": b,
                          "device_ms_per_image": profiles[str(b)]}),
              flush=True)

    cached = {}
    for name in ("ours_fast", "ours_faster"):
        b = best_b
        while True:
            try:
                cached[name] = {
                    "batch": b,
                    "ms_per_image": round(measure(name, b), 2),
                }
                break
            except Exception as e:  # noqa: BLE001
                if not _is_oom(e):
                    raise
                if b == 1:  # OOM even at batch 1: record and move on
                    cached[name] = "OOM_at_batch_1"
                    break
                b = max(1, b // 2)
        print(json.dumps({name: cached.get(name)}), flush=True)

    print(
        json.dumps(
            {
                "metric": "flux_12b_single_chip_batch_max",
                "value": round(best_ms, 2),
                "unit": "ms_per_image_uncached",
                "vs_baseline": round(LADDER["uncached"] / best_ms, 3),
                "detail": {
                    "best_batch": best_b,
                    "sweep_uncached_ms_img": sweep,
                    "memory_analysis_per_batch": mem,
                    "bucket_profiles_device_ms_per_image": profiles,
                    "cached_rows": cached,
                    "a6000_uncached_ms_img_batch18": LADDER["uncached"],
                    "quant": "int8_w weights + float8_e4m3fn caches",
                    "protocol": "20-step denoise + VAE decode to uint8,"
                    " 256², full-width 11.9B params",
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

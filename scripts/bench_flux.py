"""FLUX 256 schedule benchmark on one chip (not the driver bench).

Measures the paper's FLUX.1-dev 256×256 schedules (reference RTX A6000:
uncached 2620.09 ms/img, ours_fast 1016.59 → 2.58×, ours_faster 778.17 →
3.37× — SURVEY.md §6) with bench.py's pipelined-dispatch timing protocol.

Full FLUX.1-dev is ~12B params → ~24 GB bf16, which does not fit a single
v5e chip (16 GB HBM), so this benches an architecture-faithful
width-reduced config: all 19 dual + 38 single blocks, the same schedule
genome/masks, head_dim 128 — only `dim` is halved (3072 → 1536, ~3B
params). The cached/uncached ratio is the quantity of interest and is
reported per schedule; absolute ms/img are NOT comparable to the
reference's full-width numbers.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync + cache-dir setup

LADDER = {
    "ours_fast": 2620.09 / 1016.59,
    "ours_faster": 2620.09 / 778.17,
}
SCHED_DIR = (  # vendored paper artifacts (schedules/README.md)
    pathlib.Path(__file__).resolve().parent.parent
    / "schedules/schedules_in_paper/flux_256"
)
BATCH = 8  # 16 exceeds 1-chip HBM by ~0.7 GB on the 20-step unrolled program
WARMUP = 2
SAMPLES = 5


def time_flux(pipe, params, noise, txt, pooled, vae) -> float:
    """Full pipeline per the reference methodology: denoise, unpack the
    packed latents, VAE-decode to uint8 pixels — all on device."""
    from ecad_tpu.models.flux import unpack_latents

    gh, gw = pipe.config.grid_hw
    fn = pipe.build_denoise_fn(donate=False)

    def one():
        return vae.decode_device(
            unpack_latents(fn(params, noise, txt, pooled), gh, gw)
        )

    return bench.time_fn(one, warmup=WARMUP, samples=SAMPLES)


def main() -> None:
    import jax

    from ecad_tpu.models.flux import FluxConfig, init_flux_params
    from ecad_tpu.pipelines.flux_pipeline import (
        FluxPipeline,
        FluxPipelineConfig,
    )
    from ecad_tpu.schedules import FluxCacheSchedule

    config = FluxConfig(dim=1536, num_heads=12)
    # bf16 params straight on device: fp32 masters as jit arguments cost
    # 11.1 GB HBM (they are cast to bf16 inside the program anyway) and
    # pushed the 20-step batch-8 program 60 MB past the 15.75 GB budget.
    from ecad_tpu.models.common import random_serving_params

    params = random_serving_params(
        jax.eval_shape(lambda: init_flux_params(config, 0)[1])
    )
    pcfg = FluxPipelineConfig(model=config, height=256, width=256)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    noise = jax.random.normal(
        k1, (BATCH, pcfg.image_seq_len, config.in_channels)
    ).astype(config.dtype)
    txt = jax.random.normal(
        k2, (BATCH, config.text_len, config.joint_dim)
    ).astype(config.dtype)
    pooled = jax.random.normal(k3, (BATCH, config.pooled_dim)).astype(
        config.dtype
    )

    from ecad_tpu.models.vae import random_decoder_pipeline

    vae = random_decoder_pipeline(latent_channels=16)

    # MFU accounting (VERDICT r4 #3): FLUX serves batch-1-per-image with
    # embedded guidance (no CFG), so the numerator is the batch-1 cost
    # table at THIS width (the schedule-metrics table is the reference's
    # batch-2 full-width calflops convention) + SDPA + the VAE decode the
    # timed protocol includes.
    from ecad_tpu.macs import (
        V5E_PEAK_BF16,
        flux_cost_table,
        hardware_flops_per_image,
        vae_decoder_flops,
    )
    from ecad_tpu.models.vae import VAEConfig

    mfu_table = flux_cost_table(256, 256, batch=1, dim=config.dim)
    vae_flops = vae_decoder_flops(
        256, 256, VAEConfig(latent_channels=16)
    )

    def mfu_fields(sched, t_batch) -> dict:
        flops = hardware_flops_per_image(
            sched, mfu_table, dim=config.dim
        ) + vae_flops
        tps = flops * BATCH / t_batch
        return {
            "flops_per_image_T": round(flops / 1e12, 3),
            "tflops_per_sec": round(tps / 1e12, 1),
            "pct_peak": round(100.0 * tps / V5E_PEAK_BF16, 1),
        }

    uncached = FluxPipeline(pcfg, params)
    t_uncached = time_flux(uncached, params, noise, txt, pooled, vae)
    default_sched = FluxCacheSchedule.default(
        num_inference_steps=pcfg.num_inference_steps,
        num_blocks=config.num_blocks,
        num_single_blocks=config.num_single_blocks,
        top_level_config={"height": 256, "width": 256},
    )
    print(
        json.dumps(
            {
                "metric": "flux_256_uncached",
                "value": round(t_uncached / BATCH * 1e3, 3),
                "unit": "ms_per_image",
                "detail": {
                    "batch": BATCH,
                    "dim": config.dim,
                    "ms_per_image": round(t_uncached / BATCH * 1e3, 3),
                    **mfu_fields(default_sched, t_uncached),
                },
            }
        ),
        flush=True,
    )

    for name, ref_speedup in LADDER.items():
        sched = FluxCacheSchedule.from_json(SCHED_DIR / f"{name}.json")
        pipe = FluxPipeline(pcfg, params, sched)
        t = time_flux(pipe, params, noise, txt, pooled, vae)
        speedup = t_uncached / t
        print(
            json.dumps(
                {
                    "metric": f"flux_256_{name}_wallclock_speedup",
                    "value": round(speedup, 4),
                    "unit": "x_vs_uncached",
                    "vs_baseline": round(speedup / ref_speedup, 4),
                    "detail": {
                        "batch": BATCH,
                        "dim": config.dim,
                        "note": "width-reduced (full dev exceeds 1-chip HBM)",
                        "uncached_ms_per_image": round(
                            t_uncached / BATCH * 1e3, 3
                        ),
                        "cached_ms_per_image": round(t / BATCH * 1e3, 3),
                        "ms_per_image": round(t / BATCH * 1e3, 3),
                        "device": str(jax.devices()[0]),
                        **mfu_fields(sched, t),
                    },
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""FLUX 1024×1024 schedule-transfer benchmark on one chip.

Mirrors BASELINE.md's FLUX-1024 rows (reference RTX A6000, batch 3):
uncached 20-step 18297.60 ms/img; ECAD 256→1024 transfer schedules
fast_256_to_1024 6959.63 (2.63×) and slow_256_to_1024 10587.71 (1.73×) —
the paper's headline resolution-transfer result (optimize at 256², apply
at 1024²; reference schedules/schedules_in_paper/flux_256_to_1024/).

Full FLUX.1-dev is ~12B params (~24 GB bf16) and does not fit one v5e
chip (16 GB HBM), so as in scripts/bench_flux.py this benches an
architecture-faithful width-reduced config: all 19 dual + 38 single
blocks, the same 3420-gene schedules, head_dim 128, 1024² packed latents
(4096 image + 512 text = 4608 joint tokens) — only `dim` is halved
(3072 → 1536). The cached/uncached ratio is the quantity of interest;
absolute ms/img are not comparable to the reference's full-width numbers.

The 4608-token joint attention runs through the Pallas flash kernel
(ops/attention.py), which measures 5.4× faster than XLA's
dot_product_attention at this shape on v5e.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync + cache-dir setup

REF_UNCACHED = 18297.60
LADDER = {
    "fast_256_to_1024": REF_UNCACHED / 6959.63,
    "slow_256_to_1024": REF_UNCACHED / 10587.71,
}
SCHED_DIR = (  # vendored paper artifacts (schedules/README.md)
    pathlib.Path(__file__).resolve().parent.parent
    / "schedules/schedules_in_paper/flux_256_to_1024"
)
BATCH = 1  # batch 2 fits (9.3 GiB per XLA memory_analysis once the fp32
# masters are gone) but measures WORSE per image on one chip (uncached
# 3678 vs 3547 ms/img, fast transfer 1368 vs 1228) — the 4608-token
# working set already saturates the chip at batch 1
WARMUP = 2
SAMPLES = 3


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
    import jax.numpy as jnp

    from ecad_tpu.models.common import set_attention_backend
    from ecad_tpu.models.flux import FluxConfig, init_flux_params
    from ecad_tpu.pipelines.flux_pipeline import (
        FluxPipeline,
        FluxPipelineConfig,
    )
    from ecad_tpu.schedules import FluxCacheSchedule

    set_attention_backend("pallas")  # flash path for the 4608-token attn

    config = FluxConfig(dim=1536, num_heads=12)
    # Serve in bf16 (FLUX.1-dev ships bf16 weights). Never materialize the
    # fp32 masters on device — see models/common.random_serving_params.
    from ecad_tpu.models.common import random_serving_params

    params = random_serving_params(
        jax.eval_shape(lambda: init_flux_params(config, 0)[1])
    )
    pcfg = FluxPipelineConfig(model=config, height=1024, width=1024)

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

    # MFU accounting (VERDICT r4 #3): batch-1 cost table at THIS width
    # (the metrics table is the reference's batch-2 full-width calflops
    # convention) + SDPA + the VAE decode the timed protocol includes.
    from ecad_tpu.macs import (
        V5E_PEAK_BF16,
        flux_cost_table,
        hardware_flops_per_image,
        vae_decoder_flops,
    )
    from ecad_tpu.models.vae import VAEConfig

    mfu_table = flux_cost_table(1024, 1024, batch=1, dim=config.dim)
    vae_flops = vae_decoder_flops(1024, 1024, VAEConfig(latent_channels=16))

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

    default = FluxCacheSchedule.from_json(
        pathlib.Path(__file__).resolve().parent.parent
        / "schedules/flux_cache_schedules/gen_default"
        / "default_1024x1024_gs_5.0_steps_20.json"
    )
    uncached = FluxPipeline(pcfg, params, default)
    t_uncached = time_flux(uncached, params, noise, txt, pooled, vae)
    print(
        json.dumps(
            {
                "metric": "flux_1024_uncached",
                "value": round(t_uncached / BATCH * 1e3, 3),
                "unit": "ms_per_image",
                "detail": {
                    "batch": BATCH,
                    "dim": config.dim,
                    "ms_per_image": round(t_uncached / BATCH * 1e3, 3),
                    **mfu_fields(default, t_uncached),
                },
            }
        ),
        flush=True,
    )

    # the step-reduced baseline the paper's transfer schedules beat:
    # default at 8 steps (reference 7607.66 ms → 2.405× vs 20-step)
    import dataclasses

    default8 = FluxCacheSchedule.from_json(
        pathlib.Path(__file__).resolve().parent.parent
        / "schedules/flux_cache_schedules/gen_default"
        / "default_1024x1024_gs_5.0_steps_08.json"
    )
    pcfg8 = dataclasses.replace(pcfg, num_inference_steps=8)
    pipe8 = FluxPipeline(pcfg8, params, default8)
    t8 = time_flux(pipe8, params, noise, txt, pooled, vae)
    ref8 = REF_UNCACHED / 7607.66
    print(
        json.dumps(
            {
                "metric": "flux_1024_default_8step_wallclock_speedup",
                "value": round(t_uncached / t8, 4),
                "unit": "x_vs_uncached_20step",
                "vs_baseline": round((t_uncached / t8) / ref8, 4),
                "detail": {
                    "batch": BATCH,
                    "ms_per_image": round(t8 / BATCH * 1e3, 3),
                    "note": "step-reduction baseline; the ECAD transfer "
                    "schedules below beat it on quality at similar cost "
                    "(paper) — here its wall-clock is the comparison",
                    **mfu_fields(default8, t8),
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
                    "metric": f"flux_1024_{name}_wallclock_speedup",
                    "value": round(speedup, 4),
                    "unit": "x_vs_uncached",
                    "vs_baseline": round(speedup / ref_speedup, 4),
                    "detail": {
                        "batch": BATCH,
                        "dim": config.dim,
                        "joint_tokens": pcfg.image_seq_len
                        + config.text_len,
                        "note": "width-reduced (full dev exceeds 1-chip"
                        " HBM); pallas flash attention",
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

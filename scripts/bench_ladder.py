"""Measure the full paper schedule ladder on one chip (not the driver bench).

Extends bench.py's protocol — full pipeline: 20-step denoise + VAE decode
to pixels, the reference's compute_latency.py methodology — to the three
paper schedules for PixArt-α 256 (reference RTX A6000 wall-clock speedups:
ours_fast 1.97×, ours_faster 2.40×, ours_fastest 2.58× — SURVEY.md §6),
the TGATE baseline family's best 256 entry (tgate_m_010_sp_005: 108.52 ms
→ 1.527× on the reference), and the pass-through overhead probe
(reference ecad/transformer_2d_models/pass_through_transformer_2d.py —
pipeline cost with the transformer removed). Prints one JSON line per
entry. Run manually; `bench.py` remains the driver's single-metric entry
point.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync/time_pipeline/BATCH etc.

REF_UNCACHED = 165.74
LADDER = {
    "ours_fast": REF_UNCACHED / 84.09,
    "ours_faster": REF_UNCACHED / 69.17,
    "ours_fastest": REF_UNCACHED / 64.24,
}
ROOT = pathlib.Path(__file__).resolve().parent.parent
SCHED_DIR = ROOT / "schedules/schedules_in_paper/pixart_alpha_256"
TGATE = (  # best-latency 256 entry of the vendored gen_tgate family
    ROOT
    / "schedules/alpha_cache_schedules/gen_tgate"
    / "tgate_m_010_sp_005_fi_001_warmup_002.json"
)
TGATE_REF_SPEEDUP = REF_UNCACHED / 108.518484375
PEAK = 197e12  # v5e per-chip MXU peak, bf16 (macs.V5E_PEAK_BF16)


def emit(
    metric, t, t_uncached, ref_speedup=None, flops_per_image=None,
    peak=None, **extra,
) -> None:
    speedup = t_uncached / t
    row = {
        "metric": metric,
        "value": round(speedup, 4),
        "unit": "x_vs_uncached",
        "detail": {
            "batch": bench.BATCH,
            "protocol": "denoise + VAE decode (reference methodology)",
            "uncached_ms_per_image": round(
                t_uncached / bench.BATCH * 1e3, 3
            ),
            "ms_per_image": round(t / bench.BATCH * 1e3, 3),
            **extra,
        },
    }
    if flops_per_image is not None:
        # MFU accounting: schedule-dependent transformer FLOPs (SDPA
        # matmuls INCLUDED — macs.hardware_flops_per_image; the NSGA-II
        # MACs objective excludes them for calflops parity) + the VAE
        # decode the timed protocol includes. pct_peak against the chip's
        # MXU peak for the serving dtype.
        tps = flops_per_image * bench.BATCH / t
        row["detail"]["tflops_per_sec"] = round(tps / 1e12, 1)
        row["detail"]["pct_peak"] = round(100.0 * tps / (peak or PEAK), 1)
        row["detail"]["flops_per_image_T"] = round(flops_per_image / 1e12, 3)
    if ref_speedup is not None:
        row["vs_baseline"] = round(speedup / ref_speedup, 4)
    print(json.dumps(row), flush=True)


def main() -> None:
    import jax

    from ecad_tpu.macs import hardware_flops_per_image, vae_decoder_flops
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.pipelines.tgate import (
        PassThroughPixArtPipeline,
        TGATEPixArtPipeline,
    )
    from ecad_tpu.schedules import PixArtCacheSchedule

    from ecad_tpu.models.common import serving_cast

    vae_fl = vae_decoder_flops(256, 256)

    config = PixArtConfig()
    _, params = init_params(config, 0)
    params = serving_cast(params, config.dtype)  # bf16 serving weights
    pcfg = PixArtPipelineConfig(model=config)
    vae = random_decoder_pipeline(latent_channels=config.in_channels)

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
    t_uncached = bench.time_pipeline(uncached, params, text, neg, noise, vae)
    emit(
        "pixart_alpha_256_uncached_mfu",
        t_uncached,
        t_uncached,
        None,
        flops_per_image=hardware_flops_per_image(
            PixArtCacheSchedule.default()
        ) + vae_fl,
        device=str(jax.devices()[0]),
    )

    for name, ref_speedup in LADDER.items():
        sched = PixArtCacheSchedule.from_json(SCHED_DIR / f"{name}.json")
        pipe = PixArtPipeline(pcfg, params, sched)
        t = bench.time_pipeline(pipe, params, text, neg, noise, vae)
        emit(
            f"pixart_alpha_256_{name}_wallclock_speedup",
            t,
            t_uncached,
            ref_speedup,
            flops_per_image=hardware_flops_per_image(sched) + vae_fl,
            device=str(jax.devices()[0]),
        )

    # PixArt-Σ rows (identical architecture — only checkpoint weights
    # differ, which random-weight timing is invariant to; the schedules
    # are the σ-optimized / α→σ-transferred masks). Reference A6000:
    # σ uncached 167.62 ms, σ ours_fast 84.84 (1.976×),
    # σ-from-α-transfer gen_250 93.68 (1.789×) — BASELINE.md.
    sigma_entries = {
        "sigma_ours_fast": (
            ROOT / "schedules/schedules_in_paper/pixart_sigma_256"
            / "ours_fast.json",
            167.62 / 84.84,
        ),
        "sigma_from_alpha_transfer": (
            ROOT
            / "schedules/schedules_in_paper/pixart_alpha_to_sigma_transfer"
            / "pixart_sigma_from_alpha_gen_250.json",
            167.62 / 93.68,
        ),
    }
    for name, (path, ref_speedup) in sigma_entries.items():
        sched = PixArtCacheSchedule.from_json(path)
        pipe = PixArtPipeline(pcfg, params, sched)
        t = bench.time_pipeline(pipe, params, text, neg, noise, vae)
        emit(
            f"pixart_sigma_256_{name}_wallclock_speedup",
            t,
            t_uncached,
            ref_speedup,
            flops_per_image=hardware_flops_per_image(sched) + vae_fl,
        )

    # TGATE heuristic baseline (reference gen_tgate family)
    tg_sched = PixArtCacheSchedule.from_json(TGATE)
    gate = tg_sched.top_level_config["pipeline"]["kwargs"]["gate_step"]
    tg = TGATEPixArtPipeline(pcfg, params, tg_sched, gate_step=gate)
    t = bench.time_pipeline(tg, params, text, neg, noise, vae)
    emit(
        "pixart_alpha_256_tgate_m10_sp5_wallclock_speedup",
        t,
        t_uncached,
        TGATE_REF_SPEEDUP,
        flops_per_image=hardware_flops_per_image(tg_sched) + vae_fl,
        gate_step=gate,
    )

    # pass-through: pipeline overhead with the transformer removed
    pt = PassThroughPixArtPipeline(pcfg, params)
    t = bench.time_pipeline(pt, params, text, neg, noise, vae)
    emit(
        "pixart_alpha_256_pass_through_overhead",
        t,
        t_uncached,
        None,
        note="sampler+decode floor; transformer replaced by zeros "
        "(reference pass_through_transformer_2d.py purpose)",
    )


if __name__ == "__main__":
    main()

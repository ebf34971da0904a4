"""Int8 (W8A8) serving at PixArt-α 1024×1024 — speed AND image fidelity.

Companion to scripts/bench_quant.py (256²) at the full-size 1024²
configuration (sample_size 128, additional size conditions, 4096 latent
tokens — the same 0.6B model as BASELINE.md's A6000 row: uncached
3706.14 ms/img). bf16 vs `PixArtConfig(quant="int8")` with identical
weights/noise/text on the uncached default and the ours_fast 256→1024
transfer schedule; reports wall-clock per mode plus final-latent /
pixel deltas. At this resolution the 4096-token D=72 self-attention
(bf16 Pallas row-block kernel, not quantized) is a larger cost share
than at 256², so the int8 speedup is expected to be smaller — this
script measures by how much.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync + timer + cache-dir setup

ROOT = pathlib.Path(__file__).resolve().parent.parent
REF_MS = {"uncached": 3706.14}  # A6000, BASELINE.md gen_default_1024x1024
BATCH = 4
WARMUP = 2
SAMPLES = 3


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    base = PixArtConfig(sample_size=128, use_additional_conditions=True)
    _, params = init_params(base, 0)
    params = serving_cast(params, base.dtype)
    vae = random_decoder_pipeline(latent_channels=base.in_channels)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    shape = (BATCH, base.text_len, base.caption_dim)
    text = jax.random.normal(k1, shape).astype(base.dtype)
    neg = jax.random.normal(k2, shape).astype(base.dtype)
    noise = jax.random.normal(
        k3, (BATCH, base.sample_size, base.sample_size, base.in_channels)
    ).astype(base.dtype)

    # calibrate static per-site activation scales on the bf16 model at
    # three representative timesteps (ops/quant.py: the static path drops
    # the per-token max-abs pass — the dominant quant overhead at 4096
    # tokens — letting XLA fuse int8 quantization into producer epilogues)
    from ecad_tpu.models.pixart import (
        PixArtTransformer,
        full_step_mask,
        init_cache,
    )
    from ecad_tpu.ops.quant import calibrate_dense_amax, merge_amax

    calib_model = PixArtTransformer(base)
    calib_cache = init_cache(base, 2)
    calib_mask = full_step_mask(base)
    res = jnp.broadcast_to(jnp.array([[1024.0, 1024.0]]), (2, 2))
    ar = jnp.ones((2, 1))
    import time as _time

    t0 = _time.perf_counter()
    act_table = merge_amax(
        *(
            calibrate_dense_amax(
                calib_model,
                {"params": params},
                noise[:2],
                text[:2],
                jnp.full((2,), tv),
                calib_cache,
                calib_mask,
                resolution=res,
                aspect_ratio=ar,
            )
            for tv in (999.0, 500.0, 20.0)
        )
    )
    act_scales = tuple(sorted(act_table.items()))
    n_sites = len(act_table)
    # drop the calibration program + its device buffers before timing:
    # the 28-block 4096-token calibration cache (~1.6 GiB) plus the
    # sow-interceptor executable's constants otherwise stay resident and
    # OOM the first 1024² timing run on the 16 GiB chip
    import gc

    del calib_model, calib_cache, calib_mask, act_table
    jax.clear_caches()
    gc.collect()
    print(
        json.dumps(
            {
                "calibration": {
                    "sites": n_sites,
                    "timesteps": [999, 500, 20],
                    "sec": round(_time.perf_counter() - t0, 1),
                }
            }
        ),
        flush=True,
    )

    schedules = {
        "uncached": PixArtCacheSchedule.from_json(
            ROOT / "schedules/alpha_cache_schedules/gen_default_1024x1024"
            / "default_1024x1024.json"
        ),
        "ours_fast_256_to_1024": PixArtCacheSchedule.from_json(
            ROOT / "schedules/schedules_in_paper/pixart_alpha_256"
            / "ours_fast.json"
        ),
    }

    results = {}
    for sched_name, sched in schedules.items():
        per_mode = {}
        for quant in (None, "int8", "int8_static"):
            cfg = PixArtConfig(
                sample_size=128,
                use_additional_conditions=True,
                quant=quant,
                act_scales=act_scales if quant == "int8_static" else None,
            )
            pipe = PixArtPipeline(PixArtPipelineConfig(model=cfg), params, sched)
            fn = pipe.build_denoise_fn(donate=False)

            def one():
                return vae.decode_device(
                    fn(params, noise, text, neg, None, None)
                )

            t = bench.time_fn(one, warmup=WARMUP, samples=SAMPLES)
            latents = fn(params, noise, text, neg, None, None)
            per_mode[quant or "bf16"] = {
                "ms_per_image": t / BATCH * 1e3,
                "latents": np.asarray(latents, np.float32),
                "pixels": np.asarray(one()),
            }

        bf16 = per_mode["bf16"]

        def _deltas(mode):
            lat_rel = float(
                np.linalg.norm(mode["latents"] - bf16["latents"])
                / max(np.linalg.norm(bf16["latents"]), 1e-9)
            )
            pix_mad = float(
                np.mean(
                    np.abs(
                        mode["pixels"].astype(np.float32)
                        - bf16["pixels"].astype(np.float32)
                    )
                )
            )
            return lat_rel, pix_mad

        int8 = per_mode["int8"]
        static = per_mode["int8_static"]
        lat_rel, pix_mad = _deltas(int8)
        lat_rel_s, pix_mad_s = _deltas(static)
        results[sched_name] = {
            "bf16_ms_per_image": round(bf16["ms_per_image"], 2),
            "int8_ms_per_image": round(int8["ms_per_image"], 2),
            "int8_static_ms_per_image": round(static["ms_per_image"], 2),
            "int8_speedup": round(
                bf16["ms_per_image"] / int8["ms_per_image"], 4
            ),
            "int8_static_speedup": round(
                bf16["ms_per_image"] / static["ms_per_image"], 4
            ),
            "final_latent_rel_err": round(lat_rel, 5),
            "pixel_mean_abs_diff_uint8": round(pix_mad, 3),
            "static_final_latent_rel_err": round(lat_rel_s, 5),
            "static_pixel_mean_abs_diff_uint8": round(pix_mad_s, 3),
        }
        print(json.dumps({sched_name: results[sched_name]}), flush=True)

    print(
        json.dumps(
            {
                "metric": "pixart_alpha_1024_int8_serving",
                "value": results["uncached"]["int8_static_speedup"],
                "unit": "x_vs_bf16",
                "vs_baseline": round(
                    REF_MS["uncached"]
                    / results["uncached"]["int8_ms_per_image"],
                    4,
                ),
                "detail": {
                    "batch": BATCH,
                    "protocol": "full pipeline: 20-step denoise + VAE decode"
                    " to 1024² uint8 pixels; identical weights/noise both"
                    " modes; vs_baseline = A6000 uncached ms / our int8 ms",
                    "schedules": results,
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

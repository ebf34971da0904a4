"""Int8 (W8A8) serving-mode benchmark: speed AND image fidelity.

Runs the headline PixArt-α 256 protocol (bench.py: 20-step denoise + VAE
decode to uint8 pixels, batch 32) twice — bf16 serving vs the int8
dynamic-quant MXU path (`PixArtConfig(quant="int8")`, ops/quant.py) and
the round-4 `int8_static` mode (per-tensor activation scales calibrated
on 3 denoise timesteps — drops the per-token max-abs VPU pass) — with
identical weights/noise/text, on both the uncached default schedule
and the paper's `ours_fast`. Reports the int8 wall-clock speedup per
schedule plus the end-image deltas (final-latent relative error and mean
absolute uint8 pixel difference), so the speed/quality trade is one
artifact. The reference has no quantized path (fp16 blocks at best,
pixart_transformer_2d_edited.py:98) — vs_baseline compares int8 ms/img
against the reference's A6000 row for the same schedule.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync + timer + cache-dir setup

REF_MS = {"default": 165.74, "ours_fast": 84.09}  # A6000, BASELINE.md
BATCH = 32


def main() -> None:
    import jax
    import numpy as np

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    config = PixArtConfig()
    _, params = init_params(config, 0)
    params = serving_cast(params, config.dtype)
    vae = random_decoder_pipeline(latent_channels=config.in_channels)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (BATCH, config.text_len, config.caption_dim)
    text = jax.random.normal(k1, shape).astype(config.dtype)
    neg = jax.random.normal(k2, shape).astype(config.dtype)
    noise = jax.random.normal(
        k3, (BATCH, config.sample_size, config.sample_size, config.in_channels)
    ).astype(config.dtype)

    # static per-site activation scales calibrated on the bf16 model
    from ecad_tpu.models.pixart import (
        PixArtTransformer,
        full_step_mask,
        init_cache,
    )
    from ecad_tpu.ops.quant import calibrate_dense_amax, merge_amax

    calib_model = PixArtTransformer(config)
    calib_cache = init_cache(config, 2)
    calib_mask = full_step_mask(config)
    import jax.numpy as jnp

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
            )
            for tv in (999.0, 500.0, 20.0)
        )
    )
    act_scales = tuple(sorted(act_table.items()))
    print(
        json.dumps({"calibration": {"sites": len(act_table),
                                    "timesteps": [999, 500, 20]}}),
        flush=True,
    )
    import gc

    del calib_model, calib_cache, calib_mask, act_table
    jax.clear_caches()
    gc.collect()

    schedules = {
        "default": PixArtCacheSchedule.default(),
        "ours_fast": bench.load_schedule(),
    }

    results = {}
    for sched_name, sched in schedules.items():
        per_mode = {}
        for quant in (None, "int8", "int8_static"):
            cfg = PixArtConfig(
                quant=quant,
                act_scales=act_scales if quant == "int8_static" else None,
            )
            pipe = PixArtPipeline(
                PixArtPipelineConfig(model=cfg), params, sched
            )
            fn = pipe.build_denoise_fn(donate=False)

            def one():
                return vae.decode_device(fn(params, noise, text, neg, None, None))

            t = bench.time_fn(one)
            latents = fn(params, noise, text, neg, None, None)
            per_mode[quant or "bf16"] = {
                "ms_per_image": t / BATCH * 1e3,
                "latents": np.asarray(latents, np.float32),
                "pixels": np.asarray(one()),
            }

        bf16, int8 = per_mode["bf16"], per_mode["int8"]
        static = per_mode["int8_static"]

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

        lat_rel, pix_mad = _deltas(int8)
        lat_rel_s, pix_mad_s = _deltas(static)
        results[sched_name] = {
            "bf16_ms_per_image": round(bf16["ms_per_image"], 3),
            "int8_ms_per_image": round(int8["ms_per_image"], 3),
            "int8_static_ms_per_image": round(static["ms_per_image"], 3),
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
                "metric": "pixart_alpha_256_int8_serving",
                "value": results["ours_fast"]["int8_speedup"],
                "unit": "x_vs_bf16",
                "vs_baseline": round(
                    REF_MS["ours_fast"]
                    / results["ours_fast"]["int8_ms_per_image"],
                    4,
                ),
                "detail": {
                    "batch": BATCH,
                    "protocol": "full pipeline: 20-step denoise + VAE decode"
                    " to uint8 pixels; identical weights/noise both modes",
                    "schedules": results,
                    "vs_baseline_note": "A6000 ours_fast ms / our int8 ms",
                    "device": str(jax.devices()[0]),
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

"""Full-width 12B FLUX.1-dev on ONE 16 GiB v5e chip via int8 weight storage.

The reference can only run this model on a 48 GB A6000
(/root/reference/ecad/transformer_2d_models/flux_transformer_2d_edited.py:92-98);
bf16 serving is 23.8 GiB of weights — over a v5e chip's 16 GiB HBM, which
is why the single-chip FLUX benches so far are width-reduced (dim 1536).
`quant="int8_w"` (ops/quant.py Int8Dense) stores every block projection
AND adaLN kernel as int8 + per-channel fp32 scale — ~11.2 GiB — and runs
the matmuls on the v5e's double-rate int8 MXU path. This script runs the
TRUE configuration (dim 3072, 19 dual + 38 single blocks, 11.9B params)
end-to-end on the one real chip:

  * full reference protocol — 20-step denoise + VAE decode to uint8
    pixels on device, 256² (BASELINE flux_256: A6000 uncached
    2620.09 ms/img, ours_fast 1016.59, ours_faster 778.17) — so the
    absolute ms/img columns are finally same-model comparable;
  * the paper's real 3420-gene schedules (vendored JSONs).

Numerics of the storage mode are bounded in tests/test_quant.py
(W8A8 rel-err ≤ 8% at fp32 tiny config; per-layer ~1%). Wall-clock is
weight-independent, so random int8-family weights measure the real thing.

Caches store as float8_e4m3fn (FluxConfig.cache_dtype) — at 256² that
is not needed for batch 1 but lets multi-image batches keep their
cache sets on chip (the A6000 reference row is batch 18).

Usage: python scripts/flux_12b_single_chip.py [--quant=MODE] [batch] [row ...]

--quant=int8_w_static (default int8_w) additionally calibrates per-site
static activation scales on 3 flow-matching times and serves with
Int8Dense.act_amax — removing the per-token max-abs VPU pass from every
block projection (VERDICT r4 #5; the PixArt 1024² result says this is
the bandwidth-bound regime's lever).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # repo-root bench.py: sync + cache-dir setup


def parse_quant(argv: list[str]) -> tuple[str, list[str]]:
    quant = "int8_w"
    rest = []
    for a in argv:
        if a.startswith("--quant="):
            quant = a.split("=", 1)[1]
            assert quant in ("int8_w", "int8_w_static"), quant
        else:
            rest.append(a)
    return quant, rest


def calibrate_static(config, params, noise, txt, pooled, grid) -> tuple:
    """Per-site activation amax on the int8_w model itself (the bf16
    full-width model does not fit one chip) at 3 flow-matching times —
    the same protocol as FluxImageGenerator._calibrate_static_scales."""
    import jax.numpy as jnp

    from ecad_tpu.models.flux import (
        FluxTransformer,
        full_flux_mask,
        init_flux_cache,
    )
    from ecad_tpu.ops.quant import calibrate_dense_amax, merge_amax

    model = FluxTransformer(config)
    b = 1
    g = jnp.full((b,), 5.0, jnp.float32)
    table = merge_amax(
        *(
            calibrate_dense_amax(
                model, {"params": params}, noise[:b], txt[:b], pooled[:b],
                jnp.full((b,), tv, jnp.float32), g, init_flux_cache(),
                full_flux_mask(config), grid,
            )
            for tv in (1.0, 0.5, 0.05)
        )
    )
    import jax

    jax.clear_caches()
    return tuple(sorted(table.items()))

GIB = 1024**3
SCHED_DIR = (
    pathlib.Path(__file__).resolve().parent.parent
    / "schedules/schedules_in_paper/flux_256"
)
LADDER = {  # BASELINE.md A6000 full-width ms/img at 256²
    "uncached": 2620.09,
    "ours_fast": 1016.59,
    "ours_faster": 778.17,
}
WARMUP = 1
SAMPLES = 3


def time_flux(pipe, params, noise, txt, pooled, vae) -> float:
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
    import numpy as np

    from ecad_tpu.models.common import random_serving_params
    from ecad_tpu.models.flux import FluxConfig, init_flux_params
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines.flux_pipeline import (
        FluxPipeline,
        FluxPipelineConfig,
    )
    from ecad_tpu.schedules import FluxCacheSchedule

    import jax.numpy as jnp

    quant, argv = parse_quant(sys.argv[1:])
    batch = int(argv[0]) if argv else 1
    rows = argv[1:] or list(LADDER)
    unknown = [r for r in rows if r not in LADDER]
    assert not unknown, f"unknown rows {unknown}; choose from {list(LADDER)}"

    config = FluxConfig(  # dim 3072, 19 + 38 blocks
        quant="int8_w", cache_dtype=jnp.float8_e4m3fn
    )
    shape_tree = jax.eval_shape(lambda: init_flux_params(config, 0)[1])
    n_params = sum(
        int(np.prod(l.shape)) for l in jax.tree.leaves(shape_tree)
    )
    params = random_serving_params(shape_tree)
    weight_bytes = sum(
        l.size * l.dtype.itemsize for l in jax.tree.leaves(params)
    )
    print(
        f"params: {n_params/1e9:.3f}B, {weight_bytes/GIB:.2f} GiB on device "
        f"(bf16 would be {n_params*2/GIB:.1f} GiB; HBM is 16 GiB)",
        flush=True,
    )
    assert n_params > 11.8e9, "full-width FLUX should be ~11.9B params"
    assert weight_bytes < 12.5 * GIB, "storage quantization did not engage"

    pcfg = FluxPipelineConfig(model=config, height=256, width=256)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    noise = jax.random.normal(
        k1, (batch, pcfg.image_seq_len, config.in_channels)
    ).astype(config.dtype)
    txt = jax.random.normal(
        k2, (batch, config.text_len, config.joint_dim)
    ).astype(config.dtype)
    pooled = jax.random.normal(k3, (batch, config.pooled_dim)).astype(
        config.dtype
    )
    vae = random_decoder_pipeline(latent_channels=16)

    if quant == "int8_w_static":
        import dataclasses

        scales = calibrate_static(
            config, params, noise, txt, pooled, pcfg.grid_hw
        )
        print(f"calibrated {len(scales)} static activation sites", flush=True)
        # quality guardrail: static per-tensor scales vs the int8_w
        # baseline (per-token dynamic) on the SAME 20-step uncached
        # denoise — the bf16 reference doesn't fit one chip, so int8_w
        # (whose PixArt analogue is quality-checked against bf16 in
        # bench_quant_1024.py) is the comparison anchor
        base_lat = FluxPipeline(pcfg, params, None).build_denoise_fn(
            donate=False)(params, noise[:1], txt[:1], pooled[:1])
        base_lat = np.asarray(base_lat, np.float32)
        config = dataclasses.replace(
            config, quant="int8_w_static", act_scales=scales
        )
        pcfg = dataclasses.replace(pcfg, model=config)
        stat_lat = FluxPipeline(pcfg, params, None).build_denoise_fn(
            donate=False)(params, noise[:1], txt[:1], pooled[:1])
        stat_lat = np.asarray(stat_lat, np.float32)
        rel = float(
            np.linalg.norm(stat_lat - base_lat) / np.linalg.norm(base_lat)
        )
        print(
            json.dumps(
                {
                    "int8_w_static_quality": {
                        "final_latent_rel_err_vs_int8_w": round(rel, 5),
                        "protocol": "20-step uncached denoise, batch 1, "
                        "identical noise/text inputs",
                    }
                }
            ),
            flush=True,
        )
        jax.clear_caches()

    results = {}
    t_uncached = None
    for name in rows:
        sched = (
            None
            if name == "uncached"
            else FluxCacheSchedule.from_json(SCHED_DIR / f"{name}.json")
        )
        pipe = FluxPipeline(pcfg, params, sched)
        t = time_flux(pipe, params, noise, txt, pooled, vae)
        ms_img = t / batch * 1e3
        if name == "uncached":
            t_uncached = t
        # MFU accounting (attention FLOPs included), rated against the
        # bf16 MXU peak by convention so pct_peak is comparable across
        # quant modes (the W8A8 projections do run the 394-TOPS int8
        # path; against that peak the same row would read half)
        from ecad_tpu.macs import (
            V5E_PEAK_BF16,
            flux_cost_table,
            hardware_flops_per_image,
            vae_decoder_flops,
        )
        from ecad_tpu.schedules import FluxCacheSchedule as _FCS

        fl_sched = sched if sched is not None else _FCS.default(
            num_inference_steps=pcfg.num_inference_steps
        )
        # batch=1: our flux pipeline is guidance-distilled (no CFG
        # doubling); the table's reference-parity default batch=2 would
        # double-count the per-image FLOPs
        fl = hardware_flops_per_image(
            fl_sched, flux_cost_table(256, 256, batch=1)
        ) + vae_decoder_flops(256, 256)
        tps = fl * batch / t
        results[name] = {
            "ms_per_image": round(ms_img, 2),
            "a6000_ms_per_image": LADDER[name],
            "absolute_speedup_vs_a6000": round(LADDER[name] / ms_img, 3),
            "tflops_per_sec": round(tps / 1e12, 1),
            "pct_peak_bf16": round(100.0 * tps / V5E_PEAK_BF16, 1),
            "flops_per_image_T": round(fl / 1e12, 3),
            **(
                {"speedup_vs_uncached": round(t_uncached / t, 3)}
                if t_uncached is not None and name != "uncached"
                else {}
            ),
        }
        print(json.dumps({name: results[name]}), flush=True)

    # headline row: ours_fast when measured (the historical metric name in
    # BENCH_LADDER/PROGRESS), otherwise the last row actually run — keeps a
    # no-argument run emitting the same metric across revisions
    head = "ours_fast" if "ours_fast" in results else rows[-1]
    suffix = "" if quant == "int8_w" else f"_{quant}"
    print(
        json.dumps(
            {
                "metric": f"flux_12b_single_chip_{head}{suffix}_absolute",
                "value": results[head]["ms_per_image"],
                "unit": "ms_per_image",
                "vs_baseline": results[head][
                    "absolute_speedup_vs_a6000"
                ],
                "detail": {
                    "batch": batch,
                    "params_B": round(n_params / 1e9, 3),
                    "weight_GiB": round(weight_bytes / GIB, 2),
                    "quant": quant + " (W8A8, int8 MXU)"
                    " + float8_e4m3fn cache storage",
                    "protocol": "20-step denoise + VAE decode to uint8,"
                    " 256², same-width model as the reference's A6000",
                    "device": str(jax.devices()[0]),
                    "results": results,
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

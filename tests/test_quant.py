"""Int8 W8A8 serving-mode numerics (ops/quant.py).

The quality bar for a dynamic symmetric W8A8 scheme is per-layer relative
error on the order of the int8 step size (~1/127 per operand); these tests
bound it and verify the mode threads end-to-end through both model
families. A beyond-parity capability — the reference has no quantized
path (fp16 at best, pixart_transformer_2d_edited.py:98)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecad_tpu.ops.quant import int8_dot_general, maybe_quant_dot_general, quantize_int8


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9)


def test_quantize_int8_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 256), jnp.float32)
    q, s = quantize_int8(x, axis=1)
    assert q.dtype == jnp.int8
    assert s.shape == (16, 1)
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
    # uniform-quant RMS noise for N(0,1) rows: step ≈ amax/127 ≈ 0.028σ,
    # err ≈ step/√12 ≈ 0.8% relative
    assert _rel_err(q.astype(jnp.float32) * s, x) < 1.5e-2


def test_int8_dot_general_matches_fp32():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (4, 64, 512), jnp.float32)
    w = jax.random.normal(k2, (512, 384), jnp.float32) * 0.02
    dn = (((2,), (0,)), ((), ()))
    exact = jax.lax.dot_general(x, w, dn)
    q = int8_dot_general(x, w, dn)
    assert q.shape == exact.shape
    # two int8 operands → ~1% relative error at K=512
    assert _rel_err(q, exact) < 0.02


def test_int8_dot_general_outlier_tokens():
    """Per-token scaling keeps an outlier token from poisoning the rest."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (8, 128), jnp.float32)
    x = x.at[3].mul(1000.0)  # one hot token
    w = jax.random.normal(k2, (128, 64), jnp.float32)
    dn = (((1,), (0,)), ((), ()))
    exact = jax.lax.dot_general(x, w, dn)
    q = int8_dot_general(x, w, dn)
    for i in range(8):
        assert _rel_err(q[i], exact[i]) < 0.05, i


def test_int8_dot_general_unsupported_dnums_fall_through():
    """Batch or multi-contract dims use the exact path (bit-identical)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    a = jax.random.normal(k1, (2, 8, 16), jnp.float32)
    b = jax.random.normal(k2, (2, 16, 4), jnp.float32)
    dn = (((2,), (1,)), ((0,), (0,)))  # batched matmul
    np.testing.assert_array_equal(
        int8_dot_general(a, b, dn), jax.lax.dot_general(a, b, dn)
    )


def test_maybe_quant_dot_general():
    assert maybe_quant_dot_general(None) is None
    assert maybe_quant_dot_general("none") is None
    assert maybe_quant_dot_general("int8") is int8_dot_general
    # int8_w is structural (Int8Dense swap), not a dot_general override
    assert maybe_quant_dot_general("int8_w") is None
    with pytest.raises(ValueError):
        maybe_quant_dot_general("fp4")


def test_pixart_block_int8_close_to_bf16():
    from ecad_tpu.models import PixArtConfig, full_step_mask, init_cache, init_params

    cfg = PixArtConfig.tiny(dim=128, num_heads=4, head_dim=32, dtype=jnp.float32)
    qcfg = PixArtConfig.tiny(
        dim=128, num_heads=4, head_dim=32, dtype=jnp.float32, quant="int8"
    )
    model, params = init_params(cfg, 0)
    qmodel, _ = init_params(qcfg, 0)  # same param structure

    b = 2
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    latents = jax.random.normal(
        k1, (b, cfg.sample_size, cfg.sample_size, cfg.in_channels), jnp.float32
    )
    text = jax.random.normal(k2, (b, cfg.text_len, cfg.caption_dim), jnp.float32)
    t = jnp.full((b,), 400.0, jnp.float32)
    cache = init_cache(cfg, b)
    mask = full_step_mask(cfg)

    out, _ = model.apply({"params": params}, latents, text, t, cache, mask)
    qout, _ = qmodel.apply({"params": params}, latents, text, t, cache, mask)
    err = _rel_err(qout, out)
    assert err < 0.06, f"int8 full-model deviation too large: {err}"
    assert np.isfinite(np.asarray(qout)).all()


def test_flux_block_int8_close_to_bf16():
    from ecad_tpu.models import FluxConfig, full_flux_mask, init_flux_params
    from ecad_tpu.models.flux import init_flux_cache

    cfg = FluxConfig.tiny(dtype=jnp.float32)
    qcfg = FluxConfig.tiny(dtype=jnp.float32, quant="int8")
    model, params = init_flux_params(cfg, 0)
    qmodel, _ = init_flux_params(qcfg, 0)

    b, gh, gw = 2, 4, 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    latents = jax.random.normal(k1, (b, gh * gw, cfg.in_channels), jnp.float32)
    txt = jax.random.normal(k2, (b, cfg.text_len, cfg.joint_dim), jnp.float32)
    pooled = jax.random.normal(k3, (b, cfg.pooled_dim), jnp.float32)
    t = jnp.full((b,), 0.7, jnp.float32)
    g = jnp.full((b,), 5.0, jnp.float32)
    mask = full_flux_mask(cfg)

    out, _ = model.apply(
        {"params": params}, latents, txt, pooled, t, g, init_flux_cache(),
        mask, (gh, gw),
    )
    qout, _ = qmodel.apply(
        {"params": params}, latents, txt, pooled, t, g, init_flux_cache(),
        mask, (gh, gw),
    )
    err = _rel_err(qout, out)
    assert err < 0.08, f"int8 full-model deviation too large: {err}"
    assert np.isfinite(np.asarray(qout)).all()


def test_int8_dense_storage_and_numerics():
    """Int8Dense stores int8 kernels (the HBM win) and, fed a
    quantize_params_tree conversion of real float weights, matches the
    exact Dense to W8A8 tolerance."""
    import flax.linen as nn

    from ecad_tpu.models.common import EMBED, MLP, with_part
    from ecad_tpu.ops.quant import Int8Dense, quantize_params_tree

    din, dout, b = 256, 512, 8
    exact = nn.Dense(
        dout,
        dtype=jnp.float32,
        kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, MLP)),
    )
    qmod = Int8Dense(dout, axes=(EMBED, MLP), dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, din), jnp.float32)
    fparams = nn.meta.unbox(exact.init(jax.random.PRNGKey(1), x))["params"]
    ref = nn.meta.unbox(
        jax.eval_shape(lambda: qmod.init(jax.random.PRNGKey(2), x))
    )["params"]
    assert ref["kernel"].dtype == jnp.int8
    assert ref["scale"].shape == (dout,)
    qparams = quantize_params_tree(fparams, ref)
    assert qparams["kernel"].dtype == jnp.int8
    assert qparams["scale"].dtype == jnp.float32
    y = exact.apply({"params": fparams}, x)
    yq = qmod.apply({"params": qparams}, x)
    assert _rel_err(yq, y) < 0.02
    # bias passthrough is exact
    np.testing.assert_array_equal(qparams["bias"], fparams["bias"])


def test_flux_int8_w_close_to_fp32_and_half_bytes():
    """quant="int8_w" threads through every FLUX block linear (attention,
    MLPs, adaLN): outputs stay in W8A8 tolerance of the exact model when
    fed the quantized conversion of the same float weights, and weight
    bytes drop below the bf16 serving footprint."""
    from ecad_tpu.models import FluxConfig, full_flux_mask, init_flux_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.models.flux import init_flux_cache
    from ecad_tpu.ops.quant import quantize_params_tree

    cfg = FluxConfig.tiny(dtype=jnp.float32)
    qcfg = FluxConfig.tiny(dtype=jnp.float32, quant="int8_w")
    model, params = init_flux_params(cfg, 0)
    qmodel, _ = init_flux_params(qcfg, 0)

    import flax.linen as nn

    ref = nn.meta.unbox(
        jax.eval_shape(lambda: init_flux_params(qcfg, 0)[1])
    )
    qparams = quantize_params_tree(nn.meta.unbox(params), ref)

    # adaLN linears are covered too (mandatory for the 12B single-chip fit)
    blk = qparams["block_0"]["norm1"]["linear"]
    assert blk["kernel"].dtype == jnp.int8 and "scale" in blk

    b, gh, gw = 2, 4, 4
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    latents = jax.random.normal(k1, (b, gh * gw, cfg.in_channels), jnp.float32)
    txt = jax.random.normal(k2, (b, cfg.text_len, cfg.joint_dim), jnp.float32)
    pooled = jax.random.normal(k3, (b, cfg.pooled_dim), jnp.float32)
    t = jnp.full((b,), 0.7, jnp.float32)
    g = jnp.full((b,), 5.0, jnp.float32)
    mask = full_flux_mask(cfg)

    args = (latents, txt, pooled, t, g, init_flux_cache(), mask, (gh, gw))
    out, _ = model.apply({"params": params}, *args)
    qout, _ = qmodel.apply({"params": qparams}, *args)
    err = _rel_err(qout, out)
    assert err < 0.08, f"int8_w full-model deviation too large: {err}"
    assert np.isfinite(np.asarray(qout)).all()

    # storage: int8_w weight bytes < 55% of the bf16 serving footprint
    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize for x in jax.tree.leaves(tree)
        )

    bf16_bytes = nbytes(serving_cast(nn.meta.unbox(params), jnp.bfloat16))
    q_bytes = nbytes(serving_cast(qparams, jnp.bfloat16))
    # At the tiny config the non-quantized embedders and the fp32
    # per-channel scales weigh disproportionately (dim 64), so the ratio
    # is ~0.58 here vs ~0.47 at full width (where block linears are
    # >97% of params; scripts/flux_full_width.py int8 mode measures it).
    assert q_bytes < 0.65 * bf16_bytes, (q_bytes, bf16_bytes)


def test_serving_cast_preserves_int8_w_scales():
    """serving_cast must not squeeze the fp32 dequant scales next to int8
    kernels to bf16 (but still casts everything else fp32→bf16)."""
    from ecad_tpu.models.common import serving_cast

    tree = {
        "q": {
            "kernel": jnp.zeros((4, 8), jnp.int8),
            "scale": jnp.ones((8,), jnp.float32),
            "bias": jnp.zeros((8,), jnp.float32),
        },
        "dense": {
            "kernel": jnp.zeros((4, 8), jnp.float32),
            "bias": jnp.zeros((8,), jnp.float32),
        },
    }
    out = serving_cast(tree, jnp.bfloat16)
    assert out["q"]["kernel"].dtype == jnp.int8
    assert out["q"]["scale"].dtype == jnp.float32
    assert out["q"]["bias"].dtype == jnp.bfloat16
    assert out["dense"]["kernel"].dtype == jnp.bfloat16


def test_pixart_int8_w_smoke():
    """The storage mode threads through the PixArt blocks + pipeline."""
    from ecad_tpu.models import PixArtConfig, full_step_mask, init_cache, init_params

    cfg = PixArtConfig.tiny(
        dim=128, num_heads=4, head_dim=32, dtype=jnp.float32, quant="int8_w"
    )
    model, params = init_params(cfg, 0)
    import flax.linen as nn

    flat = jax.tree_util.tree_leaves_with_path(nn.meta.unbox(params))
    int8_leaves = [p for p, x in flat if x.dtype == jnp.int8]
    assert len(int8_leaves) >= cfg.num_blocks * 8  # qkv/out ×2 attn + 2 MLP

    b = 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    latents = jax.random.normal(
        k1, (b, cfg.sample_size, cfg.sample_size, cfg.in_channels), jnp.float32
    )
    text = jax.random.normal(k2, (b, cfg.text_len, cfg.caption_dim), jnp.float32)
    t = jnp.full((b,), 400.0, jnp.float32)
    out, _ = model.apply(
        {"params": params}, latents, text, t, init_cache(cfg, b),
        full_step_mask(cfg),
    )
    assert np.isfinite(np.asarray(out)).all()


def test_pixart_pipeline_int8_smoke():
    """The quant flag rides PixArtConfig through the pipeline layer."""
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    cfg = PixArtConfig.tiny(quant="int8")
    _, params = init_params(cfg, 0)
    pcfg = PixArtPipelineConfig(model=cfg, num_inference_steps=2)
    pipe = PixArtPipeline(pcfg, params, PixArtCacheSchedule.default(2))
    b = 2
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    noise = jax.random.normal(
        k1, (b, cfg.sample_size, cfg.sample_size, cfg.in_channels)
    ).astype(cfg.dtype)
    text = jax.random.normal(k2, (b, cfg.text_len, cfg.caption_dim)).astype(
        cfg.dtype
    )
    neg = jax.random.normal(k3, (b, cfg.text_len, cfg.caption_dim)).astype(
        cfg.dtype
    )
    fn = pipe.build_denoise_fn(donate=False)
    out = fn(params, noise, text, neg, None, None)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_random_serving_params_scale_classification():
    """An fp32 "scale" leaf is a dequant scale ONLY next to an int8
    kernel; a norm-affine "scale" (LayerNorm/RMSNorm/VAE GroupNorm) must
    fill near its trained value of 1.0, not the ~1e-4 dequant family
    (which would collapse every norm output)."""
    from ecad_tpu.models.common import random_serving_params

    tree = {
        "dense": {
            "kernel": jax.ShapeDtypeStruct((16, 16), jnp.int8),
            "scale": jax.ShapeDtypeStruct((16,), jnp.float32),
        },
        "norm": {
            "scale": jax.ShapeDtypeStruct((16,), jnp.float32),
            "bias": jax.ShapeDtypeStruct((16,), jnp.float32),
        },
    }
    p = random_serving_params(tree)
    dq = np.asarray(p["dense"]["scale"])
    ns = np.asarray(p["norm"]["scale"], np.float32)
    assert (dq > 0).all() and dq.mean() < 0.01  # dequant family
    assert abs(ns.mean() - 1.0) < 0.1  # norm-affine family


def test_int8_static_calibrated_close_to_bf16():
    """quant="int8_static": per-site calibrated per-tensor activation
    scales replace the dynamic per-token max-abs pass. Calibrating at two
    timesteps then applying at a third must track the exact model as
    closely as the dynamic path does (same int8 grid, scale source only),
    and a site missing from the table must fall back to dynamic (safe)."""
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.pixart import (
        PixArtTransformer,
        full_step_mask,
        init_cache,
    )
    from ecad_tpu.ops.quant import calibrate_dense_amax, merge_amax

    cfg = PixArtConfig.tiny(dtype=jnp.float32)
    model = PixArtTransformer(cfg)
    _, params = init_params(cfg, 0)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1), 2)
    lat = jax.random.normal(
        k1, (2, cfg.sample_size, cfg.sample_size, cfg.in_channels)
    )
    txt = jax.random.normal(k2, (2, cfg.text_len, cfg.caption_dim))
    mask = full_step_mask(cfg)
    cache = init_cache(cfg, 2)

    table = merge_amax(
        *(
            calibrate_dense_amax(
                model, {"params": params}, lat, txt,
                jnp.full((2,), tv), cache, mask,
            )
            for tv in (999.0, 10.0)
        )
    )
    assert "block_0/attn1/to_q" in table and "block_1/ff/proj_in" in table

    t = jnp.full((2,), 500.0)
    out_ref, _ = model.apply({"params": params}, lat, txt, t, cache, mask)

    def run(quant, act_scales=None):
        c = PixArtConfig.tiny(
            dtype=jnp.float32, quant=quant, act_scales=act_scales
        )
        out, _ = PixArtTransformer(c).apply(
            {"params": params}, lat, txt, t, cache, mask
        )
        return out

    out_static = run("int8_static", tuple(sorted(table.items())))
    out_dyn = run("int8")
    scale = float(jnp.abs(out_ref).max())
    err_static = float(jnp.abs(out_static - out_ref).max()) / scale
    err_dyn = float(jnp.abs(out_dyn - out_ref).max()) / scale
    assert err_static < max(3 * err_dyn, 0.02), (err_static, err_dyn)

    # empty table → every site falls back to the dynamic path
    out_fallback = run("int8_static", ())
    np.testing.assert_allclose(
        np.asarray(out_fallback), np.asarray(out_dyn), rtol=0, atol=0
    )


def test_flux_int8_static_calibrated_close_to_bf16():
    """FLUX port of the static calibration path (VERDICT r4 #5): per-site
    calibrated activation scales thread through models/flux.py's _dense
    (parent.path + name == calibrate_dense_amax's interceptor keys), and
    an empty table degrades to the dynamic per-token path exactly."""
    from ecad_tpu.models.flux import (
        FluxConfig,
        FluxTransformer,
        full_flux_mask,
        init_flux_cache,
        init_flux_params,
    )
    from ecad_tpu.ops.quant import calibrate_dense_amax, merge_amax

    cfg = FluxConfig.tiny(dtype=jnp.float32)
    model = FluxTransformer(cfg)
    _, params = init_flux_params(cfg, 0)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(k1, (2, 16, cfg.in_channels))
    txt = jax.random.normal(k2, (2, cfg.text_len, cfg.joint_dim))
    pooled = jax.random.normal(k3, (2, cfg.pooled_dim))
    g = jnp.full((2,), 3.5, jnp.float32)
    mask = full_flux_mask(cfg)
    cache = init_flux_cache()

    table = merge_amax(
        *(
            calibrate_dense_amax(
                model, {"params": params}, lat, txt, pooled,
                jnp.full((2,), tv, jnp.float32), g, cache, mask, (4, 4),
            )
            for tv in (1.0, 0.05)
        )
    )
    # dual-stream, single-stream, and ff sites all keyed by module path
    assert any(k.endswith("attn/to_q") for k in table), sorted(table)[:5]
    assert any("single" in k and k.endswith("proj_mlp") for k in table)

    t = jnp.full((2,), 0.5, jnp.float32)
    out_ref, _ = model.apply(
        {"params": params}, lat, txt, pooled, t, g, cache, mask, (4, 4)
    )

    def run(quant, act_scales=None):
        c = FluxConfig.tiny(
            dtype=jnp.float32, quant=quant, act_scales=act_scales
        )
        out, _ = FluxTransformer(c).apply(
            {"params": params}, lat, txt, pooled, t, g, cache, mask, (4, 4)
        )
        return out

    out_static = run("int8_static", tuple(sorted(table.items())))
    out_dyn = run("int8")
    scale = float(jnp.abs(out_ref).max())
    err_static = float(jnp.abs(out_static - out_ref).max()) / scale
    err_dyn = float(jnp.abs(out_dyn - out_ref).max()) / scale
    assert err_static < max(3 * err_dyn, 0.02), (err_static, err_dyn)

    out_fallback = run("int8_static", ())
    np.testing.assert_allclose(
        np.asarray(out_fallback), np.asarray(out_dyn), rtol=0, atol=0
    )


def test_flux_int8_w_static_acts():
    """int8_w_static = int8 weight STORAGE + calibrated static activation
    scales (Int8Dense.act_amax). Calibration runs ON the int8_w model
    (the only full-width-viable one); the static variant must track the
    dynamic int8_w outputs to within the same quant-noise order."""
    from ecad_tpu.models.flux import (
        FluxConfig,
        FluxTransformer,
        full_flux_mask,
        init_flux_cache,
        init_flux_params,
    )
    from ecad_tpu.ops.quant import calibrate_dense_amax, merge_amax

    cfg_w = FluxConfig.tiny(dtype=jnp.float32, quant="int8_w")
    model_w = FluxTransformer(cfg_w)
    _, params_w = init_flux_params(cfg_w, 0)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    lat = jax.random.normal(k1, (2, 16, cfg_w.in_channels))
    txt = jax.random.normal(k2, (2, cfg_w.text_len, cfg_w.joint_dim))
    pooled = jax.random.normal(k3, (2, cfg_w.pooled_dim))
    g = jnp.full((2,), 3.5, jnp.float32)
    mask = full_flux_mask(cfg_w)

    table = calibrate_dense_amax(
        model_w, {"params": params_w}, lat, txt, pooled,
        jnp.full((2,), 1.0, jnp.float32), g, init_flux_cache(), mask, (4, 4),
    )
    assert table, "Int8Dense sites must be calibratable"

    t = jnp.full((2,), 0.5, jnp.float32)
    out_dyn, _ = model_w.apply(
        {"params": params_w}, lat, txt, pooled, t, g, init_flux_cache(),
        mask, (4, 4),
    )
    cfg_ws = FluxConfig.tiny(
        dtype=jnp.float32, quant="int8_w_static",
        act_scales=tuple(sorted(merge_amax(table).items())),
    )
    out_static, _ = FluxTransformer(cfg_ws).apply(
        {"params": params_w}, lat, txt, pooled, t, g, init_flux_cache(),
        mask, (4, 4),
    )
    scale = float(jnp.abs(out_dyn).max())
    err = float(jnp.abs(out_static - out_dyn).max()) / scale
    assert err < 0.05, err

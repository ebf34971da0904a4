"""Pipeline parallelism (pp mesh axis) on the virtual 8-device CPU mesh.

The reference has no pipelining (single-GPU torch, SURVEY.md §2.9); the
GPipe-style harness in ecad_tpu/parallel/pipeline.py is the TPU-pod
serving path for weights that exceed one host when cross-host links are
DCN. These tests pin the pp forward numerically equal to the plain
single-device forward (same traced-mask dynamic mode), including across a
multi-step cache-reuse sequence, and check the stage-local placement of
weights and caches.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.models.pixart import init_cache
from ecad_tpu.parallel.pipeline import (
    build_pp_forward,
    create_pp_mesh,
    from_stacked_cache,
    pp_shardings,
    stack_block_params,
    stacked_cache,
    to_stacked_cache,
)


def _setup(num_blocks=4, batch=4):
    config = PixArtConfig.tiny(num_blocks=num_blocks, dtype=jnp.float32)
    model, params = init_params(config, 0)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    lat = jax.random.normal(
        k1, (batch, config.sample_size, config.sample_size, 4)
    )
    text = jax.random.normal(k2, (batch, config.text_len, config.caption_dim))
    t = jnp.full((batch,), 500.0)
    return config, model, params, lat, text, t


def _plain(model, params, lat, text, t, cache, mask_np, text_mask=None):
    mask = tuple(
        tuple(jnp.asarray(bool(v)) for v in row) for row in mask_np
    )
    return jax.jit(
        lambda p, l, c: model.apply(
            {"params": p}, l, text, t, c, mask, text_mask=text_mask
        )
    )(params, lat, cache)


@pytest.mark.parametrize("dp,pp,n_micro", [(1, 4, 2), (2, 4, 2), (1, 2, 4)])
def test_pp_forward_matches_plain(dp, pp, n_micro):
    config, model, params, lat, text, t = _setup()
    rng = np.random.default_rng(0)
    mask_np = np.ones((config.num_blocks, 3), bool)

    cache0 = init_cache(config, lat.shape[0], dtype=jnp.float32)
    out_ref, cache_ref = _plain(model, params, lat, text, t, cache0, mask_np)

    mesh = create_pp_mesh(pp=pp, dp=dp, devices=jax.devices()[: dp * pp])
    stacked, rest = stack_block_params(params, config.num_blocks)
    sc = stacked_cache(config, lat.shape[0], dtype=jnp.float32)
    bp_sh, c_sh = pp_shardings(mesh, stacked, sc)
    stacked = jax.device_put(stacked, bp_sh)
    sc = jax.device_put(sc, c_sh)
    fwd = jax.jit(build_pp_forward(model, mesh, n_micro=n_micro))
    out_pp, cache_pp = fwd(
        stacked, rest, lat, text, t, sc, jnp.asarray(mask_np)
    )

    # dp>1 shards the batch axis, so XLA tiles the block matmuls
    # differently per shard — 1-ulp reassociation drift. dp=1 keeps the
    # single-device layout and must stay bitwise identical.
    tol = dict(rtol=1e-6, atol=1e-6) if dp > 1 else {}
    np.testing.assert_allclose(
        np.asarray(out_pp), np.asarray(out_ref), **tol
    )
    ref = to_stacked_cache(cache_ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(cache_pp[k]), np.asarray(ref[k]), **tol
        )
    # stage-local placement survives the call (batch may additionally
    # shard over dp — the boundary layout pp_shardings documents)
    spec = cache_pp["attn1"].sharding.spec
    assert len(spec) >= 1 and spec[0] == "pp", spec
    assert all(s in (None, "dp") for s in spec[1:]), spec
    rng  # noqa: B018


def test_pp_multistep_cache_reuse_matches_plain():
    """Two steps with a random partial-recompute mask at step 2: the
    cached components must flow through the stacked stage-local cache
    exactly as through the plain tuple cache."""
    config, model, params, lat, text, t = _setup()
    rng = np.random.default_rng(7)
    step1 = np.ones((config.num_blocks, 3), bool)
    step2 = rng.random((config.num_blocks, 3)) < 0.5

    cache0 = init_cache(config, lat.shape[0], dtype=jnp.float32)
    out1_ref, cache1_ref = _plain(
        model, params, lat, text, t, cache0, step1
    )
    lat2 = lat - 0.1 * out1_ref[..., :4]
    out2_ref, cache2_ref = _plain(
        model, params, lat2, text, t, cache1_ref, step2
    )

    mesh = create_pp_mesh(pp=4, dp=2)
    stacked, rest = stack_block_params(params, config.num_blocks)
    sc = stacked_cache(config, lat.shape[0], dtype=jnp.float32)
    bp_sh, c_sh = pp_shardings(mesh, stacked, sc)
    stacked = jax.device_put(stacked, bp_sh)
    sc = jax.device_put(sc, c_sh)
    fwd = jax.jit(build_pp_forward(model, mesh, n_micro=2))
    out1, cache1 = fwd(stacked, rest, lat, text, t, sc, jnp.asarray(step1))
    lat2_pp = lat - 0.1 * out1[..., :4]
    out2, cache2 = fwd(
        stacked, rest, lat2_pp, text, t, cache1, jnp.asarray(step2)
    )

    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(out2_ref), rtol=1e-6, atol=1e-6
    )
    ref = to_stacked_cache(cache2_ref)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(cache2[k]), np.asarray(ref[k]), rtol=1e-6, atol=1e-6
        )


def test_pp_with_text_mask_bias():
    config, model, params, lat, text, t = _setup()
    mask_np = np.ones((config.num_blocks, 3), bool)
    text_mask = jnp.asarray(
        np.tile([1, 1, 1, 1, 1, 0, 0, 0], (lat.shape[0], 1)), jnp.float32
    )

    cache0 = init_cache(config, lat.shape[0], dtype=jnp.float32)
    out_ref, _ = _plain(
        model, params, lat, text, t, cache0, mask_np, text_mask=text_mask
    )

    mesh = create_pp_mesh(pp=2, dp=1, devices=jax.devices()[:2])
    stacked, rest = stack_block_params(params, config.num_blocks)
    sc = stacked_cache(config, lat.shape[0], dtype=jnp.float32)
    fwd = jax.jit(build_pp_forward(model, mesh, n_micro=2))
    out_pp, _ = fwd(
        stacked, rest, lat, text, t, sc, jnp.asarray(mask_np),
        text_mask=text_mask,
    )
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_ref))


def test_pp_validation_errors():
    config, model, params, lat, text, t = _setup()
    mesh = create_pp_mesh(pp=8, dp=1)
    with pytest.raises(ValueError, match="not divisible by pp"):
        build_pp_forward(model, mesh, n_micro=2)

    mesh = create_pp_mesh(pp=4, dp=2)
    fwd = build_pp_forward(model, mesh, n_micro=3)  # batch 4 % 3 != 0
    stacked, rest = stack_block_params(params, config.num_blocks)
    sc = stacked_cache(config, lat.shape[0], dtype=jnp.float32)
    with pytest.raises(ValueError, match="not divisible by n_micro"):
        fwd(stacked, rest, lat, text, t, sc,
            jnp.ones((config.num_blocks, 3), bool))

    with pytest.raises(ValueError, match="devices"):
        create_pp_mesh(pp=3, dp=1, devices=jax.devices()[:8])


def test_stacked_cache_round_trip():
    config = PixArtConfig.tiny(num_blocks=3, dtype=jnp.float32)
    cache = init_cache(config, 2, dtype=jnp.float32)
    stacked = to_stacked_cache(cache)
    assert stacked["attn1"].shape[0] == 3
    back = from_stacked_cache(stacked)
    assert len(back["ff"]) == 3
    np.testing.assert_array_equal(
        np.asarray(back["attn1"][1]), np.asarray(cache["attn1"][1])
    )


def test_pp_text_precomputed_matches_inline():
    """Hoisted trajectory-constant text work (caption projection + stacked
    per-block cross-attention K/V) must be numerically identical to the
    inline recomputation inside the stages."""
    from ecad_tpu.models.pixart import PixArtTransformer
    from ecad_tpu.parallel.pipeline import stacked_cross_kv

    config, model, params, lat, text, t = _setup()
    mask_np = np.ones((config.num_blocks, 3), bool)

    mesh = create_pp_mesh(pp=4, dp=2)
    stacked, rest = stack_block_params(params, config.num_blocks)
    sc = stacked_cache(config, lat.shape[0], dtype=jnp.float32)
    bp_sh, c_sh = pp_shardings(mesh, stacked, sc)
    stacked = jax.device_put(stacked, bp_sh)
    sc = jax.device_put(sc, c_sh)
    fwd = build_pp_forward(model, mesh, n_micro=2)
    out_inline, cache_inline = jax.jit(fwd)(
        stacked, rest, lat, text, t, sc, jnp.asarray(mask_np)
    )

    def hoisted(stacked, rest, lat, text, t, sc, masks):
        enc, _ = model.apply(
            {"params": rest}, text,
            method=PixArtTransformer.encode_text, with_kv=False,
        )
        kv = stacked_cross_kv(config, stacked, enc)
        return fwd(
            stacked, rest, lat, text, t, sc, masks,
            text_precomputed=(enc, kv),
        )

    out_pre, cache_pre = jax.jit(hoisted)(
        stacked, rest, lat, text, t, sc, jnp.asarray(mask_np)
    )
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(out_inline))
    for k in cache_inline:
        np.testing.assert_allclose(
            np.asarray(cache_pre[k]), np.asarray(cache_inline[k])
        )


def test_pipelined_population_denoiser_matches_plain():
    """Full CFG + DPM trajectory with traced masks: the pp-pipelined
    denoiser must match PopulationDenoiser (same lax.cond dynamic mode)
    across a multi-step schedule with partial recompute rows."""
    from ecad_tpu.parallel.pipeline import PipelinedPopulationDenoiser
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.pipelines.pixart_pipeline import PopulationDenoiser

    config = PixArtConfig.tiny(num_blocks=4, dtype=jnp.float32)
    _, params = init_params(config, 0)
    steps = 3
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=steps)
    pipe = PixArtPipeline(pcfg, params)

    b = 2  # CFG doubles to 4 = n_micro 2 × mb 2
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    noise = jax.random.normal(
        k1, (b, config.sample_size, config.sample_size, 4)
    )
    text = jax.random.normal(k2, (b, config.text_len, config.caption_dim))
    neg = jax.random.normal(k3, (b, config.text_len, config.caption_dim))
    rng = np.random.default_rng(3)
    masks = rng.random((steps, config.num_blocks, 3)) < 0.5
    masks[0] = True

    want = PopulationDenoiser(pipe).denoise(masks, noise, text, neg)

    mesh = create_pp_mesh(pp=4, dp=2)
    with mesh:
        ppd = PipelinedPopulationDenoiser(pipe, mesh, n_micro=2)
        got = ppd.denoise(masks, noise, text, neg)

    # the 3-step trajectory accumulates per-step ulp drift from the
    # dp-sharded batch layout; observed max ~7e-5 relative at steps=3
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1.5e-4, atol=5e-5
    )


def test_pp_tgate_matches_plain():
    """pp × TGATE composition (the round-3 untested boundary): the
    mid-trajectory CFG drop — phase 1 at batch 2B, gate cache transform,
    phase 2 at batch B — must match the plain TGATE pipeline's unrolled
    program. Both phases are their own shard_map programs, so the batch
    change never crosses a compiled boundary."""
    from ecad_tpu.parallel.pipeline import TGATEPipelinedDenoiser
    from ecad_tpu.pipelines import PixArtPipelineConfig
    from ecad_tpu.pipelines.tgate import TGATEPixArtPipeline
    from ecad_tpu.schedules import PixArtCacheSchedule
    from ecad_tpu.schedules.generators.pixart_cache import _tgate_mask

    config = PixArtConfig.tiny(num_blocks=4, dtype=jnp.float32)
    _, params = init_params(config, 0)
    steps, gate = 4, 2
    mask, _ = _tgate_mask(config.num_blocks, steps, gate, 1, 1, 2)
    sched = PixArtCacheSchedule(
        config.num_blocks, steps, mask=mask.reshape(steps, -1), name="tg"
    )
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=steps)
    tg = TGATEPixArtPipeline(pcfg, params, sched, gate_step=gate)

    b = 4  # phase 1 runs 2B=8 = n_micro 2 × mb 4; phase 2 B=4 = 2 × 2
    # (each microbatch is dp=2-sharded, so mb must be even in BOTH phases)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(7), 3)
    noise = jax.random.normal(
        k1, (b, config.sample_size, config.sample_size, 4)
    ).astype(config.dtype)
    text = jax.random.normal(k2, (b, config.text_len, config.caption_dim))
    neg = jax.random.normal(k3, (b, config.text_len, config.caption_dim))

    want = tg.denoise_stepwise(noise, text, neg)

    mesh = create_pp_mesh(pp=4, dp=2)
    with mesh:
        ppd = TGATEPipelinedDenoiser(tg, mesh, n_micro=2)
        got = ppd.denoise(noise, text, neg)

    # plain TGATE runs the static-mask specialized programs, pp the
    # lax.cond dynamic mode — same ops, different specialization; the
    # 4-step two-phase trajectory accumulates per-step ulp drift
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1.5e-4, atol=5e-5
    )


def test_pp_quant_rejected():
    """The pp harness refuses quantized configs loudly (quant fuses
    per-tensor scale state through the stacked-params scan, unsupported)
    rather than silently computing bf16."""
    config = PixArtConfig.tiny(num_blocks=4, dtype=jnp.float32)
    model, _ = init_params(config, 0)
    import dataclasses

    qconfig = dataclasses.replace(config, quant="int8")
    from ecad_tpu.models.pixart import PixArtTransformer

    qmodel = PixArtTransformer(qconfig)
    mesh = create_pp_mesh(pp=4, dp=2)
    with pytest.raises(NotImplementedError, match="quant"):
        build_pp_forward(qmodel, mesh, n_micro=2)

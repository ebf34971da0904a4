"""FLUX model + pipeline tests on the tiny config: shapes, cache semantics
(incl. pre-activation proj_mlp caching), packing, RoPE, and pipeline modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecad_tpu.models.flux import (
    FluxConfig,
    FluxTransformer,
    flux_step_masks,
    full_flux_mask,
    init_flux_params,
    make_image_ids,
    pack_latents,
    rope_freqs,
    unpack_latents,
)
from ecad_tpu.pipelines.flux_pipeline import (
    FluxPipeline,
    FluxPipelineConfig,
    SharedFluxStepper,
)
from ecad_tpu.schedules import FluxCacheSchedule

STEPS = 3


@pytest.fixture(scope="module")
def tiny():
    config = FluxConfig.tiny(dtype=jnp.float32)
    model, params = init_flux_params(config, 0)
    return config, model, params


def _inputs(config, batch=2, t_img=16, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    lat = jax.random.normal(k1, (batch, t_img, config.in_channels))
    txt = jax.random.normal(k2, (batch, config.text_len, config.joint_dim))
    pooled = jax.random.normal(k3, (batch, config.pooled_dim))
    t = jnp.full((batch,), 0.7)
    g = jnp.full((batch,), 5.0)
    return lat, txt, pooled, t, g


def test_pack_unpack_round_trip():
    x = jnp.arange(2 * 8 * 8 * 16, dtype=jnp.float32).reshape(2, 8, 8, 16)
    packed = pack_latents(x)
    assert packed.shape == (2, 16, 64)
    np.testing.assert_array_equal(np.asarray(unpack_latents(packed, 4, 4)), x)


def test_rope_shapes():
    ids = np.concatenate([np.zeros((8, 3)), make_image_ids(4, 4)])
    cos, sin = rope_freqs(ids, (4, 6, 6), 10000)
    assert cos.shape == (24, 8)  # head_dim 16 → 8 pairs
    # text ids are zeros → angle 0 → cos 1, sin 0
    np.testing.assert_allclose(cos[:8], 1.0)
    np.testing.assert_allclose(sin[:8], 0.0)


def test_forward_and_cache_reuse(tiny):
    config, model, params = tiny
    lat, txt, pooled, t, g = _inputs(config)
    full = full_flux_mask(config)
    out1, cache1 = model.apply(
        {"params": params}, lat, txt, pooled, t, g, {}, full, (4, 4)
    )
    assert out1.shape == lat.shape
    # all-cached replay with identical inputs == recompute
    none = full_flux_mask(config, False)
    out2, cache2 = model.apply(
        {"params": params}, lat, txt, pooled, t, g, cache1, none, (4, 4)
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=2e-5, atol=2e-5
    )
    # dual-block attn cache holds the (img, txt) pair
    assert isinstance(cache1["full_attn_0"], tuple)
    # cached values carried through unchanged
    np.testing.assert_array_equal(
        np.asarray(cache1["single_proj_out_0"]),
        np.asarray(cache2["single_proj_out_0"]),
    )
    # different timestep with all-cached → re-gated, so output differs
    out3, _ = model.apply(
        {"params": params}, lat, txt, pooled, t * 0.1, g, cache1, none, (4, 4)
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_proj_mlp_cached_pre_activation(tiny):
    """single_proj_mlp caches the PRE-gelu projection (reference
    cached_flux_transformer_block.py:106-110): reusing it must reproduce the
    full output even though gelu is applied after the cache read."""
    config, model, params = tiny
    lat, txt, pooled, t, g = _inputs(config)
    full = full_flux_mask(config)
    out_full, cache = model.apply(
        {"params": params}, lat, txt, pooled, t, g, {}, full, (4, 4)
    )
    # recompute everything EXCEPT single proj_mlp (reads cache)
    mask = list(full)
    for i in range(config.num_blocks, len(mask)):
        mask[i] = (True, False, True)
    out_mixed, _ = model.apply(
        {"params": params}, lat, txt, pooled, t, g, cache, tuple(mask), (4, 4)
    )
    np.testing.assert_allclose(
        np.asarray(out_full), np.asarray(out_mixed), rtol=2e-5, atol=2e-5
    )


def test_pipeline_modes_agree(tiny):
    config, _, params = tiny
    rng = np.random.default_rng(0)
    n_slots = (config.num_blocks + config.num_single_blocks) * 3
    sched = FluxCacheSchedule.from_numpy(
        rng.random(STEPS * n_slots) < 0.5, STEPS, config.num_blocks,
        num_single_blocks=config.num_single_blocks,
    )
    pcfg = FluxPipelineConfig(
        model=config, num_inference_steps=STEPS, height=64, width=64
    )
    pipe = FluxPipeline(pcfg, params, sched)
    _, txt, pooled, _, _ = _inputs(config)
    out_u = pipe.generate_latents(txt, pooled, seed=1, mode="unrolled")
    out_s = pipe.generate_latents(txt, pooled, seed=1, mode="stepwise")
    assert out_u.shape == (2, 8, 8, config.in_channels // 4)
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=1e-4, atol=1e-4
    )


def test_flux_step_masks_layout(tiny):
    config, _, _ = tiny
    n_slots = config.num_blocks + config.num_single_blocks
    mask = np.zeros((STEPS, n_slots * 3), dtype=bool)
    mask[1, 0] = True  # block 0 full_attn at step 1
    mask[1, config.num_blocks * 3] = True  # single_0 attn at step 1
    sched = FluxCacheSchedule(
        config.num_blocks, STEPS, mask=mask,
        num_single_blocks=config.num_single_blocks,
    )
    masks = flux_step_masks(sched, config)
    assert masks[0] == full_flux_mask(config)  # step-0 forcing
    assert masks[1][0] == (True, False, False)
    assert masks[1][config.num_blocks] == (True, False, False)


def test_tiny_flux_generator(tmp_path):
    from ecad_tpu.image_generators import get_image_generator_type

    gen = get_image_generator_type("TinyFluxImageGenerator")(
        num_inference_steps=STEPS
    )
    embs = gen.encode_prompts(["a dog", "a cat"])
    assert embs[0]["prompt_embeds"].shape == (8, 32)
    imgs = gen.generate_images(embs, images_per_prompt=1, output_dir=tmp_path)
    assert len(imgs) == 2
    assert len(list(tmp_path.glob("*.png"))) == 2


def test_flux_population_denoiser_matches(tiny):
    from ecad_tpu.pipelines.flux_pipeline import FluxPopulationDenoiser

    config, _, params = tiny
    rng = np.random.default_rng(11)
    n_slots = (config.num_blocks + config.num_single_blocks) * 3
    pcfg = FluxPipelineConfig(
        model=config, num_inference_steps=STEPS, height=64, width=64
    )
    base = FluxPipeline(pcfg, params)
    den = FluxPopulationDenoiser(base)
    _, txt, pooled, _, _ = _inputs(config)
    noise = jax.random.normal(
        jax.random.PRNGKey(3), (2, pcfg.image_seq_len, config.in_channels)
    )
    for trial in range(2):
        genome = rng.random(STEPS * n_slots) < 0.5
        sched = FluxCacheSchedule.from_numpy(
            genome, STEPS, config.num_blocks,
            num_single_blocks=config.num_single_blocks,
        )
        spec = FluxPipeline(pcfg, params, sched)
        want = spec.build_denoise_fn(donate=False)(params, noise, txt, pooled)
        masks = np.array(sched.mask, dtype=bool).reshape(STEPS, -1, 3)
        masks[0] = True
        got = den.denoise(masks, noise, txt, pooled)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=f"trial {trial}",
        )
    assert len(den._fn_cache) == 1


def test_flux_attention_routes_through_backend_switch(tiny, monkeypatch):
    """Regression: FLUX blocks must call models.common.dot_product_attention
    (the set_attention_backend dispatcher), not jax.nn directly — otherwise
    the pallas flash kernel never engages for the 4608-token 1024² path."""
    from ecad_tpu.models import common as C
    from ecad_tpu.models import flux as F

    config, model, params = tiny
    calls = []
    real = C.dot_product_attention

    def spy(q, k, v, bias=None):
        calls.append(q.shape)
        return real(q, k, v, bias)

    monkeypatch.setattr(F, "dot_product_attention", spy)
    lat, txt, pooled, t, g = _inputs(config)
    model.apply(
        {"params": params}, lat, txt, pooled, t, g, {},
        full_flux_mask(config), (4, 4),
    )
    # one joint attention per dual block + one per single block
    assert len(calls) == config.num_blocks + config.num_single_blocks


def test_cache_dtype_f8_storage(tiny):
    """cache_dtype=float8_e4m3fn stores cached component activations at
    half the bytes (the lever that fits the cached full-width 12B
    programs on one 16 GiB chip at 1024²); reads cast back to the
    compute dtype, and the end-to-end rounding stays small against a
    recompute baseline."""
    import dataclasses

    config, model, params = tiny
    cfg8 = dataclasses.replace(config, cache_dtype=jnp.float8_e4m3fn)
    model8 = FluxTransformer(cfg8)
    lat, txt, pooled, t, g = _inputs(config)
    full = full_flux_mask(config)
    none = full_flux_mask(config, False)

    ref, _ = model.apply(
        {"params": params}, lat, txt, pooled, t, g, {}, full, (4, 4)
    )
    out1, cache1 = model8.apply(
        {"params": params}, lat, txt, pooled, t, g, {}, full, (4, 4)
    )
    # recompute-everything output is exact (caches written, never read)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
    # stored at half width
    assert cache1["single_proj_mlp_0"].dtype == jnp.float8_e4m3fn
    assert cache1["full_attn_0"][0].dtype == jnp.float8_e4m3fn
    # all-cached replay only adds the f8 storage rounding
    out2, _ = model8.apply(
        {"params": params}, lat, txt, pooled, t, g, cache1, none, (4, 4)
    )
    ref_np = np.asarray(ref, np.float32)
    rel = np.linalg.norm(np.asarray(out2, np.float32) - ref_np) / max(
        np.linalg.norm(ref_np), 1e-9
    )
    assert np.isfinite(np.asarray(out2, np.float32)).all()
    assert rel < 0.08, rel


def test_cache_dtype_f8_dynamic_mode(tiny):
    """The population (lax.cond) denoiser carries f8 caches through the
    step scan: run a random schedule and bound the drift against the
    bf16-cache specialized pipeline."""
    import dataclasses

    from ecad_tpu.pipelines.flux_pipeline import FluxPopulationDenoiser

    config, _, params = tiny
    cfg8 = dataclasses.replace(config, cache_dtype=jnp.float8_e4m3fn)
    rng = np.random.default_rng(7)
    n_slots = (config.num_blocks + config.num_single_blocks) * 3
    pcfg8 = FluxPipelineConfig(
        model=cfg8, num_inference_steps=STEPS, height=64, width=64
    )
    pcfg = FluxPipelineConfig(
        model=config, num_inference_steps=STEPS, height=64, width=64
    )
    den = FluxPopulationDenoiser(FluxPipeline(pcfg8, params))
    _, txt, pooled, _, _ = _inputs(config)
    noise = jax.random.normal(
        jax.random.PRNGKey(5), (2, pcfg8.image_seq_len, config.in_channels)
    )
    genome = rng.random(STEPS * n_slots) < 0.5
    sched = FluxCacheSchedule.from_numpy(
        genome, STEPS, config.num_blocks,
        num_single_blocks=config.num_single_blocks,
    )
    want = FluxPipeline(pcfg, params, sched).build_denoise_fn(donate=False)(
        params, noise, txt, pooled
    )
    masks = np.array(sched.mask, dtype=bool).reshape(STEPS, -1, 3)
    masks[0] = True
    got = den.denoise(masks, noise, txt, pooled)
    w = np.asarray(want, np.float32)
    rel = np.linalg.norm(np.asarray(got, np.float32) - w) / max(
        np.linalg.norm(w), 1e-9
    )
    assert np.isfinite(np.asarray(got, np.float32)).all()
    assert rel < 0.1, rel

"""PixArt model tests: shapes, cache semantics, and mask specialization.

The cache-semantics test is the core correctness property of the whole
framework: a component with mask=False must return exactly the previous
step's output for that component, re-gated with the *current* step's adaln
gates (reference cached_transformer_block.py:326-391)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecad_tpu.models import (
    PixArtConfig,
    full_step_mask,
    init_cache,
    init_params,
    schedule_step_masks,
)
from ecad_tpu.schedules import PixArtCacheSchedule


@pytest.fixture(scope="module")
def tiny():
    config = PixArtConfig.tiny(dtype=jnp.float32)
    model, params = init_params(config, 0)
    return config, model, params


def _inputs(config, batch=2, seed=0):
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    latents = jax.random.normal(
        k1, (batch, config.sample_size, config.sample_size, config.in_channels)
    )
    text = jax.random.normal(k2, (batch, config.text_len, config.caption_dim))
    t = jnp.full((batch,), 500.0)
    return latents, text, t


def test_forward_shapes(tiny):
    config, model, params = tiny
    latents, text, t = _inputs(config)
    cache = init_cache(config, 2)
    out, new_cache = model.apply(
        {"params": params}, latents, text, t, cache, full_step_mask(config)
    )
    assert out.shape == (2, 8, 8, config.out_channels)
    assert len(new_cache["attn1"]) == config.num_blocks
    assert new_cache["attn1"][0].shape == (2, config.tokens, config.dim)
    assert not np.allclose(np.asarray(out), 0)


def test_cache_reuse_semantics(tiny):
    """All-False step must equal recomputation when inputs are identical, and
    cached components must change the output when hidden states differ."""
    config, model, params = tiny
    latents, text, t = _inputs(config)
    cache0 = init_cache(config, 2)
    full = full_step_mask(config)
    out1, cache1 = model.apply(
        {"params": params}, latents, text, t, cache0, full
    )
    # Same input, all components cached → identical output (cache holds the
    # exact pre-gate outputs and gates are identical).
    none_mask = full_step_mask(config, False)
    out2, cache2 = model.apply(
        {"params": params}, latents, text, t, cache1, none_mask
    )
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out2), rtol=2e-5, atol=2e-5
    )
    # Cache is carried through unchanged on reuse
    for k in cache1:
        np.testing.assert_array_equal(
            np.asarray(cache1[k]), np.asarray(cache2[k])
        )
    # Different latents but all-cached → differs from fresh recompute
    latents_b = latents + 1.0
    out_cached, _ = model.apply(
        {"params": params}, latents_b, text, t, cache1, none_mask
    )
    out_fresh, _ = model.apply(
        {"params": params}, latents_b, text, t, cache1, full
    )
    assert not np.allclose(np.asarray(out_cached), np.asarray(out_fresh))


def test_cache_regating(tiny):
    """A cached component reused at a different timestep must be re-gated
    with the new step's gates — outputs differ from the original step's even
    though the cached tensor is identical."""
    config, model, params = tiny
    latents, text, t = _inputs(config)
    cache0 = init_cache(config, 2)
    full = full_step_mask(config)
    out_t, cache1 = model.apply(
        {"params": params}, latents, text, t, cache0, full
    )
    none_mask = full_step_mask(config, False)
    t2 = jnp.full_like(t, 100.0)
    out_t2, _ = model.apply(
        {"params": params}, latents, text, t2, cache1, none_mask
    )
    assert not np.allclose(np.asarray(out_t), np.asarray(out_t2))


def test_partial_mask_matches_reference_composition(tiny):
    """Mixed mask: block 0 recomputes attn1 only. The result must equal a
    hand-composed forward where attn2/ff come from the cache."""
    config, model, params = tiny
    latents, text, t = _inputs(config)
    cache0 = init_cache(config, 2)
    full = full_step_mask(config)
    _, cache1 = model.apply({"params": params}, latents, text, t, cache0, full)

    mixed = tuple(
        (True, False, False) if i == 0 else (True, True, True)
        for i in range(config.num_blocks)
    )
    out_mixed, cache_mixed = model.apply(
        {"params": params}, latents, text, t, cache1, mixed
    )
    # attn2/ff cache rows for block 0 must be carried over unchanged
    np.testing.assert_array_equal(
        np.asarray(cache_mixed["attn2"][0]), np.asarray(cache1["attn2"][0])
    )
    np.testing.assert_array_equal(
        np.asarray(cache_mixed["ff"][0]), np.asarray(cache1["ff"][0])
    )
    # attn1 was recomputed → differs (latents identical, but cache path vs
    # fresh agree only if inputs identical; here they are, so check equality)
    np.testing.assert_allclose(
        np.asarray(cache_mixed["attn1"][0]),
        np.asarray(cache1["attn1"][0]),
        rtol=2e-5,
        atol=2e-5,
    )
    assert out_mixed.shape == (2, 8, 8, config.out_channels)


def test_schedule_step_masks_forcing():
    s = PixArtCacheSchedule.from_numpy(
        np.zeros(20 * 28 * 3, dtype=bool), 20, 28
    )
    config = PixArtConfig()
    masks = schedule_step_masks(s, config)
    assert masks[0] == full_step_mask(config)  # step-0 forcing
    assert masks[1] == full_step_mask(config, False)


def test_text_mask_bias(tiny):
    config, model, params = tiny
    latents, text, t = _inputs(config)
    cache = init_cache(config, 2)
    full = full_step_mask(config)
    tm = jnp.ones((2, config.text_len))
    tm = tm.at[:, config.text_len // 2 :].set(0)
    out_masked, _ = model.apply(
        {"params": params}, latents, text, t, cache, full, text_mask=tm
    )
    out_unmasked, _ = model.apply(
        {"params": params}, latents, text, t, cache, full
    )
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_unmasked))
    # masking out padding with zeroed text should equal truncated attention:
    # check invariance — changing masked-out token content must not matter
    text2 = text.at[:, config.text_len // 2 :].set(123.0)
    out_masked2, _ = model.apply(
        {"params": params}, latents, text2, t, cache, full, text_mask=tm
    )
    np.testing.assert_allclose(
        np.asarray(out_masked), np.asarray(out_masked2), rtol=2e-5, atol=2e-5
    )


def test_serving_cast():
    """fp32 masters → compute-dtype leaves for serving; fp32 configs (the
    parity-test regime) pass through untouched."""
    import jax.numpy as jnp

    from ecad_tpu.models.common import serving_cast

    tree = {
        "w": jnp.ones((4, 4), jnp.float32),
        "step": jnp.array(3, jnp.int32),
    }
    out = serving_cast(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["step"].dtype == jnp.int32
    same = serving_cast(tree, jnp.float32)
    assert same["w"].dtype == jnp.float32

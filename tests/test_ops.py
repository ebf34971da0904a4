"""Pallas kernel correctness (interpreter mode on CPU) against XLA math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecad_tpu.ops import fused_attention, modulated_layer_norm


@pytest.mark.parametrize("tq,tk,d", [(16, 16, 72), (16, 24, 16), (8, 128, 64)])
def test_fused_attention_matches_xla(tq, tk, d):
    b, h = 2, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(k1, (b, tq, h, d))
    k = jax.random.normal(k2, (b, tk, h, d))
    v = jax.random.normal(k3, (b, tk, h, d))
    want = jax.nn.dot_product_attention(q, k, v)
    got = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_fused_attention_with_bias():
    b, h, tq, tk, d = 2, 2, 8, 12, 16
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    q = jax.random.normal(keys[0], (b, tq, h, d))
    k = jax.random.normal(keys[1], (b, tk, h, d))
    v = jax.random.normal(keys[2], (b, tk, h, d))
    # key-padding style bias (B, 1, 1, Tk)
    bias = jnp.where(
        jnp.arange(tk)[None, None, None, :] < 7, 0.0, -1e9
    ) * jnp.ones((b, 1, 1, tk))
    want = jax.nn.dot_product_attention(q, k, v, bias=bias)
    got = fused_attention(q, k, v, bias=bias, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_modulated_layer_norm_matches_reference():
    from ecad_tpu.models.common import layer_norm

    b, t, d = 3, 16, 128
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(keys[0], (b, t, d))
    scale = jax.random.normal(keys[1], (b, 1, d)) * 0.1
    shift = jax.random.normal(keys[2], (b, 1, d)) * 0.1
    want = layer_norm(x) * (1 + scale) + shift
    got = modulated_layer_norm(x, scale, shift, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )

"""Pallas attention under a multi-device mesh via shard_map.

Mosaic (Pallas) kernels cannot be auto-partitioned by jit under a mesh —
XLA raises "Mosaic kernels cannot be automatically partitioned". The
dispatcher in models/common.py therefore routes its pallas paths through
shard_map (batch over "dp", heads over "tp": attention has no cross-batch
or cross-head dataflow, so per-shard kernels need no collectives). These
tests pin the wrapper's numerics, its bias-spec logic, and its fallback
predicates on the virtual 8-device CPU mesh with interpret-mode kernels.
This is the path the v5e-8 AOT lowering of full-width FLUX exercises
(scripts/flux_full_width.py aot; docs/flux_hbm_accounting.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ecad_tpu.models.common import (
    _active_multidevice_mesh,
    _shard_map_attention,
)
from ecad_tpu.ops import attention as A

B, TQ, TK, H, D = 4, 128, 128, 8, 64


def _qkv(d=D, tk=TK):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (B, TQ, H, d))
    k = jax.random.normal(keys[1], (B, tk, H, d))
    v = jax.random.normal(keys[2], (B, tk, H, d))
    return q, k, v


def _mesh(dp=2, tp=4, names=("dp", "tp")):
    devs = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, names)


def _key_padding_bias(batch, tk=TK, keep=100):
    mask = jnp.arange(tk)[None, None, None, :] < keep
    return jnp.where(mask, 0.0, -1e9) * jnp.ones((batch, 1, 1, tk))


BIASES = {
    "none": lambda: None,
    "key_padding": lambda: _key_padding_bias(B),
    "batch_broadcast": lambda: _key_padding_bias(1),
    "dense": lambda: 0.1
    * jax.random.normal(jax.random.PRNGKey(7), (B, H, TQ, TK)),
}


@pytest.mark.parametrize("bias_name", list(BIASES))
def test_single_tile_kernel_under_mesh(bias_name):
    q, k, v = _qkv()
    bias = BIASES[bias_name]()
    want = jax.nn.dot_product_attention(q, k, v, bias=bias)
    kernel = lambda q_, k_, v_, b_: A.fused_attention(  # noqa: E731
        q_, k_, v_, bias=b_, interpret=True
    )
    got = _shard_map_attention(kernel, _mesh(), q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


@pytest.mark.parametrize("bias_batch", [None, B, 1])
def test_flash_kernel_under_mesh(bias_batch):
    q, k, v = _qkv(d=128, tk=256)
    bias = (
        None
        if bias_batch is None
        else _key_padding_bias(bias_batch, tk=256, keep=200)
    )
    want = jax.nn.dot_product_attention(q, k, v, bias=bias)
    kernel = lambda q_, k_, v_, b_: A._flash_attention(  # noqa: E731
        q_, k_, v_, b_, interpret=True
    )
    got = _shard_map_attention(kernel, _mesh(), q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_dp_only_and_tp_only_meshes():
    q, k, v = _qkv()
    want = jax.nn.dot_product_attention(q, k, v)
    kernel = lambda q_, k_, v_, b_: A.fused_attention(  # noqa: E731
        q_, k_, v_, bias=b_, interpret=True
    )
    for dp, tp in ((4, 1), (1, 8), (2, 2)):
        got = _shard_map_attention(kernel, _mesh(dp, tp), q, k, v, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
        )


def test_fallback_predicates():
    """Unknown axis names or non-dividing shapes return None (caller falls
    back to XLA, which jit auto-partitions)."""
    q, k, v = _qkv()
    kernel = lambda q_, k_, v_, b_: q_  # noqa: E731 — never called
    assert (
        _shard_map_attention(kernel, _mesh(names=("x", "y")), q, k, v, None)
        is None
    )
    # dp=3 does not divide B=4
    devs = np.array(jax.devices()[:3]).reshape(3, 1)
    mesh3 = Mesh(devs, ("dp", "tp"))
    assert _shard_map_attention(kernel, mesh3, q, k, v, None) is None
    # tp=8 does not divide H when H=4
    qs, ks, vs = (x[:, :, :4] for x in (q, k, v))
    assert (
        _shard_map_attention(kernel, _mesh(1, 8), qs, ks, vs, None) is None
    )


def test_active_mesh_detection():
    assert _active_multidevice_mesh() is None
    m = _mesh()
    with m:
        got = _active_multidevice_mesh()
        assert got is not None and got.size == 8
    assert _active_multidevice_mesh() is None
    # a 1-device mesh is not "multi-device" — plain kernel call suffices
    one = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    with one:
        assert _active_multidevice_mesh() is None


def test_dispatcher_xla_fallback_under_mesh_matches():
    """dot_product_attention (backend xla, CPU) under an active mesh keeps
    returning XLA numerics — the mesh routing must not disturb the
    non-pallas path."""
    from ecad_tpu.models.common import dot_product_attention

    q, k, v = _qkv()
    want = jax.nn.dot_product_attention(q, k, v)
    with _mesh():
        got = dot_product_attention(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def _sp_mesh(dp, sp, tp):
    devs = np.array(jax.devices()[: dp * sp * tp]).reshape(dp, sp, tp)
    return Mesh(devs, ("dp", "sp", "tp"))


@pytest.mark.parametrize("dp,sp,tp", [(2, 2, 2), (1, 8, 1), (1, 2, 4)])
@pytest.mark.parametrize("bias_name", ["none", "key_padding", "dense"])
def test_sp_mesh_attention(dp, sp, tp, bias_name):
    """Sequence-parallel meshes: query tokens shard over "sp". With no
    bias K/V arrive sp-sharded and are all-gathered inside the shard
    (self/joint attention); with a bias K/V and the bias stay whole per
    shard (cross-attention), a dense bias sharding its Tq axis with q.
    All variants must be exact vs XLA."""
    q, k, v = _qkv()
    bias = BIASES[bias_name]()
    want = jax.nn.dot_product_attention(q, k, v, bias=bias)
    kernel = lambda q_, k_, v_, b_: A.fused_attention(  # noqa: E731
        q_, k_, v_, bias=b_, interpret=True
    )
    got = _shard_map_attention(kernel, _sp_mesh(dp, sp, tp), q, k, v, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_sp_mesh_fallbacks():
    """sp that does not divide the query tokens → None (XLA fallback);
    kv tokens not dividing sp with no bias → kv kept whole (still exact)."""
    q, k, v = _qkv()
    kernel = lambda q_, k_, v_, b_: A.fused_attention(  # noqa: E731
        q_, k_, v_, bias=b_, interpret=True
    )
    assert (
        _shard_map_attention(kernel, _sp_mesh(1, 4, 2), q[:, :126], k, v, None)
        is None
    )
    # Tk=120 % sp=4 != 0: q shards, kv replicated, no all-gather — exact
    ks, vs = k[:, :120], v[:, :120]
    want = jax.nn.dot_product_attention(q, ks, vs)
    got = _shard_map_attention(kernel, _sp_mesh(1, 4, 2), q, ks, vs, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )

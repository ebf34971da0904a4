"""Pallas fused attention kernel for TPU.

The DiT workloads here have short sequences (PixArt 256 latent + 120 text
tokens; FLUX 768 joint tokens at 256², 4608 at 1024²), so entire (T, d)
tiles fit in VMEM: one fused kernel per (batch, head) computes
scores → fp32 softmax → value contraction without materializing the score
matrix in HBM. For these sizes a streaming flash decomposition is
unnecessary; the win over unfused XLA is keeping the (Tq, Tk) intermediate
on-chip. Head dims that are not lane-aligned (PixArt's 72) are zero-padded
to 128 in the wrapper — padding K columns adds zero scores and padding V
columns adds zero outputs, so results are exact.

Use `fused_attention(q, k, v, bias=None)` with (B, T, H, D) tensors — the
same contract as jax.nn.dot_product_attention (TPU or interpret mode; the
models select between this and the XLA path via set_attention_backend).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """One (batch·head) tile: q (Tq, D), k (Tk, D), v (Tk, D) in VMEM."""
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (out / denom).astype(o_ref.dtype)


def _attn_kernel_bias(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    scores = scores + b_ref[0].astype(jnp.float32)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """(B, Tq, H, D) × (B, Tk, H, D) → (B, Tq, H, D), fp32 softmax.

    `bias` broadcasts from (B, 1, 1, Tk) or (B, H, Tq, Tk) like
    jax.nn.dot_product_attention's bias argument.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = 1.0 / float(np.sqrt(d))

    d_pad = _round_up(d, 128)
    tq_pad = _round_up(tq, 8)
    tk_pad = _round_up(tk, 128)

    def pad(x, t_pad):
        t = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, d_pad - d)))

    qp = pad(q, tq_pad).transpose(0, 2, 1, 3).reshape(b * h, tq_pad, d_pad)
    kp = pad(k, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)

    grid = (b * h,)
    kwargs = dict(
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        out_specs=pl.BlockSpec(
            (1, tq_pad, d_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )
    tile = lambda t: pl.BlockSpec(  # noqa: E731
        (1, t, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )

    if bias is None and tk == tk_pad:
        # common fast path: no dense bias operand at all
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale),
            in_specs=[tile(tq_pad), tile(tk_pad), tile(tk_pad)],
            **kwargs,
        )(qp, kp, vp)
        out = out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
        return out.transpose(0, 2, 1, 3)

    # padded K rows must not receive attention mass
    pad_bias = jnp.where(
        jnp.arange(tk_pad) < tk, 0.0, -1e9
    ).astype(jnp.float32)[None, None, :]

    # keep the bias operand as small as broadcasting allows: one shared
    # block when the bias has no batch/head/query structure, per-batch
    # blocks for key-padding biases, dense only in the general case
    if bias is None:
        bias_arr = jnp.broadcast_to(pad_bias, (1, tq_pad, tk_pad))
        bias_index = lambda i: (0, 0, 0)  # noqa: E731
    elif bias.shape[1] == 1 and bias.shape[2] == 1:
        bias_b = jnp.pad(
            bias.astype(jnp.float32)[:, 0], ((0, 0), (0, 0), (0, tk_pad - tk))
        )  # (B, 1, tk_pad)
        bias_arr = jnp.broadcast_to(
            bias_b, (b, tq_pad, tk_pad)
        ) + pad_bias
        bias_index = lambda i: (i // h, 0, 0)  # noqa: E731
    else:
        bias_b = jnp.broadcast_to(bias.astype(jnp.float32), (b, h, tq, tk))
        bias_b = jnp.pad(
            bias_b, ((0, 0), (0, 0), (0, tq_pad - tq), (0, tk_pad - tk))
        ).reshape(b * h, tq_pad, tk_pad)
        bias_arr = bias_b + pad_bias
        bias_index = lambda i: (i, 0, 0)  # noqa: E731

    out = pl.pallas_call(
        functools.partial(_attn_kernel_bias, scale=scale),
        in_specs=[
            tile(tq_pad),
            tile(tk_pad),
            tile(tk_pad),
            pl.BlockSpec(
                (1, tq_pad, tk_pad), bias_index, memory_space=pltpu.VMEM
            ),
        ],
        **kwargs,
    )(qp, kp, vp, bias_arr)
    out = out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
    return out.transpose(0, 2, 1, 3)

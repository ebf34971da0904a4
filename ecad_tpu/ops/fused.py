"""Pallas fused adaln-modulated layer norm.

The PixArt/FLUX blocks apply `LN(x)·(1+scale) + shift` with per-sample
(scale, shift) from the adaln embedding. Unfused this is 2 reductions +
3 elementwise passes over the (B, T, d) activations; the kernel does one
VMEM-resident pass per (batch, row-tile). XLA usually fuses this chain
already — the kernel exists for the cases where the fusion boundary breaks
(e.g. around the cached-component branches) and as the building block for
deeper fusions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _modlnorm_kernel(x_ref, scale_ref, shift_ref, o_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # (rows, d)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    normed = xc * jax.lax.rsqrt(var + eps)
    scale = scale_ref[0].astype(jnp.float32)  # (1, d) per-batch row
    shift = shift_ref[0].astype(jnp.float32)
    o_ref[0] = (normed * (1.0 + scale) + shift).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def modulated_layer_norm(
    x: jax.Array,  # (B, T, d)
    scale: jax.Array,  # (B, 1, d) or (B, d)
    shift: jax.Array,
    eps: float = 1e-6,
    interpret: bool = False,
) -> jax.Array:
    """LN(x)·(1+scale)+shift fused in one pass (affine-free LN, fp32 stats)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, d = x.shape
    scale = scale.reshape(b, 1, d)
    shift = shift.reshape(b, 1, d)
    return pl.pallas_call(
        functools.partial(_modlnorm_kernel, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(x, scale, shift)

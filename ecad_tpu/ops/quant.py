"""Int8 (W8A8) dynamic-quantization matmul path for serving.

The v5e MXU executes int8×int8→int32 matmuls at twice the bf16 rate
(~394 TOPS vs ~197 TFLOP/s), and XLA lowers an int8 `lax.dot_general`
with `preferred_element_type=int32` to that native path — the same
mechanism Google's AQT serving stack uses. Since the DiT denoise step is
~85% linear-layer matmuls (qkv/out projections + MLPs; see
docs/benchmarking.md), routing those through int8 is the largest
single-chip throughput lever after the Pallas attention kernels.

Scheme: symmetric, zero-point-free:

* activations — dynamic per-token scales (max-abs over the contraction
  axis, computed on the fly each call; fuses into the producer's VPU
  epilogue),
* weights — per-output-channel scales, recomputed inside the jitted
  program. In the unrolled static-schedule programs XLA CSEs the 20
  identical per-step weight-quant subgraphs into one; in the lax.scan
  population programs the requant costs one VPU pass over the weights
  per step (~2 ms for the 0.6 B-param PixArt at batch 32 — noise).

This is an opt-in SERVING mode (`PixArtConfig(quant="int8")` /
`FluxConfig(quant="int8")`), not a training scheme. It deliberately
keeps high precision where the quality literature says it matters:
patch/caption/timestep embedders, adaLN modulation, q/k norms, softmax
(fp32), and the final projection all stay bf16/fp32; only the block
projections quantize. The reference has no quantized path (fp16 weights
at best, pixart_transformer_2d_edited.py:98) — this is a beyond-parity
capability. Numerics: tests/test_quant.py bounds the per-layer relative
error; end-image deltas on random weights are reported by
scripts/bench_quant.py next to the speedup.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-8


def quantize_int8(x: jax.Array, axis: int) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization along `axis`.

    Returns (q, scale) with q int8 in [-127, 127] and scale fp32 shaped
    like `x` with `axis` collapsed to 1, such that q * scale ≈ x.
    """
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, _EPS) * (1.0 / 127.0)
    q = jnp.clip(jnp.round(x32 / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_dot_general(
    lhs: jax.Array,
    rhs: jax.Array,
    dimension_numbers: Any,
    precision: Any = None,
    preferred_element_type: Optional[Any] = None,
) -> jax.Array:
    """Drop-in `lax.dot_general` that runs the contraction on the int8 MXU.

    Handles the Dense pattern — contract the LAST dim of `lhs` with dim 0
    of `rhs`, no batch dims (exactly what `flax.linen.Dense` emits). Any
    other dimension-number structure falls through to the exact
    `lax.dot_general` so the module remains a safe universal override.

    Out-of-range inputs are saturated per-tile by construction (max-abs
    scaling), so there is no overflow path; accumulation is int32 and the
    (lhs_scale ⊗ rhs_scale) dequant outer product is applied in fp32.
    """
    (lc, rc), (lb, rb) = dimension_numbers
    if (
        lb
        or rb
        or len(lc) != 1
        or len(rc) != 1
        or lc[0] != lhs.ndim - 1
        or rc[0] != 0
    ):
        return lax.dot_general(
            lhs,
            rhs,
            dimension_numbers,
            precision=precision,
            preferred_element_type=preferred_element_type,
        )

    out_dtype = preferred_element_type or jnp.promote_types(
        lhs.dtype, rhs.dtype
    )
    ql, sl = quantize_int8(lhs, axis=lhs.ndim - 1)  # sl: (..., 1)
    qr, sr = quantize_int8(rhs, axis=0)  # sr: (1, *rhs_free)

    acc = lax.dot_general(
        ql, qr, dimension_numbers, preferred_element_type=jnp.int32
    )  # (*lhs_free, *rhs_free) int32
    # sl broadcasts over the rhs free dims from the left (its trailing
    # keepdim aligns with rhs's first free dim only when rhs is 2-D; pad
    # explicitly for the general rank)
    sl_b = sl.reshape(sl.shape[:-1] + (1,) * (rhs.ndim - 1))
    sr_b = sr.reshape((1,) * (lhs.ndim - 1) + sr.shape[1:])
    return (acc.astype(jnp.float32) * sl_b * sr_b).astype(out_dtype)


def maybe_quant_dot_general(quant: Optional[str]):
    """The `dot_general` override for a quant mode name: None (exact
    default) for bf16 serving, `int8_dot_general` for "int8"."""
    if quant is None or quant == "none":
        return None
    if quant == "int8":
        return int8_dot_general
    raise ValueError(f"unknown quant mode {quant!r} (expected None|'int8')")

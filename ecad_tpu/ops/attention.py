"""Pallas fused attention kernels for TPU.

Two regimes, one entry point (`fused_attention`):

* **Single-tile** (short sequences — PixArt 256: 1024 latent + 120 text
  tokens; FLUX 256: 768 joint tokens): the full (Tq, Tk) score matrix for
  one (batch, head) fits in VMEM, so one kernel instance computes
  scores → fp32 softmax → value contraction with no HBM intermediate and
  no online-softmax bookkeeping.
* **Flash** (long sequences — FLUX 1024: 4096 packed latent + 512 text =
  4608 joint tokens, where a fp32 score tile would be 85 MB ≫ ~16 MB
  VMEM): KV-blocked streaming with the standard online-softmax recurrence
  (running max `m`, normalizer `l`, unnormalized accumulator carried in
  VMEM scratch across the innermost grid dimension). Fills the role of
  torch SDPA's flash path that the reference's FLUX blocks delegate to
  (ecad/transformer_blocks/cached_flux_transformer_block.py via diffusers
  FluxAttnProcessor → F.scaled_dot_product_attention).

Head dims that are not lane-aligned (PixArt's 72) are zero-padded to 128
in the wrapper — padding K columns adds zero scores and padding V columns
adds zero outputs, so results are exact. Padded K *rows* are masked with
a -1e9 additive bias so they receive no softmax mass.

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


def _flash_bias_ok(bias: Optional[jax.Array], batch: int) -> bool:
    """True iff `bias` is a shape the flash path handles: None, or a
    key-padding bias (B, 1, 1, Tk) / batch-broadcast (1, 1, 1, Tk).
    Single source of truth for the predicate used by fused_attention's
    routing, models.common._auto_flash, and _flash_attention itself —
    keeping the three sites in sync (a broadcastable bias the kernel
    can't index safely must fall back to XLA everywhere at once)."""
    return bias is None or (
        bias.ndim == 4
        and bias.shape[1] == 1
        and bias.shape[2] == 1
        and bias.shape[0] in (1, batch)
    )


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


# Above this many fp32 score-tile bytes per (batch, head) the single-tile
# kernel would not fit VMEM (~16 MB/core) alongside q/k/v/acc; stream
# instead. 8 MB keeps headroom for the operand tiles and double buffering.
_SINGLE_TILE_SCORE_BYTES = 8 * 1024 * 1024

# Tuned on v5e at the FLUX-1024 shape (B2 H24 T4608 D128): the sweep over
# (bq, bk) ∈ {256..1536}² put (512, 1536) fastest at 6.0 ms vs 32.3 ms for
# XLA's dot_product_attention — fewer, larger kv steps amortize the
# per-grid-step online-softmax bookkeeping.
_FLASH_BLOCK_Q = 512
_FLASH_BLOCK_K = 1536
_NEG_INF = -1e9
_LOG2E = 1.4426950408889634

# Row-block single-pass kernel: when the whole (padded) key sequence fits
# VMEM next to one q-block's fp32 score tile, the online-softmax
# recurrence is pure overhead — one grid step per (batch·head, q-block)
# computes exact softmax rows with no m/l scratch and no carried rescale.
# The DiT shapes this framework serves all qualify (FLUX-1024: 4608×128,
# PixArt-1024: 4096×128-padded); the streaming kernel remains for longer
# sequences. Threshold in k-elements (tk_pad × d_pad).
#
# The kernel processes kv in TWO in-body chunks: chunk 0's softmax (VPU
# exp pass) has no data dependency on chunk 1's score matmul (MXU), so
# the scheduler dual-issues them. Softmax range handling is the static
# clamp documented in _rowblock_compute (no per-row max pass). Measured
# on v5e (scripts/exp_attn_variants.py, scripts/bench_attention_kernels.py):
#   B2H24T4608D128 (FLUX-1024): matmul-only floor 3.28 ms; shipped
#     clamped chunked no-bias kernel 3.56 ms at bq=256 (max-subtract
#     variant: 3.94) — vs 4.70 ms streaming flash, 31.0 ms XLA (8.7×;
#     ~76% of the ~2.7 ms MXU roofline).
#   B8H16T4096D72 (PixArt-1024): 8.38–8.49 ms (max-subtract: 8.93) —
#     vs 11.9 ms streaming flash and 11.1 ms XLA (the r2 kernel lost
#     this regime; the clamped chunked kernel wins it despite the
#     72→128 lane pad; matmul-only floor 8.4 ms — at the floor).
# bq: D128 measurements straddle run-to-run noise (256: 3.56 then 3.80;
# 512: 3.66 then 3.49 across two shootout runs) — keep 256. The padded-D
# regime's first true sweep (the original sweep mutated the wrong knob,
# see bench_attention_kernels.py) says 512: 8.44 vs 8.70 at 256, 9.08
# at 128 (B8H16T4096D72).
_ROWBLOCK_BLOCK_Q = 256
_ROWBLOCK_BLOCK_Q_PADDED_D = 512
_ROWBLOCK_MAX_KV_ELEMS = 8192 * 128

# Transposed sublane-contracted kernel (lane-padded head dims, e.g.
# PixArt's 72): see _transposed_kernel. Measured on v5e
# (scripts/exp_attn_variants.py, `transposed_subk` rows, quiet host):
# B8H16T4096D72 5.36 ms (prior lane-contracted-QK transposed-PV 5.90,
# row-block 8.44, padded matmul-only floor 8.3); B64H16T1024D72 4.14
# (prior 5.08). bq=512 best at both shapes (256: 5.52 / 5.01).
_TRANSPOSED_BLOCK_Q = 512
# cap the kv rows per in-body chunk so the fp32 (chunk, bq) score tile
# stays ≤4 MB next to K/Vᵀ (two chunks are alive for MXU/VPU dual-issue)
_TRANSPOSED_MAX_CHUNK = 2048
# below this padded fp32 score size the single-tile kernel keeps padded-D
# shapes (launch overhead dominates; matches the models-layer auto floor)
_TRANSPOSED_MIN_SCORE_BYTES = 1024 * 1024


def _flash_kernel(
    q_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr, acc_scr, *, scale: float
):
    """One (batch·head, q-block, kv-block) grid step of online-softmax
    attention. Scratch (m, l, acc) persists across the innermost (kv)
    grid dimension; the output block is written on the last kv step."""
    from jax.experimental import pallas as pl

    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # operands stay in the input dtype (bf16 on the hot path) so the MXU
    # runs at full rate; accumulation is fp32 via preferred_element_type
    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]  # (bk, d)
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (bq, bk) fp32
    s = s + b_ref[0].astype(jnp.float32)  # (1, bk) broadcasts over rows

    m_prev = m_scr[:, :1]  # (bq, 1); lanes replicate the row max
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_next)  # (bq, 1)
    p = jnp.exp(s - m_next)  # (bq, bk)
    l_next = alpha * l_scr[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_next, l_scr.shape)

    @pl.when(kv_i == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


_CLAMP_LO = -100.0  # log2 domain; see _rowblock_compute
_CLAMP_HI = 80.0


def _rowblock_compute(q_ref, k_ref, v_ref, o_ref, chunks, bias_slice):
    """Shared math for the chunked row-block kernels. `bias_slice(lo, hi)`
    returns the log2-domain additive bias row for a kv chunk, or None for
    the no-bias fast path.

    Softmax range handling uses a STATIC clamp instead of the per-row max
    subtraction: ``p = exp2(clip(s, -100, 80))``. The max reduce + rescale
    cost a full VPU pass over every score tile plus the cross-chunk
    combine — measured 3.94 → 3.38 ms at B2H24T4608D128 and 8.93 → 8.33
    at B8H16T4096D72 when dropped (scripts/exp_attn_variants.py `nomax`),
    while the clamp fuses into the exp2 pass. Why the clamp is safe for
    ANY input (not just "bounded logits"):

    * no overflow: p ≤ 2^80, so the (≤8192-term) fp32 denominator is
      ≤ 2^93 and the p·v accumulation stays far below fp32/bf16 max.
    * no NaN: p ≥ 2^-100 > 0, so the denominator is never zero.
    * exact whenever every (biased) logit lies in [-100, 80] — in the
      log2 domain 80 ≈ 55 nats, an attention entropy regime no trained
      model reaches (softmax at 55 nats is one-hot beyond fp32
      resolution). Key-padding −1e9 biases clamp to weight 2^-100,
      ≤ 2^-70 relative spurious mass for any row whose true max exceeds
      −30. Only rows whose logits ALL sit outside the window degrade —
      and they degrade to a near-uniform average, never to inf/NaN.
    """
    q = q_ref[0]
    sums, pvs = [], []
    for lo, hi in chunks:
        s = jax.lax.dot_general(
            q, k_ref[0, lo:hi], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, hi-lo) fp32
        b = bias_slice(lo, hi)
        if b is not None:
            s = s + b  # (1, hi-lo) broadcasts over rows
        p = jnp.exp2(jnp.clip(s, _CLAMP_LO, _CLAMP_HI))
        sums.append(jnp.sum(p, axis=-1, keepdims=True))
        pvs.append(
            jax.lax.dot_general(
                p.astype(v_ref.dtype), v_ref[0, lo:hi],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    denom = sums[0]
    acc = pvs[0]
    for sm, pv in zip(sums[1:], pvs[1:]):
        denom = denom + sm
        acc = acc + pv
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _rowblock_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, chunks):
    """One (batch-head, q-block) grid step: full-softmax rows against the
    entire key sequence resident in VMEM. q arrives pre-scaled by
    softmax_scale*log2(e) and the bias pre-scaled by log2(e), so the
    softmax uses exp2 directly (exp lowers to exp2 plus a multiply on the
    VPU, and at Tq x Tk = 21M score elements per (batch, head) the
    transcendental is a first-order cost).

    `chunks` is a static list of (lo, hi) kv column ranges, unrolled
    in-body: chunk i's VPU softmax has no dependency on chunk i+1's MXU
    score matmul, so the two units dual-issue (see module constants for
    measured effect). Range safety uses the static clamp documented in
    _rowblock_compute — no per-row max pass, no cross-chunk rescale."""
    _rowblock_compute(
        q_ref, k_ref, v_ref, o_ref, chunks,
        lambda lo, hi: b_ref[0, :, lo:hi],
    )


def _rowblock_kernel_nobias(q_ref, k_ref, v_ref, o_ref, *, chunks):
    """_rowblock_kernel without the bias operand: when bias is None and
    Tk is already a 128-multiple (both hot shapes: FLUX-1024's 4608 and
    PixArt-1024's 4096) the (1, tk) add is a full VPU pass over every
    score tile for nothing -- measured ~0.75 ms at B2H24T4608D128
    (4.42 ms with the all-zero add vs 3.68 ms without)."""
    _rowblock_compute(
        q_ref, k_ref, v_ref, o_ref, chunks, lambda lo, hi: None
    )


def _transposed_kernel(q_ref, kT_ref, vT_ref, b_ref, o_ref, *, chunks):
    """Transposed sublane-contracted kernel for LANE-PADDED head dims
    (D=72 → d_pad 128, the PixArt shapes).

    The standard layout pays the 72→128 pad twice: once as QK contraction
    depth and once as 56 zero lanes in the PV output. Everything here is
    computed transposed, with the head dim on SUBLANES of every operand
    (72 rounds to 80, not 128):

        Sᵀ = Kᵀᵀ·Q       (tk, bq)  — Kᵀ stored (d8, tk), Q (d8, bq):
                           the contraction runs over d8=80 SUBLANES of
                           both operands (the `subk` variant), 128/80 =
                           1.6× less QK work than the lane-padded depth
        Oᵀ = Vᵀ · Pᵀ     (d, bq)   — Vᵀ stored (d8, tk): lane-aligned
                           contraction (tk), zero pad waste in PV

    Softmax reduces over sublanes (axis 0) with the same static clamp as
    _rowblock_compute; `b_ref` carries the log2-domain key-padding bias
    as a COLUMN (tk, 1) broadcasting over query lanes (None on the
    no-bias fast path via the _nobias twin).

    Measured bound analysis (v5e, scripts/exp_attn_variants.py,
    B8H16T4096D72, quiet host, median of repeats): this kernel 5.36 ms;
    prior transposed-PV (lane-contracted QK) 5.90; padded matmul-only
    floor 8.3; fused-denominator variants (ones-row in Vᵀ so PV emits
    [O; denom]) measured WORSE (5.85) — the +8 PV sublanes cost more
    than the removed VPU sum. Remaining gap to the 3.1 ms unpadded-MXU
    roofline: the d8=80 sublane pad (72→80, ×1.11 on QK) and the
    sublane-layout relayout Mosaic inserts between S (lane-major
    producer) and the PV operand; a two-head 144-sublane packing cannot
    remove it (sublane tiles are 8/16-row multiples, not 72). 5.36 ms ≈
    58% of the unpadded roofline and 1.55× the XLA-visible floor — kept
    as the measured bound."""
    q = q_ref[0]  # (d8, bq) — pre-transposed, pre-scaled by scale·log2e
    sums, pvs = [], []
    for lo, hi in chunks:
        s = jax.lax.dot_general(
            kT_ref[0, :, lo:hi], q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, bq)
        if b_ref is not None:
            s = s + b_ref[0, lo:hi]  # (chunk, 1) broadcasts over lanes
        p = jnp.exp2(jnp.clip(s, _CLAMP_LO, _CLAMP_HI))
        sums.append(jnp.sum(p, axis=0, keepdims=True))  # (1, bq)
        pvs.append(
            jax.lax.dot_general(
                vT_ref[0, :, lo:hi], p.astype(vT_ref.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d8, bq)
        )
    denom = sums[0]
    acc = pvs[0]
    for sm, pv in zip(sums[1:], pvs[1:]):
        denom = denom + sm
        acc = acc + pv
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _transposed_kernel_nobias(q_ref, kT_ref, vT_ref, o_ref, *, chunks):
    _transposed_kernel(q_ref, kT_ref, vT_ref, None, o_ref, chunks=chunks)


def _transposed_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    interpret: bool,
) -> jax.Array:
    """Single-pass path for lane-padded head dims (see _transposed_kernel).
    Same bias contract as the row-block path: None or key-padding
    (B|1, 1, 1, Tk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = _LOG2E / float(np.sqrt(d))

    # head dim lives on sublanes for ALL operands: 16-row tiles for the
    # bf16 operands (72 → 80) — no 128-lane pad anywhere
    d8 = _round_up(d, 16)
    bq = min(_TRANSPOSED_BLOCK_Q, _round_up(tq, 128))
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, 128)

    def pad(x, t_pad, dp):
        t = x.shape[1]
        return jnp.pad(
            x, ((0, 0), (0, t_pad - t), (0, 0), (0, dp - x.shape[-1]))
        )

    qT = (
        pad(q, tq_pad, d8)
        .transpose(0, 2, 3, 1)
        .reshape(b * h, d8, tq_pad)
        * jnp.asarray(scale, q.dtype)
    )
    kT = pad(k, tk_pad, d8).transpose(0, 2, 3, 1).reshape(b * h, d8, tk_pad)
    vT = pad(v, tk_pad, d8).transpose(0, 2, 3, 1).reshape(b * h, d8, tk_pad)

    n_chunks = max(2, -(-tk_pad // _TRANSPOSED_MAX_CHUNK))
    chunk = _round_up(-(-tk_pad // n_chunks), 128)
    chunks = []
    lo = 0
    while lo < tk_pad:
        chunks.append((lo, min(lo + chunk, tk_pad)))
        lo += chunk

    grid = (b * h, tq_pad // bq)
    common = dict(
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b * h, d8, tq_pad), q.dtype),
        out_specs=pl.BlockSpec(
            (1, d8, bq), lambda i, qi: (i, 0, qi), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )
    qkv_specs = [
        pl.BlockSpec(
            (1, d8, bq), lambda i, qi: (i, 0, qi),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, d8, tk_pad), lambda i, qi: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, d8, tk_pad), lambda i, qi: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]

    if bias is None and tk == tk_pad:
        out = pl.pallas_call(
            functools.partial(_transposed_kernel_nobias, chunks=chunks),
            in_specs=qkv_specs,
            **common,
        )(qT, kT, vT)
        return (
            out.reshape(b, h, d8, tq_pad)[:, :, :d, :tq].transpose(0, 3, 1, 2)
        )

    pad_bias_col = jnp.where(
        jnp.arange(tk_pad) < tk, 0.0, _NEG_INF
    ).astype(jnp.float32)[None, :, None]  # (1, tk_pad, 1)
    if bias is None:
        bias_arr = pad_bias_col
        bias_index = lambda i, qi: (0, 0, 0)  # noqa: E731
    elif _flash_bias_ok(bias, b):
        bias_b = jnp.pad(
            jnp.broadcast_to(
                bias.astype(jnp.float32)[:, 0, 0] * _LOG2E, (b, tk)
            ),
            ((0, 0), (0, tk_pad - tk)),
        )[:, :, None]  # (b, tk_pad, 1), log2 domain
        bias_arr = bias_b + pad_bias_col
        bias_index = lambda i, qi: (i // h, 0, 0)  # noqa: E731
    else:
        raise NotImplementedError(
            "transposed path supports only key-padding biases (B, 1, 1, Tk);"
            f" got shape {bias.shape}"
        )
    out = pl.pallas_call(
        functools.partial(_transposed_kernel, chunks=chunks),
        in_specs=qkv_specs
        + [pl.BlockSpec((1, tk_pad, 1), bias_index, memory_space=pltpu.VMEM)],
        **common,
    )(qT, kT, vT, bias_arr)
    return out.reshape(b, h, d8, tq_pad)[:, :, :d, :tq].transpose(0, 3, 1, 2)


def _rowblock_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    interpret: bool,
) -> jax.Array:
    """Single-pass long-sequence path (see _rowblock_kernel). Same bias
    contract as _flash_attention: None or key-padding (B|1, 1, 1, Tk)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, h, d = q.shape
    tk = k.shape[1]
    scale = _LOG2E / float(np.sqrt(d))

    d_pad = _round_up(d, 128)
    # NOTE: the padded-D branch is reachable only from direct bench/test
    # calls (scripts/bench_attention_kernels.py shootouts) — production
    # routing sends every d % 128 shape to _transposed_attention first
    # (_flash_attention above). Kept so the shootout keeps comparing the
    # kernels on equal footing.
    block_q = (
        _ROWBLOCK_BLOCK_Q if d == d_pad else _ROWBLOCK_BLOCK_Q_PADDED_D
    )
    bq = min(block_q, _round_up(tq, 8))
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, 128)

    def pad(x, t_pad):
        t = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, d_pad - d)))

    qp = pad(q, tq_pad).transpose(0, 2, 1, 3).reshape(b * h, tq_pad, d_pad)
    qp = qp * jnp.asarray(scale, qp.dtype)  # prefold scale·log2e into q
    kp = pad(k, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)

    # two kv chunks for MXU/VPU dual-issue (one when the sequence is too
    # short to split on 128-lane boundaries)
    half = _round_up(tk_pad // 2, 128)
    chunks = (
        [(0, half), (half, tk_pad)] if 0 < half < tk_pad else [(0, tk_pad)]
    )
    # qi innermost: k/v index maps are constant in qi, so Pallas keeps
    # them VMEM-resident across all q-blocks of one (batch·head)
    grid = (b * h, tq_pad // bq)
    common = dict(
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        out_specs=pl.BlockSpec(
            (1, bq, d_pad),
            lambda i, qi: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )
    qkv_specs = [
        pl.BlockSpec(
            (1, bq, d_pad), lambda i, qi: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tk_pad, d_pad), lambda i, qi: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, tk_pad, d_pad), lambda i, qi: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ]

    if bias is None and tk == tk_pad:
        # fast path: no bias operand at all — the all-zero (1, tk) add is
        # a full VPU pass over every score tile (~0.75 ms at the FLUX-1024
        # shape), and both hot shapes are already 128-aligned
        out = pl.pallas_call(
            functools.partial(_rowblock_kernel_nobias, chunks=chunks),
            in_specs=qkv_specs,
            **common,
        )(qp, kp, vp)
        out = out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
        return out.transpose(0, 2, 1, 3)

    pad_bias = jnp.where(jnp.arange(tk_pad) < tk, 0.0, _NEG_INF).astype(
        jnp.float32
    )[None, None, :]
    if bias is None:
        bias_arr = pad_bias  # (1, 1, tk_pad)
        bias_index = lambda i, qi: (0, 0, 0)  # noqa: E731
    elif _flash_bias_ok(bias, b):
        bias_b = jnp.pad(
            jnp.broadcast_to(
                bias.astype(jnp.float32)[:, 0] * _LOG2E, (b, 1, tk)
            ),
            ((0, 0), (0, 0), (0, tk_pad - tk)),
        )  # (b, 1, tk_pad), log2 domain
        bias_arr = bias_b + pad_bias
        bias_index = lambda i, qi: (i // h, 0, 0)  # noqa: E731
    else:
        raise NotImplementedError(
            "row-block path supports only key-padding biases (B, 1, 1, Tk);"
            f" got shape {bias.shape}"
        )

    out = pl.pallas_call(
        functools.partial(_rowblock_kernel, chunks=chunks),
        in_specs=qkv_specs
        + [pl.BlockSpec((1, 1, tk_pad), bias_index, memory_space=pltpu.VMEM)],
        **common,
    )(qp, kp, vp, bias_arr)
    out = out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
    return out.transpose(0, 2, 1, 3)


def _flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array],
    interpret: bool,
) -> jax.Array:
    """Long-sequence path: single-pass row-block kernel when the whole
    key sequence fits VMEM (every DiT shape this framework serves),
    KV-blocked online-softmax streaming beyond that. Supports bias=None
    or key-padding bias (B|1, 1, 1, Tk) — the only shapes the DiT towers
    emit; dense (B, H, Tq, Tk) biases raise (the single-tile kernel or
    XLA handles those sizes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, tq, h, d = q.shape
    tk = k.shape[1]
    if _round_up(tk, 128) * _round_up(d, 128) <= _ROWBLOCK_MAX_KV_ELEMS:
        if d % 128:
            # lane-padded head dim: the transposed-PV layout removes the
            # PV half of the pad waste (5.90 vs 8.44 ms at the
            # PixArt-1024 shape)
            return _transposed_attention(q, k, v, bias, interpret)
        return _rowblock_attention(q, k, v, bias, interpret)
    scale = 1.0 / float(np.sqrt(d))

    d_pad = _round_up(d, 128)
    bq = min(_FLASH_BLOCK_Q, _round_up(tq, 8))
    bk = min(_FLASH_BLOCK_K, _round_up(tk, 128))
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, bk)

    def pad(x, t_pad):
        t = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, d_pad - d)))

    qp = pad(q, tq_pad).transpose(0, 2, 1, 3).reshape(b * h, tq_pad, d_pad)
    kp = pad(k, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)

    pad_bias = jnp.where(jnp.arange(tk_pad) < tk, 0.0, _NEG_INF).astype(
        jnp.float32
    )[None, None, :]
    if bias is None:
        bias_arr = pad_bias  # (1, 1, tk_pad)
        bias_index = lambda i, qi, ki: (0, 0, ki)  # noqa: E731
    elif _flash_bias_ok(bias, b):
        # broadcast a (1,1,1,Tk) batch-broadcast bias to the real batch
        # BEFORE the pallas_call: bias_index maps grid step i to batch
        # i // h, and Pallas block reads beyond a size-1 dim are silent
        # garbage, not an error.
        bias_b = jnp.pad(
            jnp.broadcast_to(bias.astype(jnp.float32)[:, 0], (b, 1, tk)),
            ((0, 0), (0, 0), (0, tk_pad - tk)),
        )  # (b, 1, tk_pad)
        bias_arr = bias_b + pad_bias
        bias_index = lambda i, qi, ki: (i // h, 0, ki)  # noqa: E731
    else:
        raise NotImplementedError(
            "flash path supports only key-padding biases (B, 1, 1, Tk); "
            f"got shape {bias.shape}"
        )

    grid = (b * h, tq_pad // bq, tk_pad // bk)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, bq, d_pad),
                lambda i, qi, ki: (i, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, d_pad),
                lambda i, qi, ki: (i, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, bk, d_pad),
                lambda i, qi, ki: (i, ki, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, bk), bias_index, memory_space=pltpu.VMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        out_specs=pl.BlockSpec(
            (1, bq, d_pad),
            lambda i, qi, ki: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),  # running max (lane-replicated)
            pltpu.VMEM((bq, 128), jnp.float32),  # running normalizer
            pltpu.VMEM((bq, d_pad), jnp.float32),  # unnormalized accumulator
        ],
        interpret=interpret,
    )(qp, kp, vp, bias_arr)
    out = out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
    return out.transpose(0, 2, 1, 3)


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

    score_bytes = tq_pad * tk_pad * 4
    if score_bytes > _SINGLE_TILE_SCORE_BYTES:
        if _flash_bias_ok(bias, b):
            return _flash_attention(q, k, v, bias, interpret)
        # dense (B,H,Tq,Tk) bias at a size the single-tile kernel cannot
        # hold in VMEM: no DiT tower emits this shape — delegate to XLA
        # rather than fail the pallas_call compile
        return jax.nn.dot_product_attention(q, k, v, bias=bias)
    if (
        d % 128
        and score_bytes >= _TRANSPOSED_MIN_SCORE_BYTES
        and _flash_bias_ok(bias, b)
    ):
        # single-tile-sized but lane-padded head dim (the PixArt-512-class
        # shape B64H16T1024D72 — NOT PixArt-256, whose 256-token self-
        # attention has a 256 KB score tile below this floor and stays on
        # the single-tile/XLA route): the transposed-PV kernel beats the
        # single-tile kernel 5.29 vs 8.38 ms — same pad-waste argument as
        # the long-sequence route above. Below the score floor shapes are
        # cheap either way and stay on the (pad-tolerant) single tile.
        return _transposed_attention(q, k, v, bias, interpret)

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

"""Kernel-variant experiments for the long-sequence attention regime.

Research harness (run on the real TPU) that decomposes the row-block
kernel's time at the two headline shapes to find what stands between the
measured ~4.5 ms and the ~2.7 ms MXU roofline at B2H24T4608D128:

* matmul_only — (q·kᵀ)·v with no softmax: the MXU + DMA floor.
* nomax       — exp2 softmax without the running-max subtraction (safe
                whenever logits are bounded, e.g. QK-normed FLUX): drops
                one full VPU pass (max) + one subtract pass.
* chunk2      — kv processed in two in-kernel chunks so chunk 1's VPU
                softmax can dual-issue with chunk 2's MXU matmul.
* rowblock    — the shipping single-pass kernel (baseline).

Winners get promoted into ecad_tpu/ops/attention.py.
"""

from __future__ import annotations

import functools
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

_LOG2E = 1.4426950408889634

SHAPES = {
    "flux1024": dict(b=2, h=24, t=4608, d=128),
    "pixart1024": dict(b=8, h=16, t=4096, d=72),
    # a PixArt-512-class D72 shape (T=1024 tokens; batch 32 × CFG 2).
    # NOTE the actual 256² model has only 256 latent tokens (sample 32,
    # patch 2) whose 256 KB score tile stays below the XLA-routing floor —
    # the headline bench is deliberately NOT affected by these kernels;
    # this row covers the mid-resolution regime between 256² and 1024²
    "pixart512_class_self": dict(b=64, h=16, t=1024, d=72),
}


def _round_up(x, m):
    return (x + m - 1) // m * m


def _prep(q, k, v, bq, prescale):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, 128)

    def pad(x, t_pad):
        t = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, d_pad - d)))

    qp = pad(q, tq_pad).transpose(0, 2, 1, 3).reshape(b * h, tq_pad, d_pad)
    if prescale:
        qp = qp * jnp.asarray(_LOG2E / np.sqrt(d), qp.dtype)
    kp = pad(k, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)
    vp = pad(v, tk_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)
    return qp, kp, vp, (b, h, tq, tk, d, d_pad, tq_pad, tk_pad)


def _call(kernel, qp, kp, vp, dims, bq, n_k_chunks=1):
    b, h, tq, tk, d, d_pad, tq_pad, tk_pad = dims
    grid = (b * h, tq_pad // bq)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
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
        ],
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), qp.dtype),
        out_specs=pl.BlockSpec(
            (1, bq, d_pad), lambda i, qi: (i, qi, 0),
            memory_space=pltpu.VMEM,
        ),
    )(qp, kp, vp)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d].transpose(0, 2, 1, 3)


def k_matmul_only(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pv = jax.lax.dot_general(
        s.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = pv.astype(o_ref.dtype)


def k_nomax(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp2(s)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / denom).astype(o_ref.dtype)


def k_rowblock(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / denom).astype(o_ref.dtype)


def k_chunk2(q_ref, k_ref, v_ref, o_ref):
    """Two kv chunks unrolled in-body: chunk 0's softmax (VPU) has no
    dependency on chunk 1's score matmul (MXU), so the scheduler can
    dual-issue them."""
    tk_pad = k_ref.shape[1]
    half = tk_pad // 2
    q = q_ref[0]
    s0 = jax.lax.dot_general(
        q, k_ref[0, :half], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m0 = jnp.max(s0, axis=-1, keepdims=True)
    p0 = jnp.exp2(s0 - m0)
    s1 = jax.lax.dot_general(
        q, k_ref[0, half:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m1 = jnp.max(s1, axis=-1, keepdims=True)
    p1 = jnp.exp2(s1 - m1)
    m = jnp.maximum(m0, m1)
    a0 = jnp.exp2(m0 - m)
    a1 = jnp.exp2(m1 - m)
    denom = a0 * jnp.sum(p0, axis=-1, keepdims=True) + a1 * jnp.sum(
        p1, axis=-1, keepdims=True
    )
    pv0 = jax.lax.dot_general(
        p0.astype(v_ref.dtype), v_ref[0, :half], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    pv1 = jax.lax.dot_general(
        p1.astype(v_ref.dtype), v_ref[0, half:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = ((a0 * pv0 + a1 * pv1) / denom).astype(o_ref.dtype)


VARIANTS = {
    "matmul_only": (k_matmul_only, False),
    "nomax": (k_nomax, True),
    "rowblock": (k_rowblock, True),
    "chunk2": (k_chunk2, True),
}

_CLAMP_LO, _CLAMP_HI = -100.0, 80.0


def k_transposed(q_ref, k_ref, vT_ref, o_ref, *, chunks):
    """Transposed-PV variant for lane-padded head dims (D=72 → 128).

    The standard layout pays the 72→128 pad TWICE: QK contracts over
    d_pad (intrinsic — the contraction really is 72-long) AND PV writes a
    128-lane output of which 56 lanes are zeros (avoidable). This kernel
    computes everything transposed:

      Sᵀ = K · Qᵀ              (tk, bq)  — same padded-d contraction cost
      Oᵀ = Vᵀ · Pᵀ             (72, bq)  — Vᵀ stored (72, tk): sublane dim
                                 72 is an exact 8-multiple, contraction tk
                                 is lane-aligned → ZERO pad waste, 1.78×
                                 less PV work than the padded layout.

    Softmax reduces over sublanes (axis 0) with the same static clamp as
    the shipping kernel. Expected matmul floor: QK unchanged + PV×0.5625
    ≈ 0.78 of the padded floor (8.4 → ~6.6 ms at B8H16T4096D72)."""
    q = q_ref[0]  # (d_pad, bq) — pre-transposed, pre-scaled
    sums, pvs = [], []
    for lo, hi in chunks:
        s = jax.lax.dot_general(
            k_ref[0, lo:hi], q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, bq)
        p = jnp.exp2(jnp.clip(s, _CLAMP_LO, _CLAMP_HI))
        sums.append(jnp.sum(p, axis=0, keepdims=True))  # (1, bq)
        pvs.append(
            jax.lax.dot_general(
                vT_ref[0, :, lo:hi], p.astype(vT_ref.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (d, bq)
        )
    denom = sums[0]
    acc = pvs[0]
    for sm, pv in zip(sums[1:], pvs[1:]):
        denom = denom + sm
        acc = acc + pv
    o_ref[0] = (acc / denom).astype(o_ref.dtype)


def _call_transposed(q, k, v, bq, n_chunks=2):
    """Wrapper for k_transposed: q → (bh, d_pad, tq) transposed+scaled,
    k standard (bh, tk_pad, d_pad), v → (bh, d, tk_pad) transposed and
    UNPADDED in d, output (bh, d, tq_pad) transposed back at the end."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, 128)

    def pad(x, t_pad, dp):
        t = x.shape[1]
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0), (0, dp - x.shape[-1])))

    scale = _LOG2E / np.sqrt(d)
    qT = (
        pad(q, tq_pad, d_pad).transpose(0, 2, 3, 1).reshape(b * h, d_pad, tq_pad)
        * jnp.asarray(scale, q.dtype)
    )
    kp = pad(k, tk_pad, d_pad).transpose(0, 2, 1, 3).reshape(b * h, tk_pad, d_pad)
    vT = pad(v, tk_pad, d).transpose(0, 2, 3, 1).reshape(b * h, d, tk_pad)

    chunk = _round_up(tk_pad // n_chunks, 128)
    chunks = []
    lo = 0
    while lo < tk_pad:
        chunks.append((lo, min(lo + chunk, tk_pad)))
        lo += chunk

    grid = (b * h, tq_pad // bq)
    out = pl.pallas_call(
        functools.partial(k_transposed, chunks=chunks),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, d_pad, bq), lambda i, qi: (i, 0, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tk_pad, d_pad), lambda i, qi: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, d, tk_pad), lambda i, qi: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=jax.ShapeDtypeStruct((b * h, d, tq_pad), q.dtype),
        out_specs=pl.BlockSpec(
            (1, d, bq), lambda i, qi: (i, 0, qi),
            memory_space=pltpu.VMEM,
        ),
        interpret=bool(os.environ.get("ECAD_EXP_INTERPRET")),
    )(qT, kp, vT)
    return out.reshape(b, h, d, tq_pad)[:, :, :, :tq].transpose(0, 3, 1, 2)


def k_transposed_fd(q_ref, k_ref, vTa_ref, o_ref, *, chunks, d):
    """Transposed-PV with the softmax DENOMINATOR FUSED into the PV matmul.

    The shipping transposed kernel's VPU does three passes per score
    element: clip, exp2, and a cross-sublane sum for the denominator. At
    B8H16T4096D72 that is 2.1e9 score elements — the sum pass alone is
    ~1/3 of the VPU time that overlaps (imperfectly) with the MXU. Here
    Vᵀ is augmented with a row of ONES (then sublane-padded): the PV
    matmul computes [O; denom] in one shot on the MXU, so the VPU does
    only clip+exp2+cast. Cost: the PV output grows d→d_aug sublanes
    (72→80, +11% of the SMALLER matmul) for the removal of a full VPU
    reduction pass over every score element."""
    q = q_ref[0]  # (d_pad, bq), pre-scaled
    acc = None
    for lo, hi in chunks:
        s = jax.lax.dot_general(
            k_ref[0, lo:hi], q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, bq)
        p = jnp.exp2(jnp.clip(s, _CLAMP_LO, _CLAMP_HI))
        pv = jax.lax.dot_general(
            vTa_ref[0, :, lo:hi], p.astype(vTa_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d_aug, bq): rows [:d] = O numerator, row d = denominator
        acc = pv if acc is None else acc + pv
    o_ref[0] = (acc[:d] / acc[d : d + 1]).astype(o_ref.dtype)


def k_transposed_subk(q_ref, kT_ref, vT_ref, o_ref, *, chunks, d8):
    """Transposed-PV with the QK contraction over SUBLANES of both
    operands: Kᵀ stored (d8, tk) like Vᵀ, q stored (d8, bq), and
    Sᵀ = dot(Kᵀ, q) contracting dim 0 of both. If Mosaic maps a
    sublane-sublane contraction onto the MXU without relayout, the QK
    half contracts 80 instead of 128 padded lanes (1.6× less). If the
    systolic array's contraction depth is hardwired at 128 this measures
    the same (or worse, from the transpose) — that is the experiment."""
    q = q_ref[0]  # (d8, bq)
    sums, pvs = [], []
    for lo, hi in chunks:
        s = jax.lax.dot_general(
            kT_ref[0, :, lo:hi], q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, bq)
        p = jnp.exp2(jnp.clip(s, _CLAMP_LO, _CLAMP_HI))
        sums.append(jnp.sum(p, axis=0, keepdims=True))
        pvs.append(
            jax.lax.dot_general(
                vT_ref[0, :, lo:hi], p.astype(vT_ref.dtype),
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


def k_transposed_subk_fd(q_ref, kT_ref, vTa_ref, o_ref, *, chunks, d):
    """k_transposed_subk + fused denominator (the two optimizations
    compose)."""
    q = q_ref[0]
    acc = None
    for lo, hi in chunks:
        s = jax.lax.dot_general(
            kT_ref[0, :, lo:hi], q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp2(jnp.clip(s, _CLAMP_LO, _CLAMP_HI))
        pv = jax.lax.dot_general(
            vTa_ref[0, :, lo:hi], p.astype(vTa_ref.dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = pv if acc is None else acc + pv
    o_ref[0] = (acc[:d] / acc[d : d + 1]).astype(o_ref.dtype)


def _call_transposed_v2(q, k, v, bq, variant, n_chunks=2):
    """Wrapper for the fd/subk transposed variants.

    Layouts: q → (bh, d_q, tq) where d_q is d_pad (128) for lane-
    contracted QK or d8 (16-sublane-rounded) for subk; K standard
    (bh, tk_pad, d_pad) or transposed (bh, d8, tk_pad) for subk;
    Vᵀ (bh, d, tk_pad), augmented with a ones row then 16-rounded for
    the fused-denominator variants."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    d_pad = _round_up(d, 128)
    d8 = _round_up(d, 16)  # bf16 sublane tile
    tq_pad = _round_up(tq, bq)
    tk_pad = _round_up(tk, 128)
    subk = "subk" in variant
    fd = variant.endswith("fd")
    d_q = d8 if subk else d_pad

    def pad(x, t_pad, dp):
        t = x.shape[1]
        return jnp.pad(
            x, ((0, 0), (0, t_pad - t), (0, 0), (0, dp - x.shape[-1]))
        )

    scale = _LOG2E / np.sqrt(d)
    qT = (
        pad(q, tq_pad, d_q).transpose(0, 2, 3, 1).reshape(b * h, d_q, tq_pad)
        * jnp.asarray(scale, q.dtype)
    )
    if subk:
        kx = pad(k, tk_pad, d8).transpose(0, 2, 3, 1).reshape(
            b * h, d8, tk_pad
        )
        k_spec = pl.BlockSpec(
            (1, d8, tk_pad), lambda i, qi: (i, 0, 0), memory_space=pltpu.VMEM
        )
    else:
        kx = pad(k, tk_pad, d_pad).transpose(0, 2, 1, 3).reshape(
            b * h, tk_pad, d_pad
        )
        k_spec = pl.BlockSpec(
            (1, tk_pad, d_pad), lambda i, qi: (i, 0, 0),
            memory_space=pltpu.VMEM,
        )
    if fd:
        d_aug = _round_up(d + 1, 16)  # 72 → 80: ones row at index d
        vT = pad(v, tk_pad, d).transpose(0, 2, 3, 1).reshape(b * h, d, tk_pad)
        ones = jnp.zeros((b * h, d_aug - d, tk_pad), vT.dtype).at[:, 0].set(
            jnp.where(jnp.arange(tk_pad) < tk, 1.0, 0.0).astype(vT.dtype)
        )
        vT = jnp.concatenate([vT, ones], axis=1)
        d_v = d_aug
    else:
        vT = pad(v, tk_pad, d).transpose(0, 2, 3, 1).reshape(b * h, d, tk_pad)
        d_v = d

    chunk = _round_up(tk_pad // n_chunks, 128)
    chunks = []
    lo = 0
    while lo < tk_pad:
        chunks.append((lo, min(lo + chunk, tk_pad)))
        lo += chunk

    kern = {
        "transposed_fd": functools.partial(k_transposed_fd, chunks=chunks, d=d),
        "transposed_subk": functools.partial(
            k_transposed_subk, chunks=chunks, d8=d8
        ),
        "transposed_subk_fd": functools.partial(
            k_transposed_subk_fd, chunks=chunks, d=d
        ),
    }[variant]
    grid = (b * h, tq_pad // bq)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, d_q, bq), lambda i, qi: (i, 0, qi),
                memory_space=pltpu.VMEM,
            ),
            k_spec,
            pl.BlockSpec(
                (1, d_v, tk_pad), lambda i, qi: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=jax.ShapeDtypeStruct((b * h, d, tq_pad), q.dtype),
        out_specs=pl.BlockSpec(
            (1, d, bq), lambda i, qi: (i, 0, qi), memory_space=pltpu.VMEM
        ),
        interpret=bool(os.environ.get("ECAD_EXP_INTERPRET")),
    )(qT, kx, vT)
    return out.reshape(b, h, d, tq_pad)[:, :, :, :tq].transpose(0, 3, 1, 2)


TRANSPOSED_V2 = ("transposed_fd", "transposed_subk", "transposed_subk_fd")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    only = [a.split("=")[1] for a in sys.argv[1:] if a.startswith("--shape=")]
    n_chunks_list = [
        int(a.split("=")[1]) for a in sys.argv[1:] if a.startswith("--chunks=")
    ] or [2]
    bqs = [int(x) for x in args] or [256, 512]
    for name, s in SHAPES.items():
        if only and name not in only:
            continue
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        mk = lambda key: (  # noqa: E731
            jax.random.normal(key, (s["b"], s["t"], s["h"], s["d"])).astype(
                jnp.bfloat16
            )
        )
        q, k, v = mk(keys[0]), mk(keys[1]), mk(keys[2])
        # error reference on a 2-head slice: the full (B,H,T,T) logits at
        # the PixArt shape are 8.6 GB — the full-shape XLA call OOMs a
        # 16 GB chip next to the benchmark buffers
        ref = jax.nn.dot_product_attention(
            q[:, :, :2], k[:, :, :2], v[:, :, :2]
        )
        bench.sync(ref)
        for bq in bqs:
            if s["d"] % 128:  # transposed-PV only pays off for padded D
                for variant in TRANSPOSED_V2:
                    for nc in n_chunks_list:
                        fn2 = jax.jit(
                            functools.partial(
                                lambda q, k, v, bq=bq, variant=variant, nc=nc:
                                _call_transposed_v2(
                                    q, k, v, bq, variant, n_chunks=nc
                                )
                            )
                        )
                        out2 = fn2(q, k, v)
                        e2 = float(
                            jnp.abs(
                                out2[:, :, :2].astype(jnp.float32)
                                - ref.astype(jnp.float32)
                            ).max()
                        )
                        ms2 = bench.time_fn(
                            lambda: fn2(q, k, v), sync_out=bench.sync,
                            warmup=2, samples=8,
                        )
                        suffix = f"_c{nc}" if nc != 2 else ""
                        print(
                            json.dumps(
                                {
                                    "metric": (
                                        f"exp_{name}_{variant}_bq{bq}{suffix}"
                                    ),
                                    "value": round(ms2 * 1e3, 3),
                                    "unit": "ms",
                                    "detail": {"max_abs_err_vs_xla_bf16": e2},
                                }
                            ),
                            flush=True,
                        )
                fnT = jax.jit(
                    functools.partial(lambda q, k, v, bq=bq: _call_transposed(
                        q, k, v, bq
                    ))
                )
                outT = fnT(q, k, v)
                eT = float(
                    jnp.abs(
                        outT[:, :, :2].astype(jnp.float32)
                        - ref.astype(jnp.float32)
                    ).max()
                )
                msT = bench.time_fn(
                    lambda: fnT(q, k, v), sync_out=bench.sync,
                    warmup=2, samples=8,
                )
                print(
                    json.dumps(
                        {
                            "metric": f"exp_{name}_transposed_bq{bq}",
                            "value": round(msT * 1e3, 3),
                            "unit": "ms",
                            "detail": {"max_abs_err_vs_xla_bf16": eT},
                        }
                    ),
                    flush=True,
                )
            for label, (kernel, prescale) in VARIANTS.items():
                fn = jax.jit(
                    functools.partial(
                        lambda q, k, v, kernel=kernel, prescale=prescale,
                        bq=bq: _call(
                            kernel, *_prep(q, k, v, bq, prescale), bq
                        )
                    )
                )
                out = fn(q, k, v)
                e = (
                    float(
                        jnp.abs(
                            out[:, :, :2].astype(jnp.float32)
                            - ref.astype(jnp.float32)
                        ).max()
                    )
                    if label != "matmul_only"
                    else None
                )
                ms = bench.time_fn(
                    lambda: fn(q, k, v), sync_out=bench.sync,
                    warmup=2, samples=8,
                )
                print(
                    json.dumps(
                        {
                            "metric": f"exp_{name}_{label}_bq{bq}",
                            "value": round(ms * 1e3, 3),
                            "unit": "ms",
                            "detail": {"max_abs_err_vs_xla_bf16": e},
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()

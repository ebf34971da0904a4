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


def static_int8_dot_general(amax: float):
    """`int8_dot_general` with a STATIC per-tensor activation scale.

    `amax` is a calibrated trace-time CONSTANT (max-abs of this site's
    activations over a few denoise steps), so the per-token max-abs
    reduction disappears from the program. That reduction is what makes
    dynamic quantization expensive in the bandwidth-bound 1024² regime:
    it forces the producer's bf16 activation to materialize in HBM and be
    read back, where the static path lets XLA fuse round/clip/cast into
    the producer epilogue and write int8 directly (half the bytes of the
    bf16 it replaces). Out-of-calibration activations saturate at ±127 —
    the standard static-quantization contract (calibrate on
    representative steps; see calibrate_dense_amax).

    Weights keep per-output-channel dynamic scales (CSE'd by XLA across
    the unrolled steps, same as int8_dot_general)."""
    inv_scale = 127.0 / max(float(amax), _EPS)
    scale = 1.0 / inv_scale

    def dg(
        lhs: jax.Array,
        rhs: jax.Array,
        dimension_numbers: Any,
        precision: Any = None,
        preferred_element_type: Optional[Any] = None,
    ) -> jax.Array:
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
        ql = jnp.clip(
            jnp.round(lhs.astype(jnp.float32) * inv_scale), -127.0, 127.0
        ).astype(jnp.int8)
        qr, sr = quantize_int8(rhs, axis=0)
        acc = lax.dot_general(
            ql, qr, dimension_numbers, preferred_element_type=jnp.int32
        )
        sr_b = sr.reshape((1,) * (lhs.ndim - 1) + sr.shape[1:])
        return (acc.astype(jnp.float32) * scale * sr_b).astype(out_dtype)

    return dg


def maybe_quant_dot_general(
    quant: Optional[str],
    site_key: Optional[str] = None,
    act_scales: Optional[Any] = None,
):
    """The `dot_general` override for a quant mode name: None (exact
    default) for bf16 serving, `int8_dot_general` for "int8". "int8_w"
    and "int8_w_static" (weight-STORAGE quantization, the latter with
    calibrated static activation scales via `Int8Dense.act_amax`) are
    handled structurally — the model swaps `nn.Dense` for `Int8Dense` —
    so they map to None here.

    "int8_static": per-site static activation scales. `act_scales` is a
    mapping (or tuple of pairs — configs keep it hashable) from module
    path (e.g. "block_3/attn1/to_q") to calibrated max-abs; `site_key` is
    this Dense's path. A site missing from the calibration table falls
    back to the dynamic per-token path — safe, just slower."""
    if quant is None or quant in ("none", "int8_w", "int8_w_static"):
        return None
    if quant == "int8":
        return int8_dot_general
    if quant == "int8_static":
        table = dict(act_scales) if act_scales is not None else {}
        amax = table.get(site_key)
        if amax is None:
            return int8_dot_general
        return static_int8_dot_general(amax)
    raise ValueError(
        f"unknown quant mode {quant!r} "
        "(expected None|'int8'|'int8_static'|'int8_w'|'int8_w_static')"
    )


def calibrate_dense_amax(model, variables, *args, **kwargs) -> dict:
    """Record every nn.Dense input's max-abs during one `model.apply`,
    keyed by module path ("block_3/attn1/to_q") — the calibration table
    for quant="int8_static".

    Jit-safe: the interceptor records via `sow` into a mutable
    "quant_stats" collection (a plain python-dict side channel would leak
    tracers out of flax's lifted inner scopes), so one jitted forward per
    calibration timestep suffices — cheap even through the remote-TPU
    tunnel."""
    import flax.linen as nn_

    def interceptor(next_fn, iargs, ikwargs, context):
        # Int8Dense too: the 12B int8_w model is the only FLUX variant
        # that fits one chip, so its static-scale calibration must run
        # ON the weight-quantized model (input activations at each site
        # are the statistic being calibrated either way)
        if context.method_name == "__call__" and isinstance(
            context.module, (nn_.Dense, Int8Dense)
        ):
            a = jnp.max(jnp.abs(iargs[0].astype(jnp.float32)))
            context.module.sow(
                "quant_stats", "amax", a,
                reduce_fn=jnp.maximum,
                init_fn=lambda: jnp.array(0.0, jnp.float32),
            )
        return next_fn(*iargs, **ikwargs)

    # close over *args instead of passing them through jit: static
    # schedule masks (tuples of python bools) must STAY static — as jit
    # arguments they'd become tracers and flip the blocks into their
    # lax.cond path, where the interceptor's sow escapes the cond's inner
    # trace (UnexpectedTracerError).
    def run(variables):
        with nn_.intercept_methods(interceptor):
            _, muts = model.apply(
                variables, *args, mutable=["quant_stats"], **kwargs
            )
        return muts["quant_stats"]

    tree = jax.jit(run)(variables)

    flat: dict[str, float] = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == "amax":
                    flat["/".join(path)] = float(jnp.asarray(v).max())
                else:
                    walk(v, path + (k,))

    walk(jax.tree.map(lambda x: x, tree), ())
    return flat


def merge_amax(*tables: dict) -> dict:
    """Fold per-timestep calibration tables with elementwise max."""
    merged: dict = {}
    for t in tables:
        for k, v in t.items():
            merged[k] = max(merged.get(k, 0.0), float(v))
    return merged


# ---------------------------------------------------------------------------
# int8_w: weight-STORAGE quantization
# ---------------------------------------------------------------------------
#
# "int8" above requantizes bf16 master weights on the fly — HBM residency
# is unchanged. "int8_w" stores the kernel itself as int8 (1 byte/param)
# plus a per-output-channel fp32 scale, which HALVES weight HBM vs bf16.
# That is the mode that fits the true full-width 12B FLUX.1-dev on a
# single 16 GiB v5e chip (23.8 GiB bf16 → ~11.2 GiB int8; the reference
# needs a 48 GB A6000 for the same model,
# flux_transformer_2d_edited.py:92-98). Activations are dynamically
# quantized per token at the same sites, so the matmul still runs on the
# int8 MXU path.


import flax.linen as _nn


class Int8Dense(_nn.Module):
    """Weight-storage int8 Dense (W8A8 on the int8 MXU path).

    Params: `kernel` int8 (in, out) — 1 byte/param in HBM — plus
    `scale` fp32 (out,) per-output-channel dequant scale, and the
    usual fp32 `bias`. Apply quantizes the activation per token
    (max-abs over the contraction axis), contracts int8×int8→int32,
    and dequantizes with (token_scale ⊗ channel_scale) in fp32.

    `axes` are the logical-partitioning names for the kernel, e.g.
    (EMBED, MLP) — the same metadata `nn.Dense` call sites attach via
    `with_part`, so tp/dp sharding derivation is unchanged.

    Random `.init`: each param's initializer draws a normal(0.02)
    float matrix and quantizes it, but flax folds the param NAME into
    the RNG, so kernel and scale come from different draws — not a
    consistent (q, scale) pair of one float matrix, just statistically
    in-family, which is all random-weight benching needs. Real-weight
    loading gets exact consistency via `quantize_params_tree` after
    conversion.
    """

    features: int
    axes: tuple
    use_bias: bool = True
    dtype: Any = jnp.bfloat16
    init_scale: float = 0.02
    # Calibrated STATIC activation max-abs ("int8_w_static"): when set,
    # the per-token max-abs reduction disappears and the activation
    # quantizes against this trace-time constant — the same bandwidth
    # win as static_int8_dot_general, composed with int8 weight storage
    # (the combination the 12B single-chip rows serve with).
    act_amax: Optional[float] = None

    @_nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        draw = _nn.initializers.normal(self.init_scale)

        def kernel_init(key, shape, dtype=jnp.int8):
            w = draw(key, shape, jnp.float32)
            return quantize_int8(w, axis=0)[0]

        def scale_init(key, shape, dtype=jnp.float32):
            w = draw(key, (in_features, self.features), jnp.float32)
            return quantize_int8(w, axis=0)[1].reshape(-1)

        kernel = self.param(
            "kernel",
            _nn.with_logical_partitioning(kernel_init, self.axes),
            (in_features, self.features),
        )
        scale = self.param(
            "scale",
            _nn.with_logical_partitioning(scale_init, (self.axes[-1],)),
            (self.features,),
        )
        if self.act_amax is None:
            xq, xs = quantize_int8(x, axis=-1)
        else:
            inv = 127.0 / max(float(self.act_amax), _EPS)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * inv), -127.0, 127.0
            ).astype(jnp.int8)
            xs = jnp.float32(1.0 / inv)
        dn = (((x.ndim - 1,), (0,)), ((), ()))
        acc = lax.dot_general(
            xq, kernel, dn, preferred_element_type=jnp.int32
        )
        y = acc.astype(jnp.float32) * xs * scale.astype(jnp.float32)
        y = y.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                _nn.with_logical_partitioning(
                    _nn.initializers.zeros_init(), (self.axes[-1],)
                ),
                (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(self.dtype)
        return y


def _is_boxed(x: Any) -> bool:
    return isinstance(x, _nn.meta.AxisMetadata)


def _unbox(x: Any) -> Any:
    return x.unbox() if _is_boxed(x) else x


def _rebox(ref_leaf: Any, value: Any) -> Any:
    return ref_leaf.replace_boxed(value) if _is_boxed(ref_leaf) else value


def quantize_params_tree(params: Any, ref: Any) -> Any:
    """Convert a float param tree into the int8_w storage layout.

    `ref` is the target structure — typically
    `jax.eval_shape(model.init, ...)["params"]` of the `quant="int8_w"`
    model. Wherever `ref` holds an int8 `kernel` with a sibling `scale`,
    the source float kernel is symmetrically quantized per output channel;
    every other leaf is passed through unchanged. Partitioning boxes on
    `ref` are preserved (values are reboxed with the ref metadata).

    Apply AFTER `serving_cast`: the fp32 scales produced here should stay
    fp32 (a later serving_cast would squeeze them to bf16 and cost ~0.3%
    extra dequant error).
    """

    def rec(src: Any, r: Any) -> Any:
        if isinstance(r, dict) or hasattr(r, "items"):
            keys = set(r.keys())
            if "kernel" in keys and "scale" in keys:
                ref_kernel = _unbox(r["kernel"])
                if ref_kernel.dtype == jnp.int8:
                    w = jnp.asarray(_unbox(src["kernel"]), jnp.float32)
                    q, s = quantize_int8(w, axis=0)
                    out = {
                        "kernel": _rebox(r["kernel"], q),
                        "scale": _rebox(r["scale"], s.reshape(-1)),
                    }
                    if "bias" in keys:
                        out["bias"] = _rebox(
                            r["bias"], _unbox(src["bias"])
                        )
                    return out
            return {k: rec(src[k], r[k]) for k in r.keys()}
        return _rebox(r, _unbox(src))

    return rec(params, ref)

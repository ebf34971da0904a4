"""Shared Flax building blocks for the diffusion transformers.

These mirror the semantics of the diffusers modules the reference builds on
(sinusoidal timestep embeddings, TimestepEmbedding MLPs, PixArt caption
projection, multi-head attention) but are written TPU-first: NHWC/token-major
layouts, bfloat16 activations with fp32 norm/softmax accumulation, and
Megatron-style logical partitioning annotations so the same modules run
single-chip or tensor-parallel over a mesh axis ("tp") without code changes.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Logical axis names used throughout; mapped to mesh axes by
# LOGICAL_AXIS_RULES (re-exported by ecad_tpu.parallel.mesh).
EMBED = "embed"
MLP = "mlp"
HEADS = "heads"
KV = "kv"
BATCH = "batch"
SEQ = "seq"  # image/joint token axis; sharded only on an sp mesh

# logical axis → mesh axis. SEQ→"sp" resolves to None on the dp×tp
# meshes (no "sp" axis present), so sequence-parallel annotations are
# free until an sp mesh is created (parallel.create_mesh(sp=...)).
LOGICAL_AXIS_RULES: tuple[tuple[str, str | None], ...] = (
    (EMBED, None),
    (MLP, "tp"),
    (HEADS, "tp"),
    (KV, None),
    (BATCH, "dp"),
    (SEQ, "sp"),
)


def with_part(init: Callable, names: tuple[str | None, ...]):
    return nn.with_logical_partitioning(init, names)


def current_mesh():
    """The Mesh installed by a `with mesh:` context, or None."""
    import warnings

    try:
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            from jax.interpreters import pxla

            m = pxla.thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def logical_constraint(x: jax.Array, axes: tuple[Optional[str], ...]):
    """Constrain an activation/cache array's sharding, expressed in logical
    axes (LOGICAL_AXIS_RULES). Identity outside a Mesh context, so models
    run unchanged single-device. Used to keep the ECAD cache pytrees —
    which lax.cond population programs hold live for EVERY component —
    distributed over dp (batch) and tp (the MLP-width FLUX proj_mlp cache)
    instead of replicated; see docs/flux_hbm_accounting.md."""
    mesh = current_mesh()
    if mesh is None:
        return x
    rules = dict(LOGICAL_AXIS_RULES)
    spec = jax.sharding.PartitionSpec(
        *[
            rules.get(a) if rules.get(a) in mesh.axis_names else None
            for a in axes
        ]
    )
    return jax.lax.with_sharding_constraint(x, spec)


def sinusoidal_embedding(
    timesteps: jax.Array,
    dim: int = 256,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jax.Array:
    """diffusers get_timestep_embedding equivalent (fp32)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    return jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], -1)


class TimestepEmbedding(nn.Module):
    """linear(in→d) → silu → linear(d→d), matching diffusers TimestepEmbedding."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (None, EMBED)),
            name="linear_1",
        )(x)
        x = nn.silu(x)
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, None)),
            name="linear_2",
        )(x)
        return x


class TextProjection(nn.Module):
    """PixArtAlphaTextProjection: linear → gelu(tanh) → linear."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (None, EMBED)),
            name="linear_1",
        )(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, None)),
            name="linear_2",
        )(x)
        return x


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """LayerNorm without learnable affine, computed in fp32 (PixArt blocks use
    elementwise_affine=False; modulation is applied by adaln outside)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def rms_norm(x: jax.Array, scale: jax.Array, eps: float = 1e-6) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * scale


_ATTENTION_BACKEND = "xla"  # "xla" | "pallas"


def serving_cast(params, dtype) -> Any:
    """Cast float params to the model's compute dtype for serving.

    flax linen converts params to the module `dtype` at every apply, so
    fp32 masters buy no precision at inference — they just double weight
    HBM residency and per-step read traffic and add convert temps (the
    reference likewise serves reduced precision: fp16 blocks forced in
    pixart_transformer_2d_edited.py:98, bf16 in
    flux_transformer_2d_edited.py:92-98). No-op for non-float leaves and
    when dtype is float32 (the fp32 tiny-config parity tests).

    int8_w exception: an fp32 `scale` sitting next to an int8 `kernel`
    is the dequant scale of a weight-storage-quantized Dense
    (ops/quant.py Int8Dense) — it stays fp32. Squeezing it to bf16 adds
    ~0.3% dequant error for a negligible HBM saving (one fp32 per
    OUTPUT CHANNEL vs int8 per weight)."""
    import jax.numpy as _jnp

    if dtype == _jnp.float32:
        return params

    from collections.abc import Mapping

    def leaf_dtype(x):
        if isinstance(x, nn.meta.AxisMetadata):
            x = x.unbox()
        return getattr(x, "dtype", None)

    def rec(node):
        if isinstance(node, Mapping):
            int8_w = leaf_dtype(node.get("kernel")) == _jnp.int8
            return {
                k: (v if (int8_w and k == "scale") else rec(v))
                for k, v in node.items()
            }
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and x.dtype == _jnp.float32
            else x,
            node,
        )

    return rec(params)


def random_serving_params(
    shape_tree, seed: int = 0, dtype=None, scale: float = 0.02
) -> Any:
    """Fill a parameter tree with random values *directly in the serving
    dtype on device* — never materializing fp32 masters.

    `shape_tree` is a `jax.eval_shape` result (ShapeDtypeStructs) of a
    model's init; float leaves are filled with `N(0, scale)` in `dtype`
    (default bfloat16), non-float leaves with zeros of their own dtype.
    Rationale: `model.init` materializes fp32 masters on device and the
    tunneled TPU backend does not reliably free them before a subsequent
    cast, so a ~12 GB fp32 tree OOMs a 16 GB chip even when the bf16 copy
    would fit. One filler program is compiled per distinct leaf shape
    (~20 for FLUX). Benchmarks and schedule-search evals are wall-clock
    measurements on random weights, so values are irrelevant; real
    serving uses models/weights.py converters which load bf16 directly.
    """
    import functools

    dtype = jnp.bfloat16 if dtype is None else dtype
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(shape_tree)
    keys = jax.random.split(
        jax.random.PRNGKey(seed), max(len(path_leaves), 1)
    )

    @functools.lru_cache(maxsize=None)  # one program per distinct shape
    def filler(shape, leaf_dtype, kind):
        if kind == "int8_kernel":
            # int8_w storage kernels (ops/quant.py Int8Dense): random in
            # the full quant range so random-weight wall-clock runs see
            # non-degenerate activations (zeros would zero every matmul)
            return jax.jit(
                lambda k: jax.random.randint(k, shape, -127, 128, jnp.int8)
            )
        if kind == "dequant_scale":
            # per-channel dequant scale of an Int8Dense: positive, sized
            # so q·scale lands in the N(0, `scale`) family the float
            # kernels use — a N(0, scale) fill would make effective
            # weights ~75× too large and overflow bf16 through 57 blocks
            return jax.jit(
                lambda k: jnp.abs(jax.random.normal(k, shape, jnp.float32))
                * (scale / 127.0)
                + 1e-6
            )
        if kind == "norm_scale":
            # norm affine weights train to ~1.0; keep them in that family
            # so activation magnitudes stay realistic through deep stacks
            return jax.jit(
                lambda k: (
                    1.0 + jax.random.normal(k, shape, jnp.float32) * scale
                ).astype(leaf_dtype)
            )
        if not jnp.issubdtype(leaf_dtype, jnp.floating):
            return jax.jit(lambda k: jnp.zeros(shape, leaf_dtype))
        return jax.jit(
            lambda k: jax.random.normal(k, shape, dtype) * jnp.asarray(
                scale, dtype
            )
        )

    def param_name_and_parent(path):
        # the param name is the innermost dict key (boxed leaves append
        # box-internal path entries after it); the parent path identifies
        # the module dict the param lives in
        for i in range(len(path) - 1, -1, -1):
            if isinstance(path[i], jax.tree_util.DictKey):
                return path[i].key, path[:i]
        return None, path

    # "scale" is also the standard norm-affine param name (LayerNorm,
    # models/vae.py, models/clip.py expect ~1.0 there), so an fp32
    # "scale" counts as an Int8Dense dequant scale only when it shares a
    # module dict with an int8 kernel
    int8_parents = {
        param_name_and_parent(p)[1]
        for p, l in path_leaves
        if jnp.dtype(l.dtype) == jnp.int8
    }

    def kind_of(path, leaf_dtype):
        if leaf_dtype == jnp.int8:
            return "int8_kernel"
        name, parent = param_name_and_parent(path)
        if name == "scale" and jnp.issubdtype(leaf_dtype, jnp.floating):
            if leaf_dtype == jnp.float32 and parent in int8_parents:
                return "dequant_scale"
            return "norm_scale"
        return ""

    filled = [
        filler(tuple(l.shape), jnp.dtype(l.dtype), kind_of(p, l.dtype))(k)
        for k, (p, l) in zip(keys, path_leaves)
    ]
    return jax.tree.unflatten(treedef, filled)


_LOCAL_ATTENTION = False


class local_attention:
    """Context manager forcing `dot_product_attention` to run its kernel
    directly, skipping mesh detection and the shard_map wrapper. Required
    when tracing attention INSIDE an existing shard_map body (e.g. the
    pipeline-parallel stage functions in parallel/pipeline.py): nested
    shard_map is not allowed, and inside a shard the operands are already
    local, so per-shard semantics are exactly single-device semantics.
    Trace-time only — the flag gates Python dispatch, not runtime state."""

    def __enter__(self):
        global _LOCAL_ATTENTION
        self._prev = _LOCAL_ATTENTION
        _LOCAL_ATTENTION = True
        return self

    def __exit__(self, *exc):
        global _LOCAL_ATTENTION
        _LOCAL_ATTENTION = self._prev
        return False


def set_attention_backend(name: str) -> None:
    """Select the attention implementation: "xla"
    (jax.nn.dot_product_attention) or "pallas" (ecad_tpu.ops.fused_attention,
    the VMEM-resident fused kernel — TPU only). Also settable via
    ECAD_ATTENTION_BACKEND before import."""
    global _ATTENTION_BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown attention backend {name!r}")
    _ATTENTION_BACKEND = name


import os as _os  # noqa: E402

if _os.environ.get("ECAD_ATTENTION_BACKEND"):
    set_attention_backend(_os.environ["ECAD_ATTENTION_BACKEND"])


def _auto_flash(q, k, bias) -> bool:
    """Route long-sequence attention to the Pallas kernels even on the
    default XLA backend when it is a measured win: score tile beyond the
    single-tile VMEM budget and a flash-compatible (None or key-padding)
    bias. The chunked row-block kernel wins for ANY head dim when the key
    sequence fits VMEM — including the lane-padded D72 PixArt-1024 shape
    (9.27 vs 12.4 ms XLA at B8H16T4096D72; the r2 online-softmax kernel
    lost that regime at 13.7 ms) and D128 FLUX-1024 (3.68 vs 30.9 ms).
    Beyond VMEM-resident kv the streaming kernel still requires a
    128-multiple head dim (unmeasured at D72, and no served shape hits
    it)."""
    d = q.shape[-1]
    from ..ops.attention import (
        _ROWBLOCK_MAX_KV_ELEMS,
        _SINGLE_TILE_SCORE_BYTES,
        _flash_bias_ok,
        _round_up,
    )

    tq = _round_up(q.shape[1], 8)
    tk = _round_up(k.shape[1], 128)
    if tq * tk * 4 <= _SINGLE_TILE_SCORE_BYTES:
        return False
    rowblock_ok = tk * _round_up(d, 128) <= _ROWBLOCK_MAX_KV_ELEMS
    if not rowblock_ok and d % 128 != 0:
        return False
    return _flash_bias_ok(bias, q.shape[0])


# Floor for auto-routing short no-bias attention to the single-tile
# kernel: padded fp32 score-tile bytes. 1 MiB ≈ a 512² self-attention
# tile — every measured shape at or above it wins on v5e
# (scripts/exp_attn_pixart256.py): T1024 D72 8.38 vs 14.32 ms XLA,
# T768 D128 1.08 vs 5.06 ms, T768 D64 0.33 vs 1.48 ms. Below the floor
# kernel launch overhead and the tk→128 pad dominate and shapes are
# cheap either way, so XLA keeps them.
_AUTO_SINGLE_TILE_MIN_SCORE_BYTES = 1024 * 1024


def _auto_single_tile(q, k, bias) -> bool:
    """Route short/medium NO-BIAS attention (the DiT self-attention
    shapes: PixArt-256's 1024 tokens, FLUX-256's 768) to the VMEM-
    resident single-tile Pallas kernel on the default XLA backend. Biased
    cross-attention stays on XLA: the one measured biased shape
    (Tq1024→Tk120 key-padding) loses (3.88 vs 1.96 ms), and its cost is
    marginal."""
    if bias is not None:
        return False
    from ..ops.attention import _SINGLE_TILE_SCORE_BYTES, _round_up

    score = _round_up(q.shape[1], 8) * _round_up(k.shape[1], 128) * 4
    return (
        _AUTO_SINGLE_TILE_MIN_SCORE_BYTES <= score
        <= _SINGLE_TILE_SCORE_BYTES
    )


def _active_multidevice_mesh():
    """The `with mesh:` context's physical mesh when it spans >1 device,
    else None. Under such a mesh jit auto-partitions the program — but
    Mosaic (Pallas) kernels cannot be auto-partitioned, so the pallas
    paths must be wrapped in shard_map (see _shard_map_attention).

    Raises RuntimeError if the (private) mesh-context API is unavailable
    — callers must then stay off the pallas paths entirely, since a
    multi-device program with an undetected mesh would emit an unwrapped
    Mosaic kernel and fail to partition. Note the limitation: a program
    sharded purely via NamedSharding-annotated args WITHOUT `with mesh:`
    is undetectable at trace time; all in-repo multi-device paths
    (pipelines, evaluators, __graft_entry__) enter the mesh context."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
    except Exception as e:  # pragma: no cover - future-jax guard
        raise RuntimeError(
            "cannot detect the active mesh (jax._src.mesh moved?)"
        ) from e
    if m is None or m.empty or m.size == 1:
        return None
    return m


def _shard_map_attention(kernel, mesh, q, k, v, bias):
    """Run an attention `kernel(q, k, v, bias)` under shard_map on a
    dp×(sp×)tp mesh: batch shards over "dp", heads over "tp" — attention
    has no cross-batch/cross-head dataflow, so those axes need no
    collectives. On an sp (sequence-parallel) mesh the query tokens shard
    over "sp" too; for self/joint attention (no bias, Tk divisible) K/V
    arrive sp-sharded and are all-gathered along "sp" inside the shard —
    one ICI all-gather per attention in exchange for 1/sp of the score
    and output work per chip. Biased cross-attention keeps K/V (text,
    short) and the key-padding bias whole per shard: exact with zero
    collectives. Returns None when the mesh axes or shapes don't divide
    (caller falls back to XLA, which auto-partitions)."""
    from jax.sharding import PartitionSpec as P

    names = set(mesh.axis_names)
    if not names <= {"dp", "sp", "tp"}:
        return None
    dp = mesh.shape.get("dp", 1)
    sp = mesh.shape.get("sp", 1)
    tp = mesh.shape.get("tp", 1)
    b, tq, h, _ = q.shape
    if b % dp or h % tp:
        return None
    saxis = "sp" if sp > 1 else None
    if saxis and tq % sp:
        return None
    baxis = "dp" if dp > 1 else None
    haxis = "tp" if tp > 1 else None
    q_spec = P(baxis, saxis, haxis, None)
    gather_kv = saxis is not None and bias is None and k.shape[1] % sp == 0
    kv_spec = P(baxis, saxis if gather_kv else None, haxis, None)

    def run(q_, k_, v_, bias_):
        if gather_kv:
            k_ = jax.lax.all_gather(k_, "sp", axis=1, tiled=True)
            v_ = jax.lax.all_gather(v_, "sp", axis=1, tiled=True)
        return kernel(q_, k_, v_, bias_)

    if bias is None:
        fn = jax.shard_map(
            lambda q_, k_, v_: run(q_, k_, v_, None),
            mesh=mesh, in_specs=(q_spec, kv_spec, kv_spec),
            out_specs=q_spec, check_vma=False,
        )
        return fn(q, k, v)
    bias_spec = P(
        baxis if bias.shape[0] == b else None,
        haxis if bias.shape[1] == h else None,
        saxis if (saxis and bias.shape[2] == tq) else None,
        None,
    )
    fn = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, bias_spec),
        out_specs=q_spec,
        check_vma=False,
    )
    return fn(q, k, v, bias)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused SDPA over (B, T, H, Dh) tensors with fp32 softmax; backend per
    set_attention_backend, with an automatic flash-kernel fast path for
    long lane-aligned sequences regardless of backend. Under an active
    multi-device mesh the pallas paths run per-shard via shard_map (Mosaic
    kernels cannot be auto-partitioned by XLA)."""
    kernel = None
    if _ATTENTION_BACKEND == "pallas":
        from ..ops.attention import fused_attention

        kernel = lambda q_, k_, v_, b_: fused_attention(  # noqa: E731
            q_, k_, v_, bias=b_
        )
    elif jax.default_backend() == "tpu":
        if _auto_flash(q, k, bias):
            from ..ops.attention import _flash_attention

            kernel = lambda q_, k_, v_, b_: _flash_attention(  # noqa: E731
                q_, k_, v_, b_, interpret=False
            )
        elif _auto_single_tile(q, k, bias):
            from ..ops.attention import fused_attention

            kernel = lambda q_, k_, v_, b_: fused_attention(  # noqa: E731
                q_, k_, v_, bias=b_
            )
    if kernel is not None:
        if _LOCAL_ATTENTION:
            # inside a shard_map body (parallel/pipeline.py): operands are
            # already local — run the kernel directly, never re-wrap
            return kernel(q, k, v, bias)
        try:
            mesh = _active_multidevice_mesh()
        except RuntimeError:
            kernel = None  # can't prove single-device; stay on TPU XLA
        if kernel is not None:
            if mesh is None:
                return kernel(q, k, v, bias)
            out = _shard_map_attention(kernel, mesh, q, k, v, bias)
            if out is not None:
                return out
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


class Attention(nn.Module):
    """Multi-head attention matching diffusers' Attention used by PixArt:
    separate q/k/v linears with bias, single out projection with bias.
    Self-attention when `context` is None, cross-attention otherwise.
    Head dimension is sharded over the "tp" mesh axis via logical axes.

    `kv()` exposes the projected keys/values so trajectory-constant
    cross-attention K/V can be hoisted out of the denoise loop (the
    reference recomputes them at every step; they depend only on the text
    encoding). Pass the result back via the `kv=` argument.
    """

    dim: int
    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    use_bias: bool = True
    out_bias: bool = True
    quant: Optional[str] = None  # None | "int8" (ops/quant.py serving mode)
    # quant="int8_static" calibration table: tuple of (module-path, amax)
    # pairs (tuple keeps configs hashable; ops/quant.py calibrate_dense_amax)
    act_scales: Optional[tuple] = None

    def setup(self) -> None:
        inner = self.heads * self.head_dim
        from ..ops.quant import Int8Dense, maybe_quant_dot_general

        def dense(name, features, in_axis, out_axis, use_bias):
            if self.quant in ("int8_w", "int8_w_static"):
                amax = None
                if self.quant == "int8_w_static" and self.act_scales:
                    amax = dict(self.act_scales).get(
                        "/".join(self.path + (name,))
                    )
                return Int8Dense(
                    features,
                    axes=(in_axis, out_axis),
                    use_bias=use_bias,
                    dtype=self.dtype,
                    name=name,
                    act_amax=amax,
                )
            dg = maybe_quant_dot_general(
                self.quant, "/".join(self.path + (name,)), self.act_scales
            )
            return nn.Dense(
                features,
                use_bias=use_bias,
                dtype=self.dtype,
                dot_general=dg,
                kernel_init=with_part(
                    nn.initializers.normal(0.02), (in_axis, out_axis)
                ),
                bias_init=with_part(
                    nn.initializers.zeros_init(), (out_axis,)
                ),
                name=name,
            )

        self.to_q = dense("to_q", inner, EMBED, HEADS, self.use_bias)
        self.to_k = dense("to_k", inner, EMBED, HEADS, self.use_bias)
        self.to_v = dense("to_v", inner, EMBED, HEADS, self.use_bias)
        self.to_out = dense("to_out", self.dim, HEADS, EMBED, self.out_bias)

    def kv(self, ctx: jax.Array) -> tuple[jax.Array, jax.Array]:
        b, tk = ctx.shape[:2]
        k = self.to_k(ctx).reshape(b, tk, self.heads, self.head_dim)
        v = self.to_v(ctx).reshape(b, tk, self.heads, self.head_dim)
        return k, v

    def __call__(
        self,
        x: jax.Array,
        context: Optional[jax.Array] = None,
        bias: Optional[jax.Array] = None,
        kv: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> jax.Array:
        inner = self.heads * self.head_dim
        b, tq = x.shape[:2]
        q = self.to_q(x).reshape(b, tq, self.heads, self.head_dim)
        if kv is None:
            k, v = self.kv(x if context is None else context)
        else:
            k, v = kv
        out = dot_product_attention(q, k, v, bias=bias)
        out = out.reshape(b, tq, inner)
        return self.to_out(out)


class FeedForward(nn.Module):
    """d → mult·d → d with tanh-approximate GELU (PixArt's
    activation_fn="gelu-approximate"); GEGLU variant for generic blocks."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16
    gated: bool = False
    quant: Optional[str] = None  # None | "int8" (ops/quant.py serving mode)
    # quant="int8_static" calibration table (see Attention.act_scales)
    act_scales: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..ops.quant import Int8Dense, maybe_quant_dot_general

        def dg(name):
            return maybe_quant_dot_general(
                self.quant, "/".join(self.path + (name,)), self.act_scales
            )

        inner = self.dim * self.mult
        if self.quant in ("int8_w", "int8_w_static"):
            def amax(name):
                if self.quant != "int8_w_static" or not self.act_scales:
                    return None
                return dict(self.act_scales).get(
                    "/".join(self.path + (name,))
                )

            proj_in = Int8Dense(
                inner * (2 if self.gated else 1),
                axes=(EMBED, MLP),
                dtype=self.dtype,
                name="proj_in",
                act_amax=amax("proj_in"),
            )
            proj_out = Int8Dense(
                self.dim, axes=(MLP, EMBED), dtype=self.dtype,
                name="proj_out", act_amax=amax("proj_out"),
            )
        else:
            proj_in = nn.Dense(
                inner * (2 if self.gated else 1),
                dtype=self.dtype,
                dot_general=dg("proj_in"),
                kernel_init=with_part(
                    nn.initializers.normal(0.02), (EMBED, MLP)
                ),
                bias_init=with_part(nn.initializers.zeros_init(), (MLP,)),
                name="proj_in",
            )
            proj_out = nn.Dense(
                self.dim,
                dtype=self.dtype,
                dot_general=dg("proj_out"),
                kernel_init=with_part(
                    nn.initializers.normal(0.02), (MLP, EMBED)
                ),
                name="proj_out",
            )
        h = proj_in(x)
        if self.gated:
            h, gate = jnp.split(h, 2, axis=-1)
            h = h * nn.gelu(gate, approximate=True)
        else:
            h = nn.gelu(h, approximate=True)
        return proj_out(h)


def sincos_2d_pos_embed(
    dim: int,
    grid_h: int,
    grid_w: int,
    base_size: int,
    interpolation_scale: float = 1.0,
) -> np.ndarray:
    """diffusers get_2d_sincos_pos_embed equivalent (numpy, fp32)."""
    gh = np.arange(grid_h, dtype=np.float32) / (grid_h / base_size) / interpolation_scale
    gw = np.arange(grid_w, dtype=np.float32) / (grid_w / base_size) / interpolation_scale
    grid = np.meshgrid(gw, gh)  # w first, matching diffusers
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_h, grid_w)

    def _1d(embed_dim: int, pos: np.ndarray) -> np.ndarray:
        omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    emb_h = _1d(dim // 2, grid[0])
    emb_w = _1d(dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)

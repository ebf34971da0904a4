"""FLUX.1 transformer (dual-stream + single-stream), TPU-native.

Architecture parity with diffusers' FluxTransformer2DModel as used by the
reference (ecad/transformer_2d_models/flux_transformer_2d_edited.py): 19
dual-stream blocks (joint attention over [text; image] with per-head RMS
q/k norms and 3-axis RoPE, AdaLayerNormZero gating per stream) + 38
single-stream blocks (fused qkv+mlp with shared proj_out), guidance
embedding (FLUX.1-dev), packed 2×2 latents (64 channels).

Cache semantics mirror ecad/transformer_blocks/cached_flux_transformer_block.py:
* dual `full_attn` caches the (attn_output, context_attn_output) pair
  atomically pre-gate (:170-200); `full_ff`/`full_ff_context` cache pre-gate
  FF outputs (:202-226)
* single `single_proj_mlp` caches the PRE-activation projection (:106-110 —
  act_mlp is applied after the cache read), `single_attn` the attention
  output, `single_proj_out` the pre-gate output projection
* every component updates its cache each step with the value it used,
  recomputed or reused.

Recompute decisions are static per (block, component) — cached components
are absent from the compiled graph (see ecad_tpu.models.pixart docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import (
    BATCH,
    EMBED,
    HEADS,
    MLP,
    SEQ,
    TimestepEmbedding,
    dot_product_attention,
    layer_norm,
    logical_constraint,
    sinusoidal_embedding,
    with_part,
)

FULL_COMPONENTS = ("full_attn", "full_ff", "full_ff_context")
SINGLE_COMPONENTS = ("single_attn", "single_proj_mlp", "single_proj_out")


def _pick(flag, compute_fn, cached):
    """Static flags specialize the compiled graph; traced flags lower to
    lax.cond (one program for all schedules, untaken branch skipped at
    runtime). `cached` may be a pytree (the dual-attn pair)."""
    if not isinstance(flag, jax.Array):
        return compute_fn() if flag else cached
    return jax.lax.cond(flag, compute_fn, lambda: cached)


def _to_cache(value, c: "FluxConfig"):
    """Cast a computed activation (pytree) to the cache-storage dtype.
    With `cache_dtype=float8_e4m3fn` the dominant single_proj_mlp cache
    (108 MB/block at 1024², docs/flux_hbm_accounting.md) halves vs bf16 —
    the storage rounding (~3% per element) is second-order against the
    staleness the schedule already tolerates (a reused entry is a WHOLE
    previous denoise step old).

    The optimization_barrier forces the f8 tensor to MATERIALIZE at the
    producing block: without it XLA sinks the convert into the
    step-t+k cache-read consumer and keeps the producer's fp32 dequant
    output (4× the bytes) live across denoise steps instead — measured
    +1.1 GB of f32[4608,3072] proj_out temps on the 12B 1024² program."""
    if c.cache_dtype is None:
        return value
    return jax.lax.optimization_barrier(
        jax.tree.map(lambda t: t.astype(c.cache_dtype), value)
    )


def _from_cache(value, c: "FluxConfig"):
    """Cast a cache read back to the compute dtype (inverse of _to_cache)."""
    if c.cache_dtype is None or value is None:
        return value
    return jax.tree.map(lambda t: t.astype(c.dtype), value)


@dataclass(frozen=True)
class FluxConfig:
    dim: int = 3072
    num_heads: int = 24
    head_dim: int = 128
    num_blocks: int = 19
    num_single_blocks: int = 38
    in_channels: int = 64  # packed 2×2 × 16 latent channels
    joint_dim: int = 4096  # T5 embeddings
    pooled_dim: int = 768  # CLIP pooled embedding
    mlp_ratio: int = 4
    axes_dims: tuple[int, ...] = (16, 56, 56)
    rope_theta: int = 10000
    text_len: int = 512
    guidance_embeds: bool = True
    dtype: Any = jnp.bfloat16
    # None | "int8" | "int8_static" | "int8_w" | "int8_w_static"
    # (ops/quant.py):
    # * "int8": block projections through the W8A8 dynamic-quant int8
    #   MXU path; bf16 weights in HBM. Embedders, adaLN, QKNorm,
    #   softmax, and the final projection stay bf16/fp32.
    # * "int8_static": "int8" with calibrated per-site STATIC activation
    #   scales from `act_scales` — removes the per-token max-abs VPU
    #   pass (FluxImageGenerator._calibrate_static_scales).
    # * "int8_w": int8 weight STORAGE (+ per-channel scale) for the
    #   block projections AND the adaLN linears — halves weight HBM so
    #   the full-width 12B model fits one 16 GiB v5e chip (23.8 GiB
    #   bf16 → ~11.2 GiB). Same W8A8 MXU path at apply time.
    # * "int8_w_static": "int8_w" storage + the static activation
    #   scales (Int8Dense.act_amax) — the 12B single-chip serving mode.
    quant: Any = None
    # Calibration table for the static modes: tuple of (site, amax)
    # pairs keyed by module path ("blocks_3/attn/to_q"); kept a tuple so
    # the config stays hashable. None = uncalibrated (static modes fall
    # back to dynamic per-token scales per site).
    act_scales: Optional[tuple] = None
    # None (store caches in `dtype`) or a storage dtype for the cached
    # component activations, e.g. jnp.float8_e4m3fn — halves cache HBM,
    # which is what lets the CACHED full-width 12B programs fit one chip
    # at 1024² (the bf16 cache set alone is ~4 GiB there). Reads cast
    # back to `dtype`; see _to_cache/_from_cache.
    cache_dtype: Any = None

    @classmethod
    def tiny(cls, **kw) -> "FluxConfig":
        defaults = dict(
            dim=64,
            num_heads=4,
            head_dim=16,
            num_blocks=2,
            num_single_blocks=3,
            in_channels=16,
            joint_dim=32,
            pooled_dim=24,
            axes_dims=(4, 6, 6),
            text_len=8,
        )
        defaults.update(kw)
        return cls(**defaults)


# ---------------------------------------------------------------------------
# RoPE (3-axis, diffusers FluxPosEmbed semantics)
# ---------------------------------------------------------------------------


def rope_freqs(
    ids: np.ndarray, axes_dims: tuple[int, ...], theta: int
) -> tuple[np.ndarray, np.ndarray]:
    """ids (S, n_axes) → (cos, sin) of shape (S, head_dim/2), concatenated
    per axis. Frequencies follow diffusers get_1d_rotary_pos_embed with
    linear factor 1 / ntk factor 1."""
    cos_parts, sin_parts = [], []
    for k, d in enumerate(axes_dims):
        pos = ids[:, k].astype(np.float64)
        freqs = 1.0 / (
            theta ** (np.arange(0, d, 2, dtype=np.float64) / d)
        )  # (d/2,)
        angles = np.outer(pos, freqs)  # (S, d/2)
        cos_parts.append(np.cos(angles))
        sin_parts.append(np.sin(angles))
    return (
        np.concatenate(cos_parts, axis=1).astype(np.float32),
        np.concatenate(sin_parts, axis=1).astype(np.float32),
    )


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Interleaved rotary application on (B, S, H, D): pairs are the last
    dim's (even, odd) elements (diffusers apply_rotary_emb,
    use_real_unbind_dim=-1)."""
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    r1 = x1 * c - x2 * sn
    r2 = x2 * c + x1 * sn
    return jnp.stack([r1, r2], axis=-1).reshape(b, s, h, d).astype(x.dtype)


def make_image_ids(grid_h: int, grid_w: int) -> np.ndarray:
    ids = np.zeros((grid_h, grid_w, 3), dtype=np.float64)
    ids[..., 1] = np.arange(grid_h)[:, None]
    ids[..., 2] = np.arange(grid_w)[None, :]
    return ids.reshape(-1, 3)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------


def _dense(
    dim,
    name,
    in_axis=EMBED,
    out_axis=None,
    dtype=jnp.bfloat16,
    use_bias=True,
    quant=None,
    parent=None,
    act_scales=None,
):
    """`parent` (the calling module) + `act_scales` thread the static
    quant modes' calibration table: the site key is the Dense's flax
    module path (parent.path + name) — exactly what calibrate_dense_amax
    records. Sites absent from the table keep dynamic scales."""
    from ..ops.quant import Int8Dense, maybe_quant_dot_general

    site = None
    if parent is not None and act_scales is not None:
        site = "/".join((*parent.path, name))
    if quant in ("int8_w", "int8_w_static"):
        # Weight-STORAGE quantization: int8 kernel in HBM (1 byte/param)
        # + per-channel scale, W8A8 on the int8 MXU. This is the mode
        # that fits full-width 12B FLUX on one 16 GiB v5e chip.
        amax = None
        if quant == "int8_w_static" and site is not None:
            amax = dict(act_scales).get(site)
        return Int8Dense(
            dim,
            axes=(in_axis, out_axis),
            use_bias=use_bias,
            dtype=dtype,
            name=name,
            act_amax=amax,
        )
    return nn.Dense(
        dim,
        use_bias=use_bias,
        dtype=dtype,
        dot_general=maybe_quant_dot_general(quant, site, act_scales),
        kernel_init=with_part(nn.initializers.normal(0.02), (in_axis, out_axis)),
        name=name,
    )


class AdaNorm(nn.Module):
    """AdaLayerNormZero family: silu(temb) → linear → n_mods chunks; returns
    modulated layer-norm and the gates.

    `quant` is honored ONLY for the "int8_w" storage mode: the adaLN
    linears are 3.2 B of FLUX's 11.9 B params, so int8 storage there is
    mandatory for the single-chip fit (their matmul FLOPs are negligible
    — temb is one token — so this is purely a residency decision). The
    dynamic "int8" serving mode deliberately keeps adaLN exact
    (ops/quant.py module docstring), hence the filter below."""

    dim: int
    n_mods: int
    dtype: Any = jnp.bfloat16
    quant: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, temb: jax.Array):
        mods = _dense(
            self.n_mods * self.dim,
            "linear",
            dtype=self.dtype,
            # int8_w_static keeps DYNAMIC activation scales here: temb is
            # one token, so the max-abs pass costs nothing and adaLN
            # stays out of the calibration table
            quant="int8_w" if self.quant in ("int8_w", "int8_w_static")
            else None,
        )(nn.silu(temb))
        parts = jnp.split(mods[:, None, :], self.n_mods, axis=-1)
        shift, scale = parts[0], parts[1]
        normed = layer_norm(x) * (1 + scale) + shift
        return (normed, *parts[2:])


class QKNorm(nn.Module):
    """Per-head RMS norm on q and k (flux qk_norm='rms_norm', eps 1e-6)."""

    head_dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array):
        qs = self.param(
            "q_scale", nn.initializers.ones_init(), (self.head_dim,), jnp.float32
        )
        ks = self.param(
            "k_scale", nn.initializers.ones_init(), (self.head_dim,), jnp.float32
        )

        def rms(x, scale):
            x32 = x.astype(jnp.float32)
            var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
            return (x32 * jax.lax.rsqrt(var + 1e-6) * scale).astype(self.dtype)

        return rms(q, qs), rms(k, ks)


class FluxJointAttention(nn.Module):
    """Dual-stream joint attention: text and image tokens get separate
    qkv/out projections but attend jointly ([text; image] order)."""

    config: FluxConfig

    @nn.compact
    def __call__(
        self,
        img: jax.Array,  # (B, Ti, d) modulated image stream
        txt: jax.Array,  # (B, Tt, d) modulated text stream
        cos: jax.Array,
        sin: jax.Array,
    ) -> tuple[jax.Array, jax.Array]:
        c = self.config
        inner = c.num_heads * c.head_dim
        b, ti = img.shape[:2]
        tt = txt.shape[1]

        def heads(x):
            return x.reshape(b, -1, c.num_heads, c.head_dim)

        q = heads(_dense(inner, "to_q", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(img))
        k = heads(_dense(inner, "to_k", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(img))
        v = heads(_dense(inner, "to_v", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(img))
        q, k = QKNorm(c.head_dim, c.dtype, name="norm_qk")(q, k)

        qc = heads(_dense(inner, "add_q_proj", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(txt))
        kc = heads(_dense(inner, "add_k_proj", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(txt))
        vc = heads(_dense(inner, "add_v_proj", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(txt))
        qc, kc = QKNorm(c.head_dim, c.dtype, name="norm_added_qk")(qc, kc)

        # text first, matching diffusers' concatenation order
        q = jnp.concatenate([qc, q], axis=1)
        k = jnp.concatenate([kc, k], axis=1)
        v = jnp.concatenate([vc, v], axis=1)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = dot_product_attention(q, k, v)  # backend-switchable (common)
        out = out.reshape(b, tt + ti, inner)
        txt_out, img_out = out[:, :tt], out[:, tt:]
        img_out = _dense(c.dim, "to_out", in_axis=HEADS, out_axis=EMBED, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(img_out)
        txt_out = _dense(c.dim, "to_add_out", in_axis=HEADS, out_axis=EMBED, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(txt_out)
        return img_out, txt_out


class FluxSingleAttention(nn.Module):
    """Single-stream attention: qkv + RoPE + SDPA, no output projection
    (fused into the block's proj_out)."""

    config: FluxConfig

    @nn.compact
    def __call__(self, x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
        c = self.config
        inner = c.num_heads * c.head_dim
        b, s = x.shape[:2]

        def heads(y):
            return y.reshape(b, s, c.num_heads, c.head_dim)

        q = heads(_dense(inner, "to_q", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(x))
        k = heads(_dense(inner, "to_k", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(x))
        v = heads(_dense(inner, "to_v", out_axis=HEADS, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(x))
        q, k = QKNorm(c.head_dim, c.dtype, name="norm_qk")(q, k)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        out = dot_product_attention(q, k, v)  # backend-switchable (common)
        return out.reshape(b, s, inner)


class FluxDualBlock(nn.Module):
    config: FluxConfig

    @nn.compact
    def __call__(
        self,
        img: jax.Array,
        txt: jax.Array,
        temb: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        cache: dict[str, Any],
        mask: tuple[bool, bool, bool],  # (full_attn, full_ff, full_ff_context)
    ):
        c = self.config
        recompute_attn, recompute_ff, recompute_ffc = (
            mask[0], mask[1], mask[2]
        )
        new_cache = {}

        norm_img, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaNorm(
            c.dim, 6, c.dtype, c.quant, name="norm1"
        )(img, temb)
        norm_txt, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = AdaNorm(
            c.dim, 6, c.dtype, c.quant, name="norm1_context"
        )(txt, temb)

        attn_out, ctx_attn_out = _pick(
            recompute_attn,
            lambda: FluxJointAttention(c, name="attn")(
                norm_img, norm_txt, cos, sin
            ),
            _from_cache(cache["full_attn"], c),
        )
        # cache entries stay dp-sharded across denoise steps (they are
        # carried through the scan; without a constraint GSPMD may gather)
        attn_out = logical_constraint(attn_out, (BATCH, SEQ, EMBED))
        ctx_attn_out = logical_constraint(ctx_attn_out, (BATCH, SEQ, EMBED))
        new_cache["full_attn"] = _to_cache((attn_out, ctx_attn_out), c)

        img = img + gate_msa * attn_out
        norm_img2 = layer_norm(img) * (1 + scale_mlp) + shift_mlp

        def compute_ff():
            ff = _dense(c.dim * c.mlp_ratio, "ff_in", out_axis=MLP, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(norm_img2)
            ff = nn.gelu(ff, approximate=True)
            return _dense(c.dim, "ff_out", in_axis=MLP, out_axis=EMBED, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales)(ff)

        ff = logical_constraint(
            _pick(recompute_ff, compute_ff, _from_cache(cache["full_ff"], c)),
            (BATCH, SEQ, EMBED),
        )
        new_cache["full_ff"] = _to_cache(ff, c)
        img = img + gate_mlp * ff

        txt = txt + c_gate_msa * ctx_attn_out
        norm_txt2 = layer_norm(txt) * (1 + c_scale_mlp) + c_shift_mlp

        def compute_ffc():
            ffc = _dense(
                c.dim * c.mlp_ratio, "ff_context_in", out_axis=MLP, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales
            )(norm_txt2)
            ffc = nn.gelu(ffc, approximate=True)
            return _dense(
                c.dim, "ff_context_out", in_axis=MLP, out_axis=EMBED, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales
            )(ffc)

        ffc = logical_constraint(
            _pick(
                recompute_ffc,
                compute_ffc,
                _from_cache(cache["full_ff_context"], c),
            ),
            (BATCH, SEQ, EMBED),
        )
        new_cache["full_ff_context"] = _to_cache(ffc, c)
        txt = txt + c_gate_mlp * ffc
        return img, txt, new_cache


class FluxSingleBlock(nn.Module):
    config: FluxConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (B, Tt+Ti, d) joint stream
        temb: jax.Array,
        cos: jax.Array,
        sin: jax.Array,
        cache: dict[str, Any],
        mask: tuple[bool, bool, bool],  # (attn, proj_mlp, proj_out)
    ):
        c = self.config
        recompute_attn, recompute_mlp, recompute_out = (
            mask[0], mask[1], mask[2]
        )
        new_cache = {}
        residual = x
        normed, gate = AdaNorm(c.dim, 3, c.dtype, c.quant, name="norm")(x, temb)

        mlp = _pick(
            recompute_mlp,
            lambda: _dense(
                c.dim * c.mlp_ratio, "proj_mlp", out_axis=MLP, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales
            )(normed),
            _from_cache(cache["single_proj_mlp"], c),
        )
        # the dominant cache (4 GiB/img at 1024², docs/flux_hbm_accounting.md)
        # lives at MLP width → shard it over tp as well as dp
        mlp = logical_constraint(mlp, (BATCH, SEQ, MLP))
        new_cache["single_proj_mlp"] = _to_cache(mlp, c)  # PRE-activation
        mlp_act = nn.gelu(mlp, approximate=True)

        attn = logical_constraint(
            _pick(
                recompute_attn,
                lambda: FluxSingleAttention(c, name="attn")(normed, cos, sin),
                _from_cache(cache["single_attn"], c),
            ),
            (BATCH, SEQ, EMBED),
        )
        new_cache["single_attn"] = _to_cache(attn, c)

        def compute_out():
            joint = jnp.concatenate([attn, mlp_act], axis=-1)
            return _dense(
                c.dim, "proj_out", in_axis=MLP, out_axis=EMBED, dtype=c.dtype, quant=c.quant, parent=self, act_scales=c.act_scales
            )(joint)

        out = logical_constraint(
            _pick(
                recompute_out,
                compute_out,
                _from_cache(cache["single_proj_out"], c),
            ),
            (BATCH, SEQ, EMBED),
        )
        new_cache["single_proj_out"] = _to_cache(out, c)

        return residual + gate * out, new_cache


class FluxTransformer(nn.Module):
    """Full FLUX transformer over packed latents.

    `mask` layout: tuple of per-block component triples, full blocks first
    then single blocks (the schedule slot order,
    ecad/schedulers/cache_scheduler/flux_cache_schedule.py:62-90)."""

    config: FluxConfig

    @nn.compact
    def __call__(
        self,
        latents: jax.Array,  # (B, T_img, 64) packed
        txt: jax.Array,  # (B, T_txt, joint_dim) T5 embeddings
        pooled: jax.Array,  # (B, pooled_dim) CLIP pooled
        timestep: jax.Array,  # (B,) in [0, 1] (sigma)
        guidance: Optional[jax.Array],  # (B,) guidance scale or None
        cache: dict[str, Any],
        mask: tuple,
        grid_hw: tuple[int, int],
    ):
        c = self.config
        img = _dense(c.dim, "x_embedder", in_axis=None, out_axis=EMBED, dtype=c.dtype)(latents)
        txt_h = _dense(
            c.dim, "context_embedder", in_axis=None, out_axis=EMBED, dtype=c.dtype
        )(txt)

        t_emb = TimestepEmbedding(c.dim, c.dtype, name="timestep_embedder")(
            sinusoidal_embedding(timestep * 1000.0, 256).astype(c.dtype)
        )
        temb = t_emb
        if c.guidance_embeds:
            assert guidance is not None
            g_emb = TimestepEmbedding(c.dim, c.dtype, name="guidance_embedder")(
                sinusoidal_embedding(guidance * 1000.0, 256).astype(c.dtype)
            )
            temb = temb + g_emb
        # pooled CLIP projection: linear → silu → linear (the same MLP shape
        # as TimestepEmbedding, matching diffusers' text_embedder)
        pooled_emb = TimestepEmbedding(c.dim, c.dtype, name="text_embedder")(
            pooled
        )
        temb = temb + pooled_emb

        # rope over [text; image] ids
        gh, gw = grid_hw
        txt_ids = np.zeros((txt.shape[1], 3))
        img_ids = make_image_ids(gh, gw)
        cos_np, sin_np = rope_freqs(
            np.concatenate([txt_ids, img_ids]), c.axes_dims, c.rope_theta
        )
        cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)

        new_cache: dict[str, Any] = {}
        for i in range(c.num_blocks):
            block_cache = {k: cache.get(f"{k}_{i}") for k in FULL_COMPONENTS}
            img, txt_h, updated = FluxDualBlock(c, name=f"block_{i}")(
                img, txt_h, temb, cos, sin, block_cache, mask[i]
            )
            for k, v in updated.items():
                new_cache[f"{k}_{i}"] = v

        x = jnp.concatenate([txt_h, img], axis=1)
        for i in range(c.num_single_blocks):
            block_cache = {
                k: cache.get(f"{k}_{i}") for k in SINGLE_COMPONENTS
            }
            x, updated = FluxSingleBlock(c, name=f"single_block_{i}")(
                x, temb, cos, sin, block_cache, mask[c.num_blocks + i]
            )
            for k, v in updated.items():
                new_cache[f"{k}_{i}"] = v

        img = x[:, txt.shape[1] :]
        # AdaLayerNormContinuous final modulation — NOTE: diffusers chunks
        # SCALE first then shift here (unlike the PixArt scale_shift_table,
        # which is shift-first)
        mods = _dense(2 * c.dim, "norm_out_linear", dtype=c.dtype)(
            nn.silu(temb)
        )
        scale, shift = jnp.split(mods[:, None, :], 2, axis=-1)
        img = layer_norm(img) * (1 + scale) + shift
        return _dense(
            c.in_channels, "proj_out", in_axis=EMBED, out_axis=None, dtype=c.dtype
        )(img), new_cache


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def flux_step_masks(schedule, config: FluxConfig) -> list[tuple]:
    """Schedule → per-step static masks (full blocks then single blocks),
    with step-0 cache-miss forcing."""
    n_slots = config.num_blocks + config.num_single_blocks
    masks = []
    for step in range(schedule.num_inference_steps):
        if step == 0:
            masks.append(tuple(((True,) * 3) for _ in range(n_slots)))
            continue
        row = schedule.mask[step].reshape(n_slots, 3)
        masks.append(tuple(tuple(bool(v) for v in r) for r in row))
    return masks


def full_flux_mask(config: FluxConfig, value: bool = True) -> tuple:
    return tuple(
        ((value,) * 3)
        for _ in range(config.num_blocks + config.num_single_blocks)
    )


def init_flux_cache() -> dict:
    """Empty cache: missing entries are only legal when the step mask
    recomputes everything (step 0)."""
    return {}


def pack_latents(latents: jax.Array) -> jax.Array:
    """(B, H, W, C) → (B, H/2·W/2, 4C) FLUX packing (NHWC layout).

    Feature order within a packed token is (channel, p_h, p_w) — matching
    diffusers' `_pack_latents` permute(0,2,4,1,3,5) so real x_embedder /
    proj_out weights convert without permutation."""
    b, h, w, ch = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, ch)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, gh, gw, c, ph, pw)
    return x.reshape(b, (h // 2) * (w // 2), 4 * ch)


def unpack_latents(packed: jax.Array, grid_h: int, grid_w: int) -> jax.Array:
    b, t, c4 = packed.shape
    ch = c4 // 4
    x = packed.reshape(b, grid_h, grid_w, ch, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, gh, ph, gw, pw, c)
    return x.reshape(b, grid_h * 2, grid_w * 2, ch)


def init_flux_params(config: FluxConfig, rng: jax.Array | int = 0):
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = FluxTransformer(config)
    b, t_img = 1, 16
    latents = jnp.zeros((b, t_img, config.in_channels), config.dtype)
    txt = jnp.zeros((b, config.text_len, config.joint_dim), config.dtype)
    pooled = jnp.zeros((b, config.pooled_dim), config.dtype)
    t = jnp.zeros((b,), jnp.float32)
    g = jnp.ones((b,), jnp.float32) * 3.5 if config.guidance_embeds else None
    init_fn = jax.jit(
        lambda k: model.init(
            k, latents, txt, pooled, t, g, init_flux_cache(),
            full_flux_mask(config), (4, 4),
        )
    )
    return model, init_fn(rng)["params"]

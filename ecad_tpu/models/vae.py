"""AutoencoderKL decoder in Flax (NHWC, TPU-native).

Architecture parity with diffusers' AutoencoderKL decoder as used by the
reference pipelines (PixArt: sd-vae 4-channel latents, scaling 0.18215;
FLUX: 16-channel latents, scaling 0.3611 + shift 0.1159): post-quant 1×1
conv → conv_in → mid block (resnet, single-head spatial attention, resnet)
→ 4 up blocks of 3 resnets with nearest-neighbor ×2 upsampling → GroupNorm
→ conv_out. Weight conversion from diffusers checkpoints included.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    out_channels: int = 3
    scaling_factor: float = 0.18215
    shift_factor: float = 0.0
    dtype: Any = jnp.float32

    @classmethod
    def sd(cls) -> "VAEConfig":
        return cls()

    @classmethod
    def flux(cls) -> "VAEConfig":
        return cls(
            latent_channels=16, scaling_factor=0.3611, shift_factor=0.1159
        )

    @classmethod
    def tiny(cls, **kw) -> "VAEConfig":
        d = dict(
            latent_channels=4, block_out_channels=(8, 16), layers_per_block=1,
            norm_num_groups=4,
        )
        d.update(kw)
        return cls(**d)


def _conv(features, kernel, name, dtype):
    return nn.Conv(
        features, (kernel, kernel), padding=[(kernel // 2,) * 2] * 2,
        dtype=dtype, name=name,
    )


class ResnetBlock(nn.Module):
    out_channels: int
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        h = nn.GroupNorm(
            num_groups=c.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
            name="norm1",
        )(x).astype(x.dtype)
        h = nn.silu(h)
        h = _conv(self.out_channels, 3, "conv1", c.dtype)(h)
        h = nn.GroupNorm(
            num_groups=c.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
            name="norm2",
        )(h).astype(h.dtype)
        h = nn.silu(h)
        h = _conv(self.out_channels, 3, "conv2", c.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), dtype=c.dtype, name="conv_shortcut"
            )(x)
        return x + h


class MidAttention(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        b, hh, ww, ch = x.shape
        h = nn.GroupNorm(
            num_groups=c.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
            name="group_norm",
        )(x).astype(x.dtype)
        h = h.reshape(b, hh * ww, ch)
        q = nn.Dense(ch, dtype=c.dtype, name="to_q")(h)
        k = nn.Dense(ch, dtype=c.dtype, name="to_k")(h)
        v = nn.Dense(ch, dtype=c.dtype, name="to_v")(h)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(ch, dtype=c.dtype, name="to_out")(out)
        return x + out.reshape(b, hh, ww, ch)


class VAEDecoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        """(B, h, w, latent_channels) → (B, 8h, 8w, 3) in [-1, 1]."""
        c = self.config
        z = (z / c.scaling_factor + c.shift_factor).astype(c.dtype)
        z = nn.Conv(
            c.latent_channels, (1, 1), dtype=c.dtype, name="post_quant_conv"
        )(z)
        ch = c.block_out_channels[-1]
        h = _conv(ch, 3, "conv_in", c.dtype)(z)
        h = ResnetBlock(ch, c, name="mid_resnet_1")(h)
        h = MidAttention(c, name="mid_attn")(h)
        h = ResnetBlock(ch, c, name="mid_resnet_2")(h)
        rev = tuple(reversed(c.block_out_channels))
        for bi, out_ch in enumerate(rev):
            for ri in range(c.layers_per_block + 1):
                h = ResnetBlock(out_ch, c, name=f"up_{bi}_resnet_{ri}")(h)
            if bi < len(rev) - 1:
                b_, hh, ww, cc = h.shape
                h = jax.image.resize(
                    h, (b_, hh * 2, ww * 2, cc), method="nearest"
                )
                h = _conv(out_ch, 3, f"up_{bi}_upsample", c.dtype)(h)
        h = nn.GroupNorm(
            num_groups=c.norm_num_groups, epsilon=1e-6, dtype=jnp.float32,
            name="conv_norm_out",
        )(h).astype(h.dtype)
        h = nn.silu(h)
        return _conv(c.out_channels, 3, "conv_out", c.dtype)(h)


# ---------------------------------------------------------------------------
# weights
# ---------------------------------------------------------------------------


def _cv(state, key):
    w = np.asarray(state[f"{key}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)}
    if f"{key}.bias" in state:
        out["bias"] = np.asarray(state[f"{key}.bias"]).astype(np.float32)
    return out


def _gn(state, key):
    return {
        "scale": np.asarray(state[f"{key}.weight"]).astype(np.float32),
        "bias": np.asarray(state[f"{key}.bias"]).astype(np.float32),
    }


def _attn_lin(state, key):
    w = np.asarray(state[f"{key}.weight"])
    if w.ndim == 4:  # old checkpoints use 1x1 convs for attention projections
        w = w[:, :, 0, 0]
    out = {"kernel": w.T.astype(np.float32)}
    if f"{key}.bias" in state:
        out["bias"] = np.asarray(state[f"{key}.bias"]).astype(np.float32)
    return out


def _resnet(state, key):
    p = {
        "norm1": _gn(state, f"{key}.norm1"),
        "conv1": _cv(state, f"{key}.conv1"),
        "norm2": _gn(state, f"{key}.norm2"),
        "conv2": _cv(state, f"{key}.conv2"),
    }
    if f"{key}.conv_shortcut.weight" in state:
        p["conv_shortcut"] = _cv(state, f"{key}.conv_shortcut")
    return p


def convert_vae_decoder_state_dict(state: dict, config: VAEConfig) -> dict:
    d = "decoder"
    params: dict[str, Any] = {
        "post_quant_conv": _cv(state, "post_quant_conv"),
        "conv_in": _cv(state, f"{d}.conv_in"),
        "mid_resnet_1": _resnet(state, f"{d}.mid_block.resnets.0"),
        "mid_resnet_2": _resnet(state, f"{d}.mid_block.resnets.1"),
        "mid_attn": {
            "group_norm": _gn(state, f"{d}.mid_block.attentions.0.group_norm"),
            "to_q": _attn_lin(state, f"{d}.mid_block.attentions.0.to_q"),
            "to_k": _attn_lin(state, f"{d}.mid_block.attentions.0.to_k"),
            "to_v": _attn_lin(state, f"{d}.mid_block.attentions.0.to_v"),
            "to_out": _attn_lin(state, f"{d}.mid_block.attentions.0.to_out.0"),
        },
        "conv_norm_out": _gn(state, f"{d}.conv_norm_out"),
        "conv_out": _cv(state, f"{d}.conv_out"),
    }
    n_up = len(config.block_out_channels)
    for bi in range(n_up):
        for ri in range(config.layers_per_block + 1):
            params[f"up_{bi}_resnet_{ri}"] = _resnet(
                state, f"{d}.up_blocks.{bi}.resnets.{ri}"
            )
        if bi < n_up - 1:
            params[f"up_{bi}_upsample"] = _cv(
                state, f"{d}.up_blocks.{bi}.upsamplers.0.conv"
            )
    return params


class VAEDecoderPipeline:
    def __init__(self, config: VAEConfig, params):
        self.config = config
        self.params = params
        self.model = VAEDecoder(config)
        self._decode = jax.jit(
            lambda p, z: self.model.apply({"params": p}, z)
        )

    @classmethod
    def from_weights(
        cls, weights_root: Path, repo: str, latent_channels: int = 4
    ) -> "VAEDecoderPipeline":
        from .weights import load_state_dict

        config = VAEConfig.flux() if latent_channels == 16 else VAEConfig.sd()
        state = load_state_dict(Path(weights_root) / repo / "vae")
        return cls(config, convert_vae_decoder_state_dict(state, config))

    def decode_device(self, latents) -> jax.Array:
        """NHWC latents → (B, H, W, 3) uint8 images, left on device (used
        by the latency protocol to time decode without a host transfer)."""
        img = self._decode(self.params, jnp.asarray(latents, jnp.float32))
        img = jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0, 1)
        return jnp.round(img * 255).astype(jnp.uint8)

    def decode(self, latents) -> np.ndarray:
        """NHWC latents → (B, H, W, 3) uint8 images."""
        return np.asarray(self.decode_device(latents))


def random_decoder_pipeline(latent_channels: int = 4) -> VAEDecoderPipeline:
    """Architecture-faithful decoder with random weights (bf16): identical
    compute cost to the real VAE, no downloads — used by the latency
    protocol (compute_latency --random-vae) and bench.py."""
    import dataclasses

    config = VAEConfig.flux() if latent_channels == 16 else VAEConfig.sd()
    config = dataclasses.replace(config, dtype=jnp.bfloat16)
    model = VAEDecoder(config)
    z0 = jnp.zeros((1, 8, 8, latent_channels), jnp.float32)
    params = jax.jit(lambda k: model.init(k, z0))(jax.random.PRNGKey(7))[
        "params"
    ]
    return VAEDecoderPipeline(config, params)

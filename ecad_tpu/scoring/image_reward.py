"""ImageReward model (BLIP backbone + MLP head) in Flax.

The reference scores candidates with the torch ImageReward-v1.0 package
(ecad/benchmark/score_images.py:31-40), which wraps a BLIP pretrain model
(ViT-L/16 image encoder + BERT text encoder with per-layer cross-attention)
and a 5-layer MLP head, normalizing the raw reward with fixed mean/std.
This module implements the same architecture natively:

* `VisionTransformer` — pre-norm ViT (patch conv, CLS token, learned pos
  embeddings, GELU MLP), parity-tested against transformers' ViTModel.
* `BertCrossEncoder` — post-norm BERT layers with self-attention +
  cross-attention to the image tokens, parity-tested against transformers'
  BertModel(is_decoder, add_cross_attention).
* `ImageRewardModel` — text[CLS] feature → MLP(768→1024→128→64→16→1),
  score = (reward − mean)/std with ImageReward-v1.0's constants.

Weights load from a local ImageReward checkpoint via
`convert_image_reward_state_dict` (keys follow the published
ImageReward.pt layout: blip.visual_encoder.*, blip.text_encoder.*, mlp.*).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ImageReward-v1.0 normalization constants (published with the model)
REWARD_MEAN = 0.16717362830052426
REWARD_STD = 1.0333394966054072

IMAGE_SIZE = 224
IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        d = dict(image_size=16, patch_size=8, hidden_size=32, num_layers=2,
                 num_heads=4)
        d.update(kw)
        return cls(**d)


@dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30524  # BLIP's extended BERT vocab
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    layer_norm_eps: float = 1e-12
    encoder_width: int = 1024  # cross-attention k/v dim (ViT hidden)
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, **kw) -> "BertConfig":
        d = dict(vocab_size=64, hidden_size=32, num_layers=2, num_heads=4,
                 intermediate_size=64, max_position_embeddings=32,
                 encoder_width=32)
        d.update(kw)
        return cls(**d)


class ViTBlock(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x)
        qkv_b, tq = h.shape[0], h.shape[1]
        q = nn.Dense(c.hidden_size, name="q")(h).reshape(b, s, c.num_heads, head_dim)
        k = nn.Dense(c.hidden_size, name="k")(h).reshape(b, s, c.num_heads, head_dim)
        v = nn.Dense(c.hidden_size, name="v")(h).reshape(b, s, c.num_heads, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v).reshape(b, s, c.hidden_size)
        x = x + nn.Dense(c.hidden_size, name="proj")(attn)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(c.hidden_size * c.mlp_ratio, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return x + h


class VisionTransformer(nn.Module):
    config: ViTConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """(B, H, W, 3) normalized pixels → (B, 1+T, d) tokens."""
        c = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            name="patch_embed",
        )(pixels)
        x = x.reshape(b, -1, c.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, c.hidden_size)
        )
        x = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), x], axis=1)
        n_tokens = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, n_tokens, c.hidden_size)
        )
        x = x + pos[:, : x.shape[1]]
        for i in range(c.num_layers):
            x = ViTBlock(c, name=f"block_{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm")(x)


class BertCrossLayer(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, x, ctx, mask_bias):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape

        def mha(name, queries, keys_values, bias):
            q = nn.Dense(c.hidden_size, name=f"{name}_q")(queries)
            k = nn.Dense(c.hidden_size, name=f"{name}_k")(keys_values)
            v = nn.Dense(c.hidden_size, name=f"{name}_v")(keys_values)
            tk = keys_values.shape[1]
            out = jax.nn.dot_product_attention(
                q.reshape(b, s, c.num_heads, head_dim),
                k.reshape(b, tk, c.num_heads, head_dim),
                v.reshape(b, tk, c.num_heads, head_dim),
                bias=bias,
            ).reshape(b, s, c.hidden_size)
            return nn.Dense(c.hidden_size, name=f"{name}_out")(out)

        # post-norm (BERT): residual then LayerNorm
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="self_norm"
        )(x + mha("self", x, x, mask_bias))
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="cross_norm"
        )(x + mha("cross", x, ctx, None))
        h = nn.Dense(c.intermediate_size, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="out_norm")(x + h)


class BertCrossEncoder(nn.Module):
    config: BertConfig

    @nn.compact
    def __call__(self, input_ids, image_tokens, attention_mask=None):
        c = self.config
        b, s = input_ids.shape
        tok = self.param(
            "word_embeddings", nn.initializers.normal(0.02),
            (c.vocab_size, c.hidden_size),
        )
        pos = self.param(
            "position_embeddings", nn.initializers.normal(0.02),
            (c.max_position_embeddings, c.hidden_size),
        )
        # NOTE: BLIP's med-BERT drops token_type embeddings (verified against
        # transformers' BlipTextModel port in tests)
        x = jnp.take(tok, input_ids, axis=0) + pos[None, :s]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embed_norm")(x)
        mask_bias = None
        if attention_mask is not None:
            mask_bias = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[
                :, None, None, :
            ]
        if image_tokens.shape[-1] != c.hidden_size and image_tokens.shape[-1] == c.encoder_width:
            pass  # cross k/v project from encoder_width directly
        for i in range(c.num_layers):
            x = BertCrossLayer(c, name=f"layer_{i}")(x, image_tokens, mask_bias)
        return x


class RewardMLP(nn.Module):
    """ImageReward head: 768 → 1024 → 128 → 64 → 16 → 1."""

    dims: tuple[int, ...] = (1024, 128, 64, 16, 1)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, name=f"fc{i}")(x)
            if i < len(self.dims) - 1:
                x = nn.relu(x)
        return x


class ImageRewardModel(nn.Module):
    vit: ViTConfig
    bert: BertConfig
    mlp_dims: tuple[int, ...] = (1024, 128, 64, 16, 1)

    @nn.compact
    def __call__(self, pixels, input_ids, attention_mask=None):
        img_tokens = VisionTransformer(self.vit, name="visual_encoder")(pixels)
        txt = BertCrossEncoder(self.bert, name="text_encoder")(
            input_ids, img_tokens, attention_mask
        )
        reward = RewardMLP(self.mlp_dims, name="mlp")(txt[:, 0])
        return (reward[:, 0] - REWARD_MEAN) / REWARD_STD


class ImageRewardScorer:
    """Callable scorer for the registry (weights required)."""

    def __init__(
        self, params, tokenizer, vit=None, bert=None,
        mlp_dims=(1024, 128, 64, 16, 1),
    ):
        self.vit = vit or ViTConfig()
        self.bert = bert or BertConfig()
        self.params = params
        self.tokenizer = tokenizer
        self.model = ImageRewardModel(self.vit, self.bert, mlp_dims=mlp_dims)
        self._score = jax.jit(
            lambda p, px, ids, m: self.model.apply({"params": p}, px, ids, m)
        )

    @classmethod
    def from_weights(cls, checkpoint: Path | str, tokenizer_dir: Path | str):
        import torch
        from transformers import AutoTokenizer

        state = torch.load(checkpoint, map_location="cpu", weights_only=True)
        params = convert_image_reward_state_dict(
            {k: v.numpy() for k, v in state.items()}
        )
        return cls(params, AutoTokenizer.from_pretrained(str(tokenizer_dir)))

    def preprocess(self, images: np.ndarray) -> jnp.ndarray:
        """uint8 (N,H,W,3) → normalized float tensor at the ViT's input
        resolution (224² for the real model; bicubic resize)."""
        size = self.vit.image_size
        x = jnp.asarray(images, jnp.float32) / 255.0
        x = jax.image.resize(
            x, (x.shape[0], size, size, 3), method="bicubic"
        )
        mean = jnp.asarray(IMAGE_MEAN)
        std = jnp.asarray(IMAGE_STD)
        return (x - mean) / std

    def __call__(self, images, prompts, prompt_ids=None) -> dict:
        from . import _aggregate

        toks = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=35, return_tensors="np",
        )
        px = self.preprocess(images)
        scores = self._score(
            self.params, px,
            jnp.asarray(toks["input_ids"]),
            jnp.asarray(toks["attention_mask"]),
        )
        return _aggregate(np.asarray(scores), prompts, prompt_ids)


def convert_image_reward_state_dict(state: dict) -> dict:
    """ImageReward.pt keys → our param tree.

    Checkpoint layout (ImageReward-v1.0): `blip.visual_encoder.*` (timm ViT
    naming: patch_embed.proj, cls_token, pos_embed, blocks.N.{norm1,
    attn.qkv, attn.proj, norm2, mlp.fc1, mlp.fc2}, norm), `blip.text_encoder.*`
    (BERT naming with crossattention), `mlp.layers.N`."""

    def t(key):
        return np.asarray(state[key]).T

    def v(key):
        return np.asarray(state[key])

    def ln(key):
        return {"scale": v(f"{key}.weight"), "bias": v(f"{key}.bias")}

    def lin(key):
        return {"kernel": t(f"{key}.weight"), "bias": v(f"{key}.bias")}

    p: dict[str, Any] = {}
    # ---- ViT (timm naming; fused qkv split into thirds) ----
    ve = "blip.visual_encoder"
    w = v(f"{ve}.patch_embed.proj.weight")
    vit: dict[str, Any] = {
        "patch_embed": {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": v(f"{ve}.patch_embed.proj.bias"),
        },
        "cls_token": v(f"{ve}.cls_token"),
        "pos_embed": v(f"{ve}.pos_embed"),
        "norm": ln(f"{ve}.norm"),
    }
    n_layers = max(
        int(k.split(".")[3]) for k in state if k.startswith(f"{ve}.blocks.")
    ) + 1
    for i in range(n_layers):
        b = f"{ve}.blocks.{i}"
        qkv_w = v(f"{b}.attn.qkv.weight")
        d = qkv_w.shape[0] // 3
        qkv_b = (
            v(f"{b}.attn.qkv.bias")
            if f"{b}.attn.qkv.bias" in state
            else np.zeros(3 * d, np.float32)
        )
        vit[f"block_{i}"] = {
            "norm1": ln(f"{b}.norm1"),
            "q": {"kernel": qkv_w[:d].T, "bias": qkv_b[:d]},
            "k": {"kernel": qkv_w[d : 2 * d].T, "bias": qkv_b[d : 2 * d]},
            "v": {"kernel": qkv_w[2 * d :].T, "bias": qkv_b[2 * d :]},
            "proj": lin(f"{b}.attn.proj"),
            "norm2": ln(f"{b}.norm2"),
            "fc1": lin(f"{b}.mlp.fc1"),
            "fc2": lin(f"{b}.mlp.fc2"),
        }
    p["visual_encoder"] = vit

    # ---- BERT text encoder with cross-attention ----
    te = "blip.text_encoder.bert"
    bert: dict[str, Any] = {
        "word_embeddings": v(f"{te}.embeddings.word_embeddings.weight"),
        "position_embeddings": v(f"{te}.embeddings.position_embeddings.weight"),
        "embed_norm": ln(f"{te}.embeddings.LayerNorm"),
    }
    n_layers = max(
        int(k.split(".")[5])
        for k in state
        if k.startswith(f"{te}.encoder.layer.")
    ) + 1
    for i in range(n_layers):
        b = f"{te}.encoder.layer.{i}"
        bert[f"layer_{i}"] = {
            "self_q": lin(f"{b}.attention.self.query"),
            "self_k": lin(f"{b}.attention.self.key"),
            "self_v": lin(f"{b}.attention.self.value"),
            "self_out": lin(f"{b}.attention.output.dense"),
            "self_norm": ln(f"{b}.attention.output.LayerNorm"),
            "cross_q": lin(f"{b}.crossattention.self.query"),
            "cross_k": lin(f"{b}.crossattention.self.key"),
            "cross_v": lin(f"{b}.crossattention.self.value"),
            "cross_out": lin(f"{b}.crossattention.output.dense"),
            "cross_norm": ln(f"{b}.crossattention.output.LayerNorm"),
            "fc1": lin(f"{b}.intermediate.dense"),
            "fc2": lin(f"{b}.output.dense"),
            "out_norm": ln(f"{b}.output.LayerNorm"),
        }
    p["text_encoder"] = bert

    # ---- reward head ----
    mlp_keys = sorted(
        {
            int(k.split(".")[2])
            for k in state
            if k.startswith("mlp.layers.") and k.endswith(".weight")
        }
    )
    p["mlp"] = {
        f"fc{j}": lin(f"mlp.layers.{idx}") for j, idx in enumerate(mlp_keys)
    }
    return p


# ---------------------------------------------------------------------------
# registry hook
# ---------------------------------------------------------------------------

_RESIDENT: Optional[ImageRewardScorer] = None


def _image_reward_scorer(images, prompts, prompt_ids=None) -> dict:
    """Registry entry: resolves weights from ECAD_IMAGE_REWARD_CHECKPOINT /
    ECAD_IMAGE_REWARD_TOKENIZER (local paths; no downloads)."""
    global _RESIDENT
    if _RESIDENT is None:
        import os

        ckpt = os.environ.get("ECAD_IMAGE_REWARD_CHECKPOINT")
        tok = os.environ.get("ECAD_IMAGE_REWARD_TOKENIZER")
        if not ckpt or not tok:
            raise RuntimeError(
                "image_reward scoring needs local weights: set "
                "ECAD_IMAGE_REWARD_CHECKPOINT (ImageReward.pt) and "
                "ECAD_IMAGE_REWARD_TOKENIZER (bert tokenizer dir), or use "
                "--scorer mock"
            )
        _RESIDENT = ImageRewardScorer.from_weights(ckpt, tok)
    return _RESIDENT(images, prompts, prompt_ids)


from . import ScorerRegistry  # noqa: E402

ScorerRegistry.register(_image_reward_scorer, name="image_reward")

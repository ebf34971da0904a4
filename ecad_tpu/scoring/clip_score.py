"""CLIP score in Flax.

The reference shells out to `python -m clip_score` and regex-parses the
output (ecad/benchmark/compute_clip.py:180-214). Protocol (torchmetrics /
clip-score package): score = 100 · max(0, cos(image_embed, text_embed))
averaged over pairs. This module adds the CLIP vision tower (the text tower
lives in ecad_tpu.models.clip) plus the two projection heads; parity of the
vision tower is tested against transformers' CLIPVisionModel.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.clip import CLIPTextConfig, CLIPTextEncoder, convert_clip_state_dict

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, **kw) -> "CLIPVisionConfig":
        d = dict(image_size=16, patch_size=8, hidden_size=32,
                 intermediate_size=64, num_layers=2, num_heads=4,
                 projection_dim=16)
        d.update(kw)
        return cls(**d)


class CLIPVisionLayer(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.config
        from ..models.clip import quick_gelu

        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        q = nn.Dense(c.hidden_size, name="q_proj")(h).reshape(b, s, c.num_heads, head_dim)
        k = nn.Dense(c.hidden_size, name="k_proj")(h).reshape(b, s, c.num_heads, head_dim)
        v = nn.Dense(c.hidden_size, name="v_proj")(h).reshape(b, s, c.num_heads, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v).reshape(b, s, c.hidden_size)
        x = x + nn.Dense(c.hidden_size, name="out_proj")(attn)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return x + h


class CLIPVisionEncoder(nn.Module):
    config: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jax.Array) -> jax.Array:
        """(B, H, W, 3) normalized → pooled (B, hidden)."""
        c = self.config
        b = pixels.shape[0]
        x = nn.Conv(
            c.hidden_size, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), padding="VALID",
            use_bias=False, name="patch_embedding",
        )(pixels)
        x = x.reshape(b, -1, c.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.tile(cls[None, None], (b, 1, 1)), x], axis=1
        )
        n = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n, c.hidden_size),
        )
        x = x + pos[None, : x.shape[1]]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layrnorm")(x)
        for i in range(c.num_layers):
            x = CLIPVisionLayer(c, name=f"layer_{i}")(x)
        pooled = x[:, 0]
        return nn.LayerNorm(
            epsilon=c.layer_norm_eps, name="post_layernorm"
        )(pooled)


def convert_clip_vision_state_dict(state: dict, config: CLIPVisionConfig) -> dict:
    def t(k):
        return np.asarray(state[k]).T

    def v(k):
        return np.asarray(state[k])

    def lin(k):
        out = {"kernel": t(f"{k}.weight")}
        if f"{k}.bias" in state:
            out["bias"] = v(f"{k}.bias")
        return out

    def ln(k):
        return {"scale": v(f"{k}.weight"), "bias": v(f"{k}.bias")}

    pre = "vision_model"
    w = v(f"{pre}.embeddings.patch_embedding.weight")
    params: dict[str, Any] = {
        "patch_embedding": {"kernel": w.transpose(2, 3, 1, 0)},
        "class_embedding": v(f"{pre}.embeddings.class_embedding"),
        "position_embedding": v(f"{pre}.embeddings.position_embedding.weight"),
        "pre_layrnorm": ln(f"{pre}.pre_layrnorm"),
        "post_layernorm": ln(f"{pre}.post_layernorm"),
    }
    for i in range(config.num_layers):
        b = f"{pre}.encoder.layers.{i}"
        params[f"layer_{i}"] = {
            "layer_norm1": ln(f"{b}.layer_norm1"),
            "layer_norm2": ln(f"{b}.layer_norm2"),
            "q_proj": lin(f"{b}.self_attn.q_proj"),
            "k_proj": lin(f"{b}.self_attn.k_proj"),
            "v_proj": lin(f"{b}.self_attn.v_proj"),
            "out_proj": lin(f"{b}.self_attn.out_proj"),
            "fc1": lin(f"{b}.mlp.fc1"),
            "fc2": lin(f"{b}.mlp.fc2"),
        }
    return params


class CLIPScorer:
    """Image–text CLIP score with the clip-score package's protocol."""

    def __init__(
        self,
        vision_config: CLIPVisionConfig,
        text_config: CLIPTextConfig,
        vision_params,
        text_params,
        visual_projection: np.ndarray,  # (hidden_v, proj)
        text_projection: np.ndarray,  # (hidden_t, proj)
        tokenizer,
    ):
        self.vision_config = vision_config
        self.text_config = text_config
        self.tokenizer = tokenizer
        vision = CLIPVisionEncoder(vision_config)
        text = CLIPTextEncoder(text_config)

        def embed(vp, tp, vproj, tproj, pixels, ids):
            img = vision.apply({"params": vp}, pixels) @ vproj
            _, pooled = text.apply({"params": tp}, ids)
            txt = pooled @ tproj
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            return 100.0 * jnp.maximum(jnp.sum(img * txt, axis=-1), 0.0)

        self._score = jax.jit(embed)
        self.vision_params = vision_params
        self.text_params = text_params
        self.vproj = jnp.asarray(visual_projection)
        self.tproj = jnp.asarray(text_projection)

    @classmethod
    def from_weights(cls, model_dir: Path | str) -> "CLIPScorer":
        from transformers import AutoTokenizer

        from ..models.weights import load_state_dict

        model_dir = Path(model_dir)
        state = load_state_dict(model_dir)
        vision_config = CLIPVisionConfig()
        text_config = CLIPTextConfig()
        return cls(
            vision_config,
            text_config,
            convert_clip_vision_state_dict(state, vision_config),
            convert_clip_state_dict(state, text_config),
            np.asarray(state["visual_projection.weight"]).T,
            np.asarray(state["text_projection.weight"]).T,
            AutoTokenizer.from_pretrained(str(model_dir)),
        )

    def preprocess(self, images: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(images, jnp.float32) / 255.0
        size = self.vision_config.image_size
        x = jax.image.resize(
            x, (x.shape[0], size, size, 3), method="bicubic"
        )
        return (x - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)

    def __call__(self, images, prompts, prompt_ids=None) -> dict:
        from . import _aggregate

        toks = self.tokenizer(
            list(prompts), padding="max_length", truncation=True,
            max_length=self.text_config.max_position_embeddings,
            return_tensors="np",
        )
        scores = self._score(
            self.vision_params, self.text_params, self.vproj, self.tproj,
            self.preprocess(np.asarray(images)),
            jnp.asarray(toks["input_ids"]),
        )
        return _aggregate(np.asarray(scores), prompts, prompt_ids)


_RESIDENT: Optional[CLIPScorer] = None


def _clip_scorer(images, prompts, prompt_ids=None) -> dict:
    global _RESIDENT
    if _RESIDENT is None:
        import os

        model_dir = os.environ.get("ECAD_CLIP_MODEL_DIR")
        if not model_dir:
            raise RuntimeError(
                "clip scoring needs local weights: set ECAD_CLIP_MODEL_DIR "
                "to a CLIP model directory (HF layout), or use --scorer mock"
            )
        _RESIDENT = CLIPScorer.from_weights(model_dir)
    return _RESIDENT(images, prompts, prompt_ids)


from . import ScorerRegistry  # noqa: E402

ScorerRegistry.register(_clip_scorer, name="clip")

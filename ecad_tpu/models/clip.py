"""CLIP text encoder in Flax (FLUX's pooled-embedding encoder).

Parity with transformers' CLIPTextModel (openai/clip-vit-large-patch14 as
used by FLUX.1): causal self-attention, quick-GELU MLP, learned position
embeddings, final layer norm; the pooled output is the EOS-token hidden
state (FLUX consumes pooler_output directly,
flux_image_generator.py:103-126). Numerical parity tested against the torch
implementation in tests/test_encoders.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .common import EMBED, HEADS, MLP, with_part


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, **kw) -> "CLIPTextConfig":
        d = dict(
            vocab_size=99, hidden_size=32, intermediate_size=64,
            num_layers=2, num_heads=4, max_position_embeddings=16,
            eos_token_id=98,
        )
        d.update(kw)
        return cls(**d)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, causal_bias):
        c = self.config
        head_dim = c.hidden_size // c.num_heads
        b, s, _ = x.shape

        def ln(name, y):
            return nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=jnp.float32,
                                name=name)(y).astype(y.dtype)

        h = ln("layer_norm1", x)

        def proj(name, y):
            return nn.Dense(
                c.hidden_size, dtype=c.dtype,
                kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, HEADS)),
                name=name,
            )(y)

        q = proj("q_proj", h).reshape(b, s, c.num_heads, head_dim)
        k = proj("k_proj", h).reshape(b, s, c.num_heads, head_dim)
        v = proj("v_proj", h).reshape(b, s, c.num_heads, head_dim)
        attn = jax.nn.dot_product_attention(q, k, v, bias=causal_bias)
        attn = attn.reshape(b, s, c.hidden_size)
        attn = nn.Dense(
            c.hidden_size, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (HEADS, EMBED)),
            name="out_proj",
        )(attn)
        x = x + attn

        h = ln("layer_norm2", x)
        h = nn.Dense(
            c.intermediate_size, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (EMBED, MLP)),
            name="fc1",
        )(h)
        h = quick_gelu(h)
        h = nn.Dense(
            c.hidden_size, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.02), (MLP, EMBED)),
            name="fc2",
        )(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Returns (last_hidden_state, pooled_output)."""
        c = self.config
        tok = self.param(
            "token_embedding",
            with_part(nn.initializers.normal(0.02), (None, EMBED)),
            (c.vocab_size, c.hidden_size), jnp.float32,
        )
        pos = self.param(
            "position_embedding",
            with_part(nn.initializers.normal(0.02), (None, EMBED)),
            (c.max_position_embeddings, c.hidden_size), jnp.float32,
        )
        b, s = input_ids.shape
        x = (jnp.take(tok, input_ids, axis=0) + pos[None, :s]).astype(c.dtype)
        causal = jnp.triu(
            jnp.full((s, s), -jnp.inf, jnp.float32), k=1
        )[None, None]
        for i in range(c.num_layers):
            x = CLIPLayer(c, name=f"layer_{i}")(x, causal)
        x = nn.LayerNorm(
            epsilon=c.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )(x).astype(x.dtype)
        # pooled = hidden state at the (first) EOS token position
        eos_pos = jnp.argmax(
            (input_ids == c.eos_token_id).astype(jnp.int32), axis=1
        )
        pooled = x[jnp.arange(b), eos_pos]
        return x, pooled


def convert_clip_state_dict(state: dict, config: CLIPTextConfig) -> dict:
    def t(key):
        return np.asarray(state[key]).T

    def v(key):
        return np.asarray(state[key])

    def lin(key):
        out = {"kernel": t(f"{key}.weight")}
        if f"{key}.bias" in state:
            out["bias"] = v(f"{key}.bias")
        return out

    def ln(key):
        return {"scale": v(f"{key}.weight"), "bias": v(f"{key}.bias")}

    pre = "text_model"
    params: dict[str, Any] = {
        "token_embedding": v(f"{pre}.embeddings.token_embedding.weight"),
        "position_embedding": v(f"{pre}.embeddings.position_embedding.weight"),
        "final_layer_norm": ln(f"{pre}.final_layer_norm"),
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


class CLIPTextPipeline:
    def __init__(self, config: CLIPTextConfig, params, tokenizer):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.model = CLIPTextEncoder(config)
        self._encode = jax.jit(
            lambda p, ids: self.model.apply({"params": p}, ids)
        )

    @classmethod
    def from_weights(cls, weights_root: Path, repo: str) -> "CLIPTextPipeline":
        from transformers import AutoTokenizer

        from .weights import load_state_dict

        root = Path(weights_root) / repo
        config = CLIPTextConfig()
        params = convert_clip_state_dict(
            load_state_dict(root / "text_encoder"), config
        )
        tokenizer = AutoTokenizer.from_pretrained(str(root / "tokenizer"))
        return cls(config, params, tokenizer)

    def encode_pooled(self, prompt: str) -> np.ndarray:
        toks = self.tokenizer(
            prompt, padding="max_length",
            max_length=self.config.max_position_embeddings,
            truncation=True, return_tensors="np",
        )
        _, pooled = self._encode(self.params, jnp.asarray(toks["input_ids"]))
        return np.asarray(pooled[0])

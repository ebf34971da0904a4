"""T5 v1.1 encoder in Flax (PixArt's and FLUX's text encoder).

The reference gets this from transformers' torch T5EncoderModel inside the
diffusers pipelines (pixart_image_generator.py:98-126,
flux_image_generator.py:103-126). Implemented natively: RMS layernorm
(no mean subtraction, no bias), relative-position-bucket attention bias on
layer 0 shared across layers, gated-GELU MLP, no biases anywhere.
Numerical parity with transformers' torch implementation is tested in
tests/test_encoders.py on a tiny random-init config.

Weights load from a local HF-layout directory (safetensors or .bin);
tokenization uses the fast tokenizer files shipped next to the weights.
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
class T5Config:
    vocab_size: int = 32128
    d_model: int = 4096
    d_kv: int = 64
    d_ff: int = 10240
    num_layers: int = 24
    num_heads: int = 64
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    dtype: Any = jnp.bfloat16

    @classmethod
    def xxl(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls, **kw) -> "T5Config":
        d = dict(
            vocab_size=128, d_model=32, d_kv=8, d_ff=64, num_layers=2,
            num_heads=4, dtype=jnp.float32,
        )
        d.update(kw)
        return cls(**d)


def t5_layer_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def relative_position_buckets(
    qlen: int, klen: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional bucket ids (transformers T5Attention._relative_position_bucket)."""
    ctx = np.arange(qlen)[:, None]
    mem = np.arange(klen)[None, :]
    rel = mem - ctx
    num_buckets //= 2
    ret = (rel > 0).astype(np.int64) * num_buckets
    n = np.abs(rel)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, n, large)


class T5SelfAttention(nn.Module):
    config: T5Config
    has_relative_bias: bool

    @nn.compact
    def __call__(self, x, bias, mask_bias):
        c = self.config
        inner = c.num_heads * c.d_kv
        b, s, _ = x.shape

        def proj(name):
            return nn.Dense(
                inner, use_bias=False, dtype=c.dtype,
                kernel_init=with_part(nn.initializers.normal(0.05), (EMBED, HEADS)),
                name=name,
            )

        q = proj("q")(x).reshape(b, s, c.num_heads, c.d_kv)
        k = proj("k")(x).reshape(b, s, c.num_heads, c.d_kv)
        v = proj("v")(x).reshape(b, s, c.num_heads, c.d_kv)
        # T5 does NOT scale q by 1/sqrt(d); fold the un-scaling in
        q = q * (c.d_kv**0.5)
        total_bias = bias if mask_bias is None else bias + mask_bias
        out = jax.nn.dot_product_attention(q, k, v, bias=total_bias)
        out = out.reshape(b, s, inner)
        return nn.Dense(
            c.d_model, use_bias=False, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.05), (HEADS, EMBED)),
            name="o",
        )(out)


class T5Block(nn.Module):
    config: T5Config
    has_relative_bias: bool

    @nn.compact
    def __call__(self, x, bias, mask_bias):
        c = self.config
        w1 = self.param(
            "attn_layer_norm", nn.initializers.ones_init(), (c.d_model,),
            jnp.float32,
        )
        h = t5_layer_norm(x, w1, c.layer_norm_epsilon)
        x = x + T5SelfAttention(c, self.has_relative_bias, name="attention")(
            h, bias, mask_bias
        )
        w2 = self.param(
            "ff_layer_norm", nn.initializers.ones_init(), (c.d_model,),
            jnp.float32,
        )
        h = t5_layer_norm(x, w2, c.layer_norm_epsilon)
        wi0 = nn.Dense(
            c.d_ff, use_bias=False, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.05), (EMBED, MLP)),
            name="wi_0",
        )(h)
        wi1 = nn.Dense(
            c.d_ff, use_bias=False, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.05), (EMBED, MLP)),
            name="wi_1",
        )(h)
        ff = nn.gelu(wi0, approximate=True) * wi1
        ff = nn.Dense(
            c.d_model, use_bias=False, dtype=c.dtype,
            kernel_init=with_part(nn.initializers.normal(0.05), (MLP, EMBED)),
            name="wo",
        )(ff)
        return x + ff


class T5Encoder(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(
        self, input_ids: jax.Array, attention_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        c = self.config
        emb = self.param(
            "token_embedding",
            with_part(nn.initializers.normal(1.0), (None, EMBED)),
            (c.vocab_size, c.d_model),
            jnp.float32,
        )
        x = jnp.take(emb, input_ids, axis=0).astype(c.dtype)
        s = input_ids.shape[1]

        buckets = relative_position_buckets(
            s, s, c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )
        rel_emb = self.param(
            "relative_attention_bias",
            with_part(nn.initializers.normal(1.0), (None, HEADS)),
            (c.relative_attention_num_buckets, c.num_heads),
            jnp.float32,
        )
        bias = jnp.take(rel_emb, jnp.asarray(buckets), axis=0)  # (s, s, H)
        bias = bias.transpose(2, 0, 1)[None]  # (1, H, s, s)

        mask_bias = None
        if attention_mask is not None:
            mask_bias = ((1.0 - attention_mask.astype(jnp.float32)) * -1e9)[
                :, None, None, :
            ]

        for i in range(c.num_layers):
            x = T5Block(c, i == 0, name=f"layer_{i}")(x, bias, mask_bias)

        wf = self.param(
            "final_layer_norm", nn.initializers.ones_init(), (c.d_model,),
            jnp.float32,
        )
        return t5_layer_norm(x, wf, c.layer_norm_epsilon)


# ---------------------------------------------------------------------------
# weight porting (torch state dict / safetensors → our param tree)
# ---------------------------------------------------------------------------


def convert_t5_state_dict(state: dict, config: T5Config) -> dict:
    """transformers T5EncoderModel state-dict keys → our param tree.
    Linear kernels transpose (torch [out,in] → jax [in,out])."""

    def t(key):
        return np.asarray(state[key]).T

    def v(key):
        return np.asarray(state[key])

    params: dict[str, Any] = {
        "token_embedding": v("shared.weight"),
        "relative_attention_bias": v(
            "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"
        ),
        "final_layer_norm": v("encoder.final_layer_norm.weight"),
    }
    for i in range(config.num_layers):
        pre = f"encoder.block.{i}.layer"
        params[f"layer_{i}"] = {
            "attn_layer_norm": v(f"{pre}.0.layer_norm.weight"),
            "ff_layer_norm": v(f"{pre}.1.layer_norm.weight"),
            "attention": {
                "q": {"kernel": t(f"{pre}.0.SelfAttention.q.weight")},
                "k": {"kernel": t(f"{pre}.0.SelfAttention.k.weight")},
                "v": {"kernel": t(f"{pre}.0.SelfAttention.v.weight")},
                "o": {"kernel": t(f"{pre}.0.SelfAttention.o.weight")},
            },
            "wi_0": {"kernel": t(f"{pre}.1.DenseReluDense.wi_0.weight")},
            "wi_1": {"kernel": t(f"{pre}.1.DenseReluDense.wi_1.weight")},
            "wo": {"kernel": t(f"{pre}.1.DenseReluDense.wo.weight")},
        }
    return params


def load_t5_weights(weights_dir: Path, config: T5Config) -> dict:
    """Load from a local HF-layout text_encoder directory (safetensors
    shards or pytorch_model.bin)."""
    from .weights import load_state_dict

    state = load_state_dict(weights_dir)
    return convert_t5_state_dict(state, config)


class T5EncoderPipeline:
    """Tokenizer + encoder bundle exposing the reference's encode surface."""

    def __init__(self, config: T5Config, params, tokenizer, max_length: int):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.model = T5Encoder(config)
        self._encode = jax.jit(
            lambda p, ids, mask: self.model.apply(
                {"params": p}, ids, attention_mask=mask
            )
        )

    @classmethod
    def from_weights(
        cls, weights_root: Path, repo: str, max_length: int = 120
    ) -> "T5EncoderPipeline":
        root = Path(weights_root) / repo
        enc_dir = root / "text_encoder"
        tok_dir = root / "tokenizer"
        if not enc_dir.exists():
            raise FileNotFoundError(
                f"no text_encoder weights under {root}; place the HF repo "
                "layout there or use random_weights=True"
            )
        from transformers import AutoTokenizer

        config = T5Config.xxl()
        params = load_t5_weights(enc_dir, config)
        tokenizer = AutoTokenizer.from_pretrained(str(tok_dir))
        return cls(config, params, tokenizer, max_length)

    def encode(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        toks = self.tokenizer(
            prompt,
            padding="max_length",
            max_length=self.max_length,
            truncation=True,
            return_tensors="np",
        )
        out = self._encode(
            self.params,
            jnp.asarray(toks["input_ids"]),
            jnp.asarray(toks["attention_mask"]),
        )
        return np.asarray(out[0]), np.asarray(toks["attention_mask"][0])

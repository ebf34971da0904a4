"""Weight loading: local HF-layout checkpoints → Flax param trees.

No network access is assumed anywhere: `weights_root/<repo-name>/` must hold
the HuggingFace repo layout (transformer/, text_encoder/, vae/, tokenizer/…)
with safetensors (preferred) or torch .bin shards. Key mappings cover the
diffusers PixArtTransformer2DModel and FluxTransformer2DModel naming so
off-the-shelf checkpoints drop in.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import numpy as np


def load_state_dict(model_dir: Path | str) -> dict[str, np.ndarray]:
    """Load all tensors from a model directory (handles sharded
    safetensors via the index json, single-file safetensors, and .bin)."""
    model_dir = Path(model_dir)
    state: dict[str, np.ndarray] = {}

    sts = sorted(model_dir.glob("*.safetensors"))
    if sts:
        from safetensors.numpy import load_file

        for f in sts:
            state.update(load_file(str(f)))
        return state

    bins = sorted(model_dir.glob("*.bin"))
    if bins:
        import torch

        for f in bins:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                state[k] = v.float().numpy()
        return state
    raise FileNotFoundError(f"no weight files in {model_dir}")


def _lin(state, key, dtype=np.float32):
    out = {"kernel": np.asarray(state[f"{key}.weight"]).T.astype(dtype)}
    if f"{key}.bias" in state:
        out["bias"] = np.asarray(state[f"{key}.bias"]).astype(dtype)
    return out


class _TrackedState(dict):
    """State dict that records which keys a converter consumed, so a
    mapping bug at full scale (e.g. a missed embedder) fails loudly
    instead of silently dropping tensors."""

    def __init__(self, state):
        super().__init__(state)
        self.used: set[str] = set()

    def __getitem__(self, k):
        self.used.add(k)
        return super().__getitem__(k)


_IGNORABLE = ("num_batches_tracked", "position_ids")


def _audit_consumed(state: "_TrackedState", what: str) -> None:
    left = [
        k
        for k in state
        if k not in state.used and not any(s in k for s in _IGNORABLE)
    ]
    if left:
        raise ValueError(
            f"{what} conversion left {len(left)} checkpoint tensors "
            f"unconsumed (mapping bug or unexpected architecture): "
            f"{left[:8]}{'…' if len(left) > 8 else ''}"
        )


# ---------------------------------------------------------------------------
# PixArt (diffusers PixArtTransformer2DModel)
# ---------------------------------------------------------------------------


def convert_pixart_state_dict(state: dict, config) -> dict:
    """diffusers keys → ecad_tpu.models.pixart.PixArtTransformer params.

    diffusers layout (PixArtTransformer2DModel): pos_embed.proj (patchify
    conv), adaln_single.{emb.timestep_embedder, linear}, caption_projection,
    transformer_blocks.N.{scale_shift_table, attn1, attn2, ff, …},
    scale_shift_table, proj_out.
    """
    state = _TrackedState(state)
    p: dict[str, Any] = {}
    # patchify conv (out, in, kh, kw) → dense kernel (kh*kw*in → out)?
    # Our patch tokens are ordered (p_h, p_w, channel); torch conv weight is
    # (out, in, kh, kw) → transpose to (kh, kw, in, out) then flatten.
    w = np.asarray(state["pos_embed.proj.weight"])
    kh, kw = w.shape[2], w.shape[3]
    kernel = w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0])
    p["patch_proj"] = {
        "kernel": kernel.astype(np.float32),
        "bias": np.asarray(state["pos_embed.proj.bias"]).astype(np.float32),
    }
    p["adaln_single"] = {
        "timestep_embedder": {
            "linear_1": _lin(state, "adaln_single.emb.timestep_embedder.linear_1"),
            "linear_2": _lin(state, "adaln_single.emb.timestep_embedder.linear_2"),
        },
        "linear": _lin(state, "adaln_single.linear"),
    }
    if "adaln_single.emb.resolution_embedder.linear_1.weight" in state:
        p["adaln_single"]["resolution_embedder"] = {
            "linear_1": _lin(state, "adaln_single.emb.resolution_embedder.linear_1"),
            "linear_2": _lin(state, "adaln_single.emb.resolution_embedder.linear_2"),
        }
        p["adaln_single"]["aspect_ratio_embedder"] = {
            "linear_1": _lin(state, "adaln_single.emb.aspect_ratio_embedder.linear_1"),
            "linear_2": _lin(state, "adaln_single.emb.aspect_ratio_embedder.linear_2"),
        }
    p["caption_projection"] = {
        "linear_1": _lin(state, "caption_projection.linear_1"),
        "linear_2": _lin(state, "caption_projection.linear_2"),
    }
    for i in range(config.num_blocks):
        b = f"transformer_blocks.{i}"

        def attn(name):
            d = {
                "to_q": _lin(state, f"{b}.{name}.to_q"),
                "to_k": _lin(state, f"{b}.{name}.to_k"),
                "to_v": _lin(state, f"{b}.{name}.to_v"),
                "to_out": _lin(state, f"{b}.{name}.to_out.0"),
            }
            return d

        p[f"block_{i}"] = {
            "scale_shift_table": np.asarray(
                state[f"{b}.scale_shift_table"]
            ).astype(np.float32),
            "attn1": attn("attn1"),
            "attn2": attn("attn2"),
            "ff": {
                "proj_in": _lin(state, f"{b}.ff.net.0.proj"),
                "proj_out": _lin(state, f"{b}.ff.net.2"),
            },
        }
    p["scale_shift_table"] = np.asarray(state["scale_shift_table"]).astype(
        np.float32
    )
    p["proj_out"] = _lin(state, "proj_out")
    _audit_consumed(state, "PixArt transformer")
    return p


def _storage_quantize(params: dict, config, init_params_fn) -> dict:
    """For `quant="int8_w"` configs, convert the float param tree into
    the int8 weight-storage layout the model's apply expects (int8
    `kernel` + fp32 per-channel `scale` wherever the model instantiates
    an Int8Dense). The target structure comes from an abstract
    `eval_shape` of the random init — no weight-sized compute."""
    if getattr(config, "quant", None) not in ("int8_w", "int8_w_static"):
        return params
    import jax
    from flax import linen as nn

    from ..ops.quant import quantize_params_tree

    ref = nn.meta.unbox(
        jax.eval_shape(lambda: init_params_fn(config, 0)[1])
    )
    return quantize_params_tree(params, ref)


def load_pixart_params(weights_root: Path | str, repo: str, config) -> dict:
    from .pixart import init_params

    model_dir = Path(weights_root) / repo / "transformer"
    params = convert_pixart_state_dict(load_state_dict(model_dir), config)
    return _storage_quantize(params, config, init_params)


# ---------------------------------------------------------------------------
# FLUX (diffusers FluxTransformer2DModel)
# ---------------------------------------------------------------------------


def convert_flux_state_dict(state: dict, config) -> dict:
    state = _TrackedState(state)
    p: dict[str, Any] = {
        "x_embedder": _lin(state, "x_embedder"),
        "context_embedder": _lin(state, "context_embedder"),
        "timestep_embedder": {
            "linear_1": _lin(state, "time_text_embed.timestep_embedder.linear_1"),
            "linear_2": _lin(state, "time_text_embed.timestep_embedder.linear_2"),
        },
        "text_embedder": {
            "linear_1": _lin(state, "time_text_embed.text_embedder.linear_1"),
            "linear_2": _lin(state, "time_text_embed.text_embedder.linear_2"),
        },
        "norm_out_linear": _lin(state, "norm_out.linear"),
        "proj_out": _lin(state, "proj_out"),
    }
    if "time_text_embed.guidance_embedder.linear_1.weight" in state:
        p["guidance_embedder"] = {
            "linear_1": _lin(state, "time_text_embed.guidance_embedder.linear_1"),
            "linear_2": _lin(state, "time_text_embed.guidance_embedder.linear_2"),
        }

    def qknorm(prefix, q_key, k_key):
        return {
            "q_scale": np.asarray(state[f"{prefix}.{q_key}.weight"]).astype(
                np.float32
            ),
            "k_scale": np.asarray(state[f"{prefix}.{k_key}.weight"]).astype(
                np.float32
            ),
        }

    for i in range(config.num_blocks):
        b = f"transformer_blocks.{i}"
        p[f"block_{i}"] = {
            "norm1": {"linear": _lin(state, f"{b}.norm1.linear")},
            "norm1_context": {"linear": _lin(state, f"{b}.norm1_context.linear")},
            "attn": {
                "to_q": _lin(state, f"{b}.attn.to_q"),
                "to_k": _lin(state, f"{b}.attn.to_k"),
                "to_v": _lin(state, f"{b}.attn.to_v"),
                "add_q_proj": _lin(state, f"{b}.attn.add_q_proj"),
                "add_k_proj": _lin(state, f"{b}.attn.add_k_proj"),
                "add_v_proj": _lin(state, f"{b}.attn.add_v_proj"),
                "to_out": _lin(state, f"{b}.attn.to_out.0"),
                "to_add_out": _lin(state, f"{b}.attn.to_add_out"),
                "norm_qk": qknorm(f"{b}.attn", "norm_q", "norm_k"),
                "norm_added_qk": qknorm(
                    f"{b}.attn", "norm_added_q", "norm_added_k"
                ),
            },
            "ff_in": _lin(state, f"{b}.ff.net.0.proj"),
            "ff_out": _lin(state, f"{b}.ff.net.2"),
            "ff_context_in": _lin(state, f"{b}.ff_context.net.0.proj"),
            "ff_context_out": _lin(state, f"{b}.ff_context.net.2"),
        }
    for i in range(config.num_single_blocks):
        b = f"single_transformer_blocks.{i}"
        p[f"single_block_{i}"] = {
            "norm": {"linear": _lin(state, f"{b}.norm.linear")},
            "attn": {
                "to_q": _lin(state, f"{b}.attn.to_q"),
                "to_k": _lin(state, f"{b}.attn.to_k"),
                "to_v": _lin(state, f"{b}.attn.to_v"),
                "norm_qk": qknorm(f"{b}.attn", "norm_q", "norm_k"),
            },
            "proj_mlp": _lin(state, f"{b}.proj_mlp"),
            "proj_out": _lin(state, f"{b}.proj_out"),
        }
    _audit_consumed(state, "FLUX transformer")
    return p


def load_flux_params(weights_root: Path | str, repo: str, config) -> dict:
    from .flux import init_flux_params

    model_dir = Path(weights_root) / repo / "transformer"
    params = convert_flux_state_dict(load_state_dict(model_dir), config)
    return _storage_quantize(params, config, init_flux_params)

"""PixArt image generators (α and Σ).

Reference: ecad/image_generators/pixart_image_generator.py (+ alpha/sigma
subclasses). The T5 encoder, transformer and VAE load from a local
`weights_root` tree; `random_weights=True` runs the exact architecture with
random parameters for shape/latency/search-loop work without any downloads.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import PixArtConfig, init_params
from ..pipelines import PixArtPipeline, PixArtPipelineConfig
from ..schedules.pixart import PixArtCacheSchedule
from .base import ImageGenerator


class PixArtImageGenerator(ImageGenerator):
    schedule_cls = PixArtCacheSchedule
    default_pipeline = "pixart_alpha"
    guidance_scale = 4.5  # fixed (pixart_image_generator.py:377)
    text_len = 120
    caption_dim = 4096

    def model_config(self) -> PixArtConfig:
        if "1024" in self.transformer_weights:
            return PixArtConfig(
                sample_size=128,
                use_additional_conditions=True,
                quant=self.quant,
            )
        return PixArtConfig(sample_size=(self.height // 8), quant=self.quant)

    # -- pipelines ---------------------------------------------------------

    def create_encoder_pipeline(self):
        if self._encoder is not None:
            return self._encoder
        if self.random_weights or self.weights_root is None:
            self._encoder = _HashEncoder(self.text_len, self.caption_dim)
        else:
            from ..models.t5 import T5EncoderPipeline

            self._encoder = T5EncoderPipeline.from_weights(
                self.weights_root, self.pipeline_weights or self.transformer_weights,
                max_length=self.text_len,
            )
        return self._encoder

    def create_diffusion_pipeline(self) -> PixArtPipeline:
        if self._pipeline is not None:
            return self._pipeline
        config = self.model_config()
        if self._params is not None:
            params = self._params
        elif self.random_weights or self.weights_root is None:
            _, params = init_params(config, 0)
        else:
            from ..models.weights import load_pixart_params

            params = load_pixart_params(
                self.weights_root, self.transformer_weights, config
            )
        from ..models.common import serving_cast

        params = serving_cast(params, config.dtype)
        self._params = params
        if (
            config.quant in ("int8_static", "int8_w_static")
            and config.act_scales is None
        ):
            import dataclasses

            config = dataclasses.replace(
                config, act_scales=self._calibrate_static_scales(
                    config, params
                ),
            )
        pcfg = PixArtPipelineConfig(
            model=config,
            num_inference_steps=self.num_inference_steps,
            guidance_scale=self.guidance_scale,
        )
        from ..pipelines.registry import pipeline_from_config

        cls, kwargs = pipeline_from_config(
            self.pipeline_name or "pixart_alpha", self.pipeline_kwargs
        )
        self._pipeline = cls(
            pcfg, params, self.cache_schedule,
            dit_schedule=self.dit_schedule, **kwargs,
        )
        return self._pipeline

    def _calibrate_static_scales(self, config, params) -> tuple:
        """Per-site activation amax table for quant="int8_static"
        (ops/quant.py calibrate_dense_amax): one bf16 forward at three
        representative denoise timesteps, with REAL encoder embeddings
        ("" — the CFG negative every generation runs anyway — plus a
        generic prompt) so the ranges reflect the session's actual text
        statistics, not synthetic noise. ~4 min on the v5e at 1024²,
        amortized over the serving session; recalibrate by constructing
        a fresh generator."""
        import dataclasses

        from ..models.pixart import (
            PixArtTransformer,
            full_step_mask,
            init_cache,
        )
        from ..ops.quant import calibrate_dense_amax, merge_amax

        base_quant = "int8_w" if config.quant == "int8_w_static" else None
        base = dataclasses.replace(
            config, quant=base_quant, act_scales=None
        )
        model = PixArtTransformer(base)
        enc = self.create_encoder_pipeline()
        embeds = [enc.encode("")[0], enc.encode("a detailed photograph")[0]]
        text = jnp.stack([jnp.asarray(e, base.dtype) for e in embeds])
        b = text.shape[0]
        noise = jax.random.normal(
            jax.random.PRNGKey(0),
            (b, base.sample_size, base.sample_size, base.in_channels),
        ).astype(base.dtype)
        cache = init_cache(base, b)
        mask = full_step_mask(base)
        kwargs = {}
        if base.use_additional_conditions:
            size = float(base.sample_size * 8)
            kwargs = dict(
                resolution=jnp.broadcast_to(
                    jnp.array([[size, size]]), (b, 2)
                ),
                aspect_ratio=jnp.ones((b, 1)),
            )
        table = merge_amax(
            *(
                calibrate_dense_amax(
                    model, {"params": params}, noise, text,
                    jnp.full((b,), tv), cache, mask, **kwargs,
                )
                for tv in (999.0, 500.0, 20.0)
            )
        )
        jax.clear_caches()  # drop the calibration program + its buffers
        return tuple(sorted(table.items()))

    # -- encoding ----------------------------------------------------------

    def encode_prompts(self, prompts: Sequence[str]) -> list[dict[str, Any]]:
        """Returns reference embedding keys (types.py:13-18): prompt_embeds,
        prompt_attention_mask, negative_prompt_embeds,
        negative_prompt_attention_mask. Negative = empty prompt ""
        (pixart_image_generator.py:98-126)."""
        enc = self.create_encoder_pipeline()
        neg_e, neg_m = enc.encode("")
        out = []
        for i, p in enumerate(prompts):
            e, m = enc.encode(p)
            out.append(
                {
                    "name": f"{i:03d}__prompt_seed:{self.start_seed:03}",
                    "prompt_embeds": e,
                    "prompt_attention_mask": m,
                    "negative_prompt_embeds": neg_e,
                    "negative_prompt_attention_mask": neg_m,
                }
            )
        return out

    # -- generation --------------------------------------------------------

    def _generate_latents(
        self, embeddings: list[dict[str, Any]], seed: int
    ) -> jax.Array:
        pipe = self.create_diffusion_pipeline()
        c = pipe.config.model
        text = jnp.stack(
            [jnp.asarray(e["prompt_embeds"], c.dtype) for e in embeddings]
        )
        neg = jnp.stack(
            [
                jnp.asarray(e["negative_prompt_embeds"], c.dtype)
                for e in embeddings
            ]
        )
        tm = nm = None
        if "prompt_attention_mask" in embeddings[0]:
            tm = jnp.stack(
                [jnp.asarray(e["prompt_attention_mask"]) for e in embeddings]
            )
            nm = jnp.stack(
                [
                    jnp.asarray(e["negative_prompt_attention_mask"])
                    for e in embeddings
                ]
            )
        return pipe.generate_latents(
            text, neg, seed=seed, text_mask=tm, neg_mask=nm,
            mode=self.execution_mode,
        )

    def _ensure_vae(self):
        if self._vae is not None:
            return self._vae
        from ..models.vae import VAEDecoderPipeline

        if not self.random_weights and self.weights_root is not None:
            self._vae = VAEDecoderPipeline.from_weights(
                self.weights_root,
                self.pipeline_weights or self.transformer_weights,
            )
        elif self.use_random_vae:
            from ..models.vae import random_decoder_pipeline

            self._vae = random_decoder_pipeline(latent_channels=4)
        return self._vae

    def decode_latents_device(self, latents):
        vae = self._ensure_vae()
        if vae is not None:
            return vae.decode_device(latents)
        return super().decode_latents_device(latents)

    def decode_latents(self, latents) -> np.ndarray:
        vae = self._ensure_vae()
        if vae is not None and not self.use_random_vae:
            return vae.decode(latents)
        from ..genetic.evaluate import latents_to_uint8

        return latents_to_uint8(latents)


class PixArtAlphaImageGenerator(PixArtImageGenerator):
    """Weights per reference pixart_alpha_image_generator.py:18-20."""

    default_transformer_weights = "PixArt-alpha/PixArt-XL-2-256x256"
    default_pipeline_weights = "PixArt-alpha/PixArt-XL-2-1024-MS"
    default_pipeline = "pixart_alpha"


class PixArtSigmaImageGenerator(PixArtImageGenerator):
    """Weights per reference pixart_sigma_image_generator.py:18-20."""

    default_transformer_weights = "PixArt-alpha/PixArt-Sigma-XL-2-256x256"
    default_pipeline_weights = "PixArt-alpha/PixArt-Sigma-XL-2-1024-MS"
    default_pipeline = "pixart_sigma"


class TinyPixArtImageGenerator(PixArtImageGenerator):
    """2-block, 8×8-latent smoke-test generator (always random weights) —
    the registry-level counterpart of the reference's Identity-placeholder
    fixtures (SURVEY.md §4). Keeps every CLI drivable in seconds on CPU."""

    default_transformer_weights = "tiny"
    default_pipeline = "pixart_alpha"
    num_blocks = 2
    default_num_inference_steps = 4
    text_len = 8
    caption_dim = 32

    def __init__(self, *args, **kwargs):
        kwargs["random_weights"] = True
        super().__init__(*args, **kwargs)

    def model_config(self) -> PixArtConfig:
        return PixArtConfig.tiny(dtype=jnp.float32, quant=self.quant)

    def _load_schedule_file(self, schedule_path):
        sched = super()._load_schedule_file(schedule_path)
        if sched.num_blocks != self.num_blocks:
            raise ValueError(
                f"schedule has {sched.num_blocks} blocks; tiny model has "
                f"{self.num_blocks}"
            )
        return sched


class _HashEncoder:
    """Deterministic stand-in encoder: stable pseudo-embeddings from prompt
    content. Keeps every CLI and the search loop drivable without T5
    weights; replaced by the real encoder when weights_root is provided."""

    def __init__(self, text_len: int, dim: int):
        self.text_len = text_len
        self.dim = dim

    def encode(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        seed = int.from_bytes(
            hashlib.sha256(prompt.encode()).digest()[:4], "little"
        )
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((self.text_len, self.dim), dtype=np.float32)
        n_tokens = max(1, min(self.text_len, len(prompt.split()) + 1))
        mask = np.zeros((self.text_len,), dtype=np.int32)
        mask[:n_tokens] = 1
        emb[n_tokens:] = 0.0
        return emb, mask

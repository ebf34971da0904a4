"""FLUX.1-dev image generator.

Reference: ecad/image_generators/flux_image_generator.py — FLUX.1-dev bf16,
CLIP+T5 dual encoder (:103-126), defaults 19+38 blocks / 20 steps / 256² /
guidance 5 (:31-36), per-schedule height/width/guidance from the schedule
config (:62-69), embeddings {prompt_embeds, pooled_prompt_embeds, text_ids?}
(:154-240). text_ids is always recomputable and never needs dumping.
"""

from __future__ import annotations

import hashlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.flux import FluxConfig, init_flux_params
from ..pipelines.flux_pipeline import FluxPipeline, FluxPipelineConfig
from ..schedules.flux import FluxCacheSchedule
from .base import ImageGenerator


class FluxImageGenerator(ImageGenerator):
    schedule_cls = FluxCacheSchedule
    supports_cache_dtype = True
    default_transformer_weights = "black-forest-labs/FLUX.1-dev"
    default_pipeline_weights = "black-forest-labs/FLUX.1-dev"
    default_pipeline = "flux"
    num_blocks = 19
    num_single_blocks = 38
    guidance_scale = 5.0
    text_len = 512
    joint_dim = 4096
    pooled_dim = 768

    @classmethod
    def allow_guidance_override(cls) -> bool:
        return True  # flux guidance is a per-schedule config value

    def _default_schedule(self) -> FluxCacheSchedule:
        return FluxCacheSchedule.default(
            num_inference_steps=self.num_inference_steps,
            num_blocks=self.num_blocks,
            num_single_blocks=self.num_single_blocks,
            top_level_config={
                "height": self.height,
                "width": self.width,
                "guidance_scale": self.guidance_scale,
            },
        )

    def model_config(self) -> FluxConfig:
        cdt = None
        if self.cache_dtype is not None:
            import jax.numpy as jnp

            cdt = jnp.dtype(self.cache_dtype)
        return FluxConfig(quant=self.quant, cache_dtype=cdt)

    def create_encoder_pipeline(self):
        if self._encoder is not None:
            return self._encoder
        if self.random_weights or self.weights_root is None:
            self._encoder = _FluxHashEncoder(
                self.text_len, self.joint_dim, self.pooled_dim
            )
        else:
            from ..models.t5 import T5EncoderPipeline
            from ..models.clip import CLIPTextPipeline

            self._encoder = _FluxRealEncoder(
                T5EncoderPipeline.from_weights(
                    self.weights_root, self.transformer_weights,
                    max_length=self.text_len,
                ),
                CLIPTextPipeline.from_weights(
                    self.weights_root, self.transformer_weights
                ),
            )
        return self._encoder

    def create_diffusion_pipeline(self) -> FluxPipeline:
        if self._pipeline is not None:
            return self._pipeline
        config = self.model_config()
        if self._params is not None:
            params = self._params
        elif self.random_weights or self.weights_root is None:
            _, params = init_flux_params(config, 0)
        else:
            from ..models.weights import load_flux_params

            params = load_flux_params(
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
        pcfg = FluxPipelineConfig(
            model=config,
            num_inference_steps=self.num_inference_steps,
            guidance_scale=self.guidance_scale,
            height=self.height,
            width=self.width,
        )
        self._pipeline = FluxPipeline(pcfg, params, self.cache_schedule)
        return self._pipeline

    def _calibrate_static_scales(self, config, params) -> tuple:
        """Per-site activation amax table for the static quant modes
        (ops/quant.py calibrate_dense_amax) — the FLUX port of
        PixArtImageGenerator._calibrate_static_scales: one forward at
        three representative flow-matching times (t = 1.0, 0.5, 0.05 in
        the transformer's [0,1] sigma convention) with real encoder
        embeddings ("" + a generic prompt).

        "int8_static" calibrates the bf16 (quant=None) model.
        "int8_w_static" calibrates ON the int8_w model — the only FLUX
        variant whose full-width weights fit one chip — recording
        Int8Dense inputs at the same sites (the activation statistic is
        the same either way; the weights' own quantization error is
        second-order on an amax)."""
        import dataclasses

        from ..models.flux import (
            FluxTransformer,
            full_flux_mask,
            init_flux_cache,
        )
        from ..ops.quant import calibrate_dense_amax, merge_amax

        base_quant = "int8_w" if config.quant == "int8_w_static" else None
        base = dataclasses.replace(
            config, quant=base_quant, act_scales=None
        )
        model = FluxTransformer(base)
        enc = self.create_encoder_pipeline()
        pairs = [enc.encode(""), enc.encode("a detailed photograph")]
        txt = jnp.stack([jnp.asarray(e, base.dtype) for e, _ in pairs])
        pooled = jnp.stack([jnp.asarray(p, base.dtype) for _, p in pairs])
        b = txt.shape[0]
        gh, gw = self.height // 16, self.width // 16
        noise = jax.random.normal(
            jax.random.PRNGKey(0), (b, gh * gw, base.in_channels)
        ).astype(base.dtype)
        guidance = (
            jnp.full((b,), self.guidance_scale, jnp.float32)
            if base.guidance_embeds
            else None
        )
        table = merge_amax(
            *(
                calibrate_dense_amax(
                    model, {"params": params}, noise, txt, pooled,
                    jnp.full((b,), tv, jnp.float32), guidance,
                    init_flux_cache(), full_flux_mask(base), (gh, gw),
                )
                for tv in (1.0, 0.5, 0.05)
            )
        )
        jax.clear_caches()  # drop the calibration program + its buffers
        return tuple(sorted(table.items()))

    def encode_prompts(self, prompts: Sequence[str]) -> list[dict[str, Any]]:
        enc = self.create_encoder_pipeline()
        out = []
        for i, p in enumerate(prompts):
            embeds, pooled = enc.encode(p)
            out.append(
                {
                    "name": f"{i:03d}__prompt_seed:{self.start_seed:03}",
                    "prompt_embeds": embeds,
                    "pooled_prompt_embeds": pooled,
                }
            )
        return out

    def _generate_latents(
        self, embeddings: list[dict[str, Any]], seed: int
    ) -> jax.Array:
        pipe = self.create_diffusion_pipeline()
        dt = pipe.config.model.dtype
        txt = jnp.stack(
            [jnp.asarray(e["prompt_embeds"], dt) for e in embeddings]
        )
        pooled = jnp.stack(
            [jnp.asarray(e["pooled_prompt_embeds"], dt) for e in embeddings]
        )
        return pipe.generate_latents(
            txt, pooled, seed=seed, mode=self.execution_mode
        )

    def _ensure_vae(self):
        if self._vae is not None:
            return self._vae
        if not self.random_weights and self.weights_root is not None:
            from ..models.vae import VAEDecoderPipeline

            self._vae = VAEDecoderPipeline.from_weights(
                self.weights_root, self.transformer_weights,
                latent_channels=16,
            )
        elif self.use_random_vae:
            from ..models.vae import random_decoder_pipeline

            self._vae = random_decoder_pipeline(latent_channels=16)
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


class TinyFluxImageGenerator(FluxImageGenerator):
    """Tiny FLUX test double (2+3 blocks, 32×32 images)."""

    num_blocks = 2
    num_single_blocks = 3
    default_num_inference_steps = 4
    text_len = 8
    joint_dim = 32
    pooled_dim = 24
    height = 32
    width = 32

    def __init__(self, *args, **kwargs):
        kwargs["random_weights"] = True
        super().__init__(*args, **kwargs)

    def model_config(self) -> FluxConfig:
        cdt = None
        if self.cache_dtype is not None:
            cdt = jnp.dtype(self.cache_dtype)
        return FluxConfig.tiny(
            dtype=jnp.float32, quant=self.quant, cache_dtype=cdt
        )

    def _load_schedule_file(self, schedule_path):
        import numpy as _np

        sched = super()._load_schedule_file(schedule_path)
        if sched.num_blocks != self.num_blocks:
            raise ValueError(
                f"schedule has {sched.num_blocks} blocks; tiny flux has "
                f"{self.num_blocks}"
            )
        return sched


class _FluxHashEncoder:
    """Deterministic stand-in for the CLIP+T5 encoder stack."""

    def __init__(self, text_len: int, joint_dim: int, pooled_dim: int):
        self.text_len = text_len
        self.joint_dim = joint_dim
        self.pooled_dim = pooled_dim

    def encode(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        seed = int.from_bytes(
            hashlib.sha256(prompt.encode()).digest()[:4], "little"
        )
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal(
            (self.text_len, self.joint_dim), dtype=np.float32
        )
        pooled = rng.standard_normal((self.pooled_dim,), dtype=np.float32)
        return emb, pooled


class _FluxRealEncoder:
    def __init__(self, t5, clip):
        self.t5 = t5
        self.clip = clip

    def encode(self, prompt: str) -> tuple[np.ndarray, np.ndarray]:
        embeds, _mask = self.t5.encode(prompt)
        pooled = self.clip.encode_pooled(prompt)
        return embeds, pooled

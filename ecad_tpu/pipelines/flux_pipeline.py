"""FLUX denoising pipeline (flow-match Euler, embedded guidance).

Reference counterpart: diffusers FluxPipeline driven through
ecad/image_generators/flux_image_generator.py (guidance 5, 20 steps,
callback_on_step_end for cursor advancement — replaced here by static
schedule specialization, like the PixArt pipeline). FLUX.1-dev is
guidance-distilled: no CFG batch doubling; guidance enters as an embedding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from ..models.flux import (
    FluxConfig,
    FluxTransformer,
    flux_step_masks,
    full_flux_mask,
    pack_latents,
    unpack_latents,
)
from ..schedules.flux import FluxCacheSchedule
from .samplers import FlowMatchSchedule, flow_step, make_flow_schedule


@dataclass(frozen=True)
class FluxPipelineConfig:
    model: FluxConfig
    num_inference_steps: int = 20
    guidance_scale: float = 5.0
    height: int = 256
    width: int = 256

    @property
    def grid_hw(self) -> tuple[int, int]:
        return (self.height // 16, self.width // 16)

    @property
    def image_seq_len(self) -> int:
        gh, gw = self.grid_hw
        return gh * gw


class FluxPipeline:
    def __init__(
        self,
        config: FluxPipelineConfig,
        params: Any,
        schedule: Optional[FluxCacheSchedule] = None,
    ) -> None:
        self.config = config
        self.params = params
        self.model = FluxTransformer(config.model)
        if schedule is None:
            schedule = FluxCacheSchedule.default(
                num_inference_steps=config.num_inference_steps,
                num_blocks=config.model.num_blocks,
                num_single_blocks=config.model.num_single_blocks,
            )
        if schedule.num_inference_steps != config.num_inference_steps:
            raise ValueError(
                f"schedule steps {schedule.num_inference_steps} != pipeline "
                f"{config.num_inference_steps}"
            )
        self.schedule = schedule
        self.masks = flux_step_masks(schedule, config.model)
        self.flow: FlowMatchSchedule = make_flow_schedule(
            config.num_inference_steps, config.image_seq_len
        )
        self._unrolled_cache: dict[tuple, Callable] = {}
        self._step_fns: dict[tuple, Callable] = {}

    def set_schedule(self, schedule: Optional[FluxCacheSchedule] = None) -> None:
        """Swap schedules on a resident pipeline; compiled step programs are
        keyed by mask and survive, unrolled programs are dropped."""
        if schedule is None:
            schedule = FluxCacheSchedule.default(
                num_inference_steps=self.config.num_inference_steps,
                num_blocks=self.config.model.num_blocks,
                num_single_blocks=self.config.model.num_single_blocks,
            )
        if schedule.num_inference_steps != self.config.num_inference_steps:
            raise ValueError(
                f"schedule steps {schedule.num_inference_steps} != pipeline "
                f"{self.config.num_inference_steps}"
            )
        self.schedule = schedule
        self.masks = flux_step_masks(schedule, self.config.model)
        self._unrolled_cache.clear()

    def _velocity(self, params, x, txt, pooled, t_value, cache, mask):
        b = x.shape[0]
        t = jnp.full((b,), t_value, jnp.float32) / 1000.0
        g = (
            jnp.full((b,), self.config.guidance_scale, jnp.float32)
            if self.config.model.guidance_embeds
            else None
        )
        return self.model.apply(
            {"params": params}, x, txt, pooled, t, g, cache, mask,
            self.config.grid_hw,
        )

    def build_denoise_fn(self, donate: bool = True) -> Callable:
        def denoise(params, noise, txt, pooled):
            x = noise
            cache: dict = {}
            for i in range(self.flow.num_steps):
                v, cache = self._velocity(
                    params, x, txt, pooled, float(self.flow.timesteps[i]),
                    cache, self.masks[i],
                )
                x = flow_step(self.flow, i, v, x)
            return x

        return jax.jit(denoise, donate_argnums=(1,) if donate else ())

    def denoise_stepwise(self, noise, txt, pooled, masks=None):
        """`masks` overrides the pipeline's schedule for this call (see
        PixArtPipeline.denoise_stepwise — keeps shared pipelines
        immutable under population eval)."""
        if masks is None:
            masks = self.masks
        x = noise
        cache: dict = {}
        for i in range(self.flow.num_steps):
            fn = self._get_step_fn(i, masks[i], i == 0)
            x, cache = fn(self.params, x, txt, pooled, cache)
        return x

    def _get_step_fn(self, step_index: int, mask, first: bool) -> Callable:
        key = (step_index, mask, first)
        if key in self._step_fns:
            return self._step_fns[key]
        flow = self.flow

        def step(params, x, txt, pooled, cache):
            v, cache = self._velocity(
                params, x, txt, pooled, float(flow.timesteps[step_index]),
                cache, mask,
            )
            return flow_step(flow, step_index, v, x), cache

        # cache dict is empty on the first step — donating it is a no-op
        fn = jax.jit(step, donate_argnums=(1,) if first else (1, 4))
        self._step_fns[key] = fn
        return fn

    def generate_latents(
        self,
        txt: jax.Array,
        pooled: jax.Array,
        *,
        seed: int = 0,
        mode: str = "unrolled",
    ) -> jax.Array:
        """Returns UNPACKED latents (B, H/8, W/8, 16)."""
        c = self.config
        b = txt.shape[0]
        gh, gw = c.grid_hw
        noise = jax.random.normal(
            jax.random.PRNGKey(seed),
            (b, c.image_seq_len, c.model.in_channels),
        ).astype(c.model.dtype)
        if mode == "unrolled":
            key = (b, txt.shape)
            if key not in self._unrolled_cache:
                self._unrolled_cache[key] = self.build_denoise_fn()
            packed = self._unrolled_cache[key](self.params, noise, txt, pooled)
        elif mode == "stepwise":
            packed = self.denoise_stepwise(noise, txt, pooled)
        else:
            raise ValueError(f"unknown mode {mode!r}")
        return unpack_latents(packed, gh, gw)


class SharedFluxStepper:
    """Cross-candidate compiled-step sharing (see SharedModelStepper)."""

    def __init__(self, pipeline: FluxPipeline):
        self.pipeline = pipeline

    def denoise(self, masks, noise, txt, pooled):
        # masks as argument — no shared-state mutation (see
        # SharedModelStepper.denoise)
        return self.pipeline.denoise_stepwise(noise, txt, pooled, masks=masks)


class FluxPopulationDenoiser:
    """ONE compiled program for an entire FLUX candidate population: masks
    arrive as a traced (steps, blocks+single_blocks, 3) bool array (lax.cond
    per component), with the flow-match Euler loop as a lax.scan over
    (mask_row, timestep, dt). See PopulationDenoiser for the rationale."""

    def __init__(self, pipeline: FluxPipeline):
        self.pipeline = pipeline
        self._fn_cache: dict[tuple, Callable] = {}

    def _build(self, return_cache: bool = False) -> Callable:
        """return_cache=True also returns the final carried cache pytree —
        used by the full-width dryrun/evidence paths to assert the cache
        shardings the scan actually maintained (a plain denoise drops it)."""
        p = self.pipeline
        import numpy as np

        flow = p.flow
        t_scan = jnp.asarray(flow.timesteps / 1000.0, jnp.float32)
        dt_scan = jnp.asarray(np.diff(flow.sigmas), jnp.float32)

        def denoise(params, masks, noise, txt, pooled):
            b = noise.shape[0]
            g = (
                jnp.full((b,), p.config.guidance_scale, jnp.float32)
                if p.config.model.guidance_embeds
                else None
            )
            c = p.config.model
            n_slots = c.num_blocks + c.num_single_blocks
            t_img = noise.shape[1]
            s = c.text_len + t_img
            # dense cache init (the cond path needs every entry present);
            # stored in cache_dtype when set (models/flux.py _to_cache)
            cdt = c.cache_dtype or c.dtype
            cache = {}
            for i in range(c.num_blocks):
                z = jnp.zeros((b, t_img, c.dim), cdt)
                zt = jnp.zeros((b, c.text_len, c.dim), cdt)
                cache[f"full_attn_{i}"] = (z, zt)
                cache[f"full_ff_{i}"] = z
                cache[f"full_ff_context_{i}"] = zt
            zj = jnp.zeros((b, s, c.dim), cdt)
            for i in range(c.num_single_blocks):
                cache[f"single_attn_{i}"] = zj
                cache[f"single_proj_mlp_{i}"] = jnp.zeros(
                    (b, s, c.dim * c.mlp_ratio), cdt
                )
                cache[f"single_proj_out_{i}"] = zj

            def body(carry, inp):
                x, cache = carry
                mask_row, t_val, dt = inp
                t = jnp.full((b,), t_val, jnp.float32)
                v, cache = p.model.apply(
                    {"params": params}, x, txt, pooled, t, g, cache,
                    mask_row, p.config.grid_hw,
                )
                new_x = (
                    x.astype(jnp.float32) + dt * v.astype(jnp.float32)
                ).astype(x.dtype)
                return (new_x, cache), None

            (x, final_cache), _ = jax.lax.scan(
                body, (noise, cache), (masks, t_scan, dt_scan)
            )
            if return_cache:
                return x, final_cache
            return x

        return jax.jit(denoise)

    def denoise(self, masks, noise, txt, pooled) -> jax.Array:
        key = (noise.shape, txt.shape)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build()
        return self._fn_cache[key](
            self.pipeline.params, jnp.asarray(masks), noise, txt, pooled
        )

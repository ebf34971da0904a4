"""TGATE pipeline variant for PixArt.

Reference: ecad/pipelines/tgate.py (forked PixArtAlphaPipeline.__call__) +
the compute_attn_tgate strategy (cached_transformer_block.py:393-454):

* steps < gate_step — normal CFG (batch 2B); cross-attention cached as
  usual, except at step gate_step−1 the cache stores the AVERAGE of the
  (uncond, text) halves while returning the unaveraged values.
* steps ≥ gate_step — CFG is dropped: the model runs on the null-embedding
  half only (batch B), reusing the averaged cross-attention cache; no
  guidance combine (tgate.py:328-341,380-389).

The reference implements this with a mutable-batch pipeline + step cursor;
here it is two phases of specialized programs with an explicit cache
transform between them. Under jit the phase change is just two compiled
programs — no dynamic batch shapes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.pixart import COMPONENTS, StepMask
from .pixart_pipeline import PixArtPipeline
from .samplers import DPMState, dpm_step


class TGATEPixArtPipeline(PixArtPipeline):
    def __init__(self, *args, gate_step: int, **kwargs):
        if not gate_step or gate_step < 1:
            raise ValueError(f"gate_step {gate_step} out of range")
        self.gate_step = gate_step
        super().__init__(*args, **kwargs)

    def set_schedule(self, schedule=None, dit_schedule=None) -> None:
        super().set_schedule(schedule, dit_schedule)
        gate_step = self.gate_step
        if gate_step > self.config.num_inference_steps:
            raise ValueError(f"gate_step {gate_step} out of range")
        # after the gate, cross-attention must come from the averaged cache;
        # self-attn/ff caches have CFG batch shape and cannot be reused
        for step in range(gate_step, self.config.num_inference_steps):
            for b, (a1, a2, ff) in enumerate(self.masks[step]):
                if not a1 or not ff:
                    raise ValueError(
                        "TGATE phase 2 requires attn1/ff recompute at step "
                        f"{step} block {b} (CFG-batch caches are dropped at "
                        "the gate)"
                    )
        self.masks = [
            tuple(
                (a1, a2 if step < gate_step else False, ff)
                for (a1, a2, ff) in self.masks[step]
            )
            for step in range(self.config.num_inference_steps)
        ]

    def build_denoise_fn(self, donate: bool = True):
        def denoise(params, noise, text, neg, text_mask, neg_mask):
            b = noise.shape[0]
            enc2 = jnp.concatenate([neg, text], axis=0)
            enc_mask2 = None
            if text_mask is not None and neg_mask is not None:
                enc_mask2 = jnp.concatenate([neg_mask, text_mask], axis=0)
            res2, ar2 = self._additional_conditions(2 * b, noise.dtype)
            res1, ar1 = self._additional_conditions(b, noise.dtype)
            tokens = (noise.shape[1] // self.config.model.patch_size) * (
                noise.shape[2] // self.config.model.patch_size
            )
            from ..models.pixart import init_cache

            cache = init_cache(self.config.model, 2 * b, tokens)
            x = noise * self.dpm.init_noise_sigma
            state = DPMState(x, jnp.zeros_like(x, jnp.float32), False)

            # phase 1: CFG
            for i in range(self.gate_step):
                eps, cache = self._model_eps(
                    params, state.x, enc2, enc_mask2,
                    float(self.dpm.timesteps[i]), cache, self.masks[i],
                    res2, ar2, plan=self.plans[i],
                )
                state = dpm_step(self.dpm, i, eps, state)

            # gate transform: average CFG halves of the CA cache
            # (uncond first — enc2 = [neg, text]); other components drop to
            # the null half for shape consistency (recomputed anyway).
            def gate_cache(comp, rows):
                out = []
                for r in rows:
                    uncond, text_half = jnp.split(r, 2, axis=0)
                    if comp == "attn2":
                        out.append((uncond + text_half) / 2)
                    else:
                        out.append(uncond)
                return tuple(out)

            cache = {k: gate_cache(k, v) for k, v in cache.items()}

            # phase 2: null-embedding only, no CFG
            for i in range(self.gate_step, self.dpm.num_steps):
                out, cache = self.model.apply(
                    {"params": params},
                    state.x,
                    neg,
                    jnp.full((b,), float(self.dpm.timesteps[i]), jnp.float32),
                    cache,
                    self.masks[i],
                    text_mask=neg_mask,
                    resolution=res1,
                    aspect_ratio=ar1,
                    plan=self.plans[i],
                )
                eps = out[..., : self.config.model.in_channels]
                state = dpm_step(self.dpm, i, eps, state)
            return state.x

        return jax.jit(denoise, donate_argnums=(1,) if donate else ())

    def denoise_stepwise(self, noise, text, neg, text_mask=None, neg_mask=None):
        # TGATE's phase structure is inherently whole-trajectory; reuse the
        # unrolled program (it is cached per shape).
        key = (noise.shape, text.shape, text_mask is not None)
        if key not in self._unrolled_cache:
            self._unrolled_cache[key] = self.build_denoise_fn(donate=False)
        return self._unrolled_cache[key](
            self.params, noise, text, neg, text_mask, neg_mask
        )


class PassThroughPixArtPipeline(PixArtPipeline):
    """Zero-output transformer — isolates non-transformer pipeline overhead
    (reference ecad/transformer_2d_models/pass_through_transformer_2d.py:61-136,
    ecad/pipelines/pass_through.py:31-47)."""

    def _model_eps(self, params, latents, enc2, enc_mask2, t_value, cache,
                   mask, resolution, aspect_ratio, plan=None,
                   text_precomputed=None):
        return jnp.zeros_like(latents), cache

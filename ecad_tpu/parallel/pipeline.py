"""Pipeline parallelism (pp): GPipe-style microbatched block-stage
execution over a "pp" mesh axis.

The reference is single-GPU torch and has no pipelining of any kind
(SURVEY.md §2.9); on TPU pods pipeline parallelism is the standard way to
serve a model whose weights exceed one host's chips when the cross-host
links are DCN rather than ICI: tensor parallelism pays TWO all-reduces per
block (every hop crosses the slow link), while pp pays ONE boundary
activation transfer per microbatch per stage. This module implements the
inference-side harness for the PixArt tower (28 homogeneous blocks; FLUX's
dual→single heterogeneity needs per-stage programs, out of scope for the
SPMD harness — use tp/sp for FLUX, docs/flux_hbm_accounting.md).

Design (all standard JAX, no runtime magic):

* block params are STACKED along a leading (num_blocks,) axis and sharded
  `P("pp")` — each stage holds only its `num_blocks/pp` blocks' weights
  (the memory lever: weights divide by pp, like tp but without per-layer
  collectives).
* the block stage runs under `shard_map` over the ("dp", "pp") mesh:
  batch shards over dp as usual; inside each pp shard a `lax.scan` over
  the local stacked params applies that stage's blocks.
* microbatches rotate stage-to-stage with `lax.ppermute` on a ring: the
  classic GPipe schedule of T = n_micro + pp - 1 ticks, bubble fraction
  (pp-1)/T. Invalid (bubble) ticks compute on clamped garbage and their
  cache/output writes are masked out.
* caches (the ECAD per-component block outputs) live WITH their stage —
  sharded `P("pp")` on the block axis, so pp also divides the cache HBM.
* component recompute flags are traced (the dynamic / lax.cond execution
  mode used for population evaluation and serving), so one compiled
  program serves every schedule.

Attention inside the shard_map body runs under
`models.common.local_attention()` — operands are already per-shard local,
and nested shard_map is not allowed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..models.common import local_attention
from ..models.pixart import (
    COMPONENTS,
    PixArtBlock,
    PixArtConfig,
    PixArtTransformer,
)


def create_pp_mesh(pp: int, dp: int = 1, devices: Any = None) -> Mesh:
    """("dp", "pp") mesh. pp is minormost so the per-microbatch boundary
    ppermutes ride adjacent devices; dp rows pipeline independently."""
    devs = list(devices if devices is not None else jax.devices())
    if dp * pp != len(devs):
        raise ValueError(f"dp*pp={dp * pp} != {len(devs)} devices")
    return Mesh(np.array(devs).reshape(dp, pp), ("dp", "pp"))


def stack_block_params(params: dict, num_blocks: int):
    """Split a PixArtTransformer params dict into (stacked block params
    with a leading (num_blocks,) axis, the non-block remainder). The
    remainder (patch/caption/adaln/final projections, <1% of weights) is
    what the pre/post stages consume; flax only looks params up on use,
    so each part can be applied without the other being present."""
    blocks = [params[f"block_{i}"] for i in range(num_blocks)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in params.items() if not k.startswith("block_")}
    return stacked, rest


def stacked_cache(
    config: PixArtConfig, batch: int, tokens: int | None = None,
    dtype: Any = None,
) -> dict[str, jax.Array]:
    """Zero cache in the stacked layout {comp: (num_blocks, B, T, d)}."""
    t = config.tokens if tokens is None else tokens
    dt = dtype or config.dtype
    return {
        k: jnp.zeros((config.num_blocks, batch, t, config.dim), dt)
        for k in COMPONENTS
    }


def to_stacked_cache(cache: dict[str, tuple]) -> dict[str, jax.Array]:
    """models.pixart tuple-per-block cache → stacked (nb, B, T, d)."""
    return {k: jnp.stack(v) for k, v in cache.items()}


def from_stacked_cache(cache: dict[str, jax.Array]) -> dict[str, tuple]:
    return {
        k: tuple(v[i] for i in range(v.shape[0])) for k, v in cache.items()
    }


def pp_shardings(mesh: Mesh, stacked_params, cache):
    """NamedShardings to device_put the stacked params / cache so HBM is
    actually divided at the program boundary: stage s holds blocks
    [s*nb/pp, (s+1)*nb/pp) and each dp row holds its batch slice. The
    boundary cache layout is (nb, B, T, d) → P("pp", "dp"); build_pp_forward
    reshapes B into (mb, n_micro) with mb major, so the dp shard carries
    into the in-program microbatch axis without resharding (requires
    (B / n_micro) % dp == 0 for the comms-free propagation)."""
    bp = jax.tree.map(
        lambda _: NamedSharding(mesh, P("pp")), stacked_params
    )
    ch = jax.tree.map(
        lambda _: NamedSharding(mesh, P("pp", "dp")), cache
    )
    return bp, ch


def stacked_cross_kv(config: PixArtConfig, stacked_params, enc: jax.Array):
    """Trajectory-constant cross-attention K/V for every block, computed
    once per trajectory from the STACKED block params: (k, v) with leading
    (num_blocks,) axes — the pp-world analogue of
    PixArtTransformer.encode_text's per-block tuple. Feed through
    build_pp_forward's ``text_precomputed=(enc, kv)``."""
    block = PixArtBlock(config)
    return jax.vmap(
        lambda p: block.apply({"params": p}, enc, method=PixArtBlock.cross_kv)
    )(stacked_params)


def build_pp_forward(model: PixArtTransformer, mesh: Mesh, n_micro: int):
    """Build a pipeline-parallel transformer forward.

    Returns ``fn(stacked_params, rest_params, latents, text_embeds,
    timestep, cache, mask_arr, text_mask=None) -> (noise_pred,
    new_cache)``, numerically equal to ``model.apply`` with the same
    (traced) masks. `stacked_params`/`cache` use the stacked layouts from
    stack_block_params/stacked_cache and should be device_put with
    `pp_shardings` so stage weights+caches divide 1/pp per chip;
    `mask_arr` is a traced (num_blocks, 3) bool array (the dynamic
    lax.cond execution mode — one program for every schedule). The
    pre/post stages (patchify/adaln/caption projection, final modulated
    projection) run replicated under the mesh: <1% of the FLOPs — only
    the block stage is pipelined.
    """
    config: PixArtConfig = model.config
    pp = mesh.shape["pp"]
    nb = config.num_blocks
    if nb % pp:
        raise ValueError(f"num_blocks={nb} not divisible by pp={pp}")
    if config.quant is not None:
        raise NotImplementedError("pp harness supports quant=None only")
    block = PixArtBlock(config)

    def stage_scan(
        bp_local, h, enc, t6, enc_bias, cache_mb, masks_local, kv_mb
    ):
        """Apply this stage's local blocks to one microbatch."""
        xs = {"p": bp_local, "cache": cache_mb, "m": masks_local}
        if kv_mb is not None:
            xs["kv"] = kv_mb

        def body(carry, row):
            m = row["m"]
            with local_attention():
                new_h, new_row = block.apply(
                    {"params": row["p"]}, carry, enc, t6, enc_bias,
                    row["cache"], (m[0], m[1], m[2]),
                    enc_kv=row.get("kv"),
                )
            return new_h, new_row

        return jax.lax.scan(body, h, xs)

    def pipeline_body(
        bp_local, x_micro, enc_m, t6_m, bias_m, kv_m, cache_local,
        masks_local,
    ):
        """shard_map body: one pp stage. x_micro (n_micro, mb, T, d) is
        replicated over pp; cache_local {comp: (n_local, n_micro, mb, T,
        d)}; masks_local (n_local, 3); kv_m optional trajectory-constant
        cross-attention K/V, (n_local, n_micro, mb, L, H, Dh) each."""
        s = jax.lax.axis_index("pp")
        is_first = s == 0
        is_last = s == pp - 1
        recv = jnp.zeros(x_micro.shape[1:], x_micro.dtype)
        out_buf = jnp.zeros_like(x_micro)
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        for t in range(n_micro + pp - 1):
            mb = t - s  # this stage's microbatch index at tick t
            valid = (mb >= 0) & (mb < n_micro)
            mb_c = jnp.clip(mb, 0, n_micro - 1)
            take = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
                a, mb_c, axis=0, keepdims=False
            )
            inp = jnp.where(is_first, take(x_micro), recv)
            take1 = lambda a: jax.lax.dynamic_index_in_dim(  # noqa: E731
                a, mb_c, axis=1, keepdims=False
            )
            cache_mb = jax.tree.map(take1, cache_local)
            kv_mb = None if kv_m is None else jax.tree.map(take1, kv_m)
            bias_mb = None if bias_m is None else take(bias_m)
            out, new_rows = stage_scan(
                bp_local, inp, take(enc_m), take(t6_m), bias_mb,
                cache_mb, masks_local, kv_mb,
            )
            # masked writes: bubble ticks (and the clamped mb they alias)
            # must not clobber real state
            cache_local = jax.tree.map(
                lambda a, new, old: jax.lax.dynamic_update_index_in_dim(
                    a, jnp.where(valid, new, old), mb_c, axis=1
                ),
                cache_local, new_rows, cache_mb,
            )
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf,
                jnp.where(valid & is_last, out, take(out_buf)),
                mb_c,
                axis=0,
            )
            recv = jax.lax.ppermute(out, "pp", perm)
        # replicate the last stage's output buffer to every stage (one
        # boundary-sized collective; out_specs then declare it unsharded
        # over pp)
        out_buf = jax.lax.psum(
            jnp.where(is_last, out_buf, jnp.zeros_like(out_buf)), "pp"
        )
        return out_buf, cache_local

    def forward(
        stacked_params,
        rest_params,
        latents,
        text_embeds,
        timestep,
        cache,
        mask_arr,
        text_mask: Optional[jax.Array] = None,
        resolution: Optional[jax.Array] = None,
        aspect_ratio: Optional[jax.Array] = None,
        text_precomputed: Optional[tuple] = None,
    ):
        c = config
        b, hh, ww, _ = latents.shape
        gh, gw = hh // c.patch_size, ww // c.patch_size
        if b % n_micro:
            raise ValueError(f"batch {b} not divisible by n_micro={n_micro}")
        mb = b // n_micro

        # `text_precomputed` = (enc, stacked_kv) hoists the trajectory-
        # constant text work out of a step loop: enc skips the caption
        # projection inside process_input, stacked_kv (from
        # stacked_cross_kv, leading (nb,) axes) skips every block's
        # cross-attention K/V projections.
        h, t6, emb_t, enc, _, enc_bias = model.apply(
            {"params": rest_params},
            latents,
            text_embeds,
            timestep,
            text_mask,
            resolution,
            aspect_ratio,
            None if text_precomputed is None else (text_precomputed[0], None),
            method=PixArtTransformer.process_input,
        )
        kv_stacked = None if text_precomputed is None else text_precomputed[1]

        # Microbatch m = batch rows {r·n_micro + m}: the (mb, n_micro)
        # reshape keeps mb MAJOR in B, so a boundary P(…, "dp") sharding of
        # the B axis (pp_shardings) propagates through reshape+swap into
        # the in-program P(…, None, "dp") microbatch sharding with zero
        # collectives (blocks act per-sample, so grouping is free).
        def micro(a):  # (B, ...) → (n_micro, mb, ...)
            return a.reshape((mb, n_micro) + a.shape[1:]).swapaxes(0, 1)

        x_micro = micro(h)
        enc_m = micro(enc)
        t6_m = micro(t6)
        bias_m = None if enc_bias is None else micro(enc_bias)
        masks = jnp.asarray(mask_arr)

        def micro1(a):  # (nb, B, ...) → (nb, n_micro, mb, ...)
            return a.reshape((nb, mb, n_micro) + a.shape[2:]).swapaxes(1, 2)

        cache_m = jax.tree.map(micro1, cache)
        kv_m = (
            None if kv_stacked is None else jax.tree.map(micro1, kv_stacked)
        )

        spec = lambda t_, s_: jax.tree.map(lambda _: s_, t_)  # noqa: E731
        act_spec = P(None, "dp")
        cache_spec = spec(cache_m, P("pp", None, "dp"))
        operands = [stacked_params, x_micro, enc_m, t6_m]
        in_specs = [spec(stacked_params, P("pp")), act_spec, act_spec,
                    act_spec]
        has_bias, has_kv = bias_m is not None, kv_m is not None
        if has_bias:
            operands.append(bias_m)
            in_specs.append(act_spec)
        if has_kv:
            operands.append(kv_m)
            in_specs.append(spec(kv_m, P("pp", None, "dp")))
        operands += [cache_m, masks]
        in_specs += [cache_spec, P("pp")]

        def body(bp, x, e, t6_, *rest):
            it = list(rest)
            bias = it.pop(0) if has_bias else None
            kv = it.pop(0) if has_kv else None
            cl, ml = it
            return pipeline_body(bp, x, e, t6_, bias, kv, cl, ml)

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=tuple(in_specs),
            out_specs=(act_spec, cache_spec),
            check_vma=False,
        )
        out_m, new_cache_m = fn(*operands)

        out = out_m.swapaxes(0, 1).reshape((b,) + out_m.shape[2:])
        new_cache = jax.tree.map(
            lambda a: a.swapaxes(1, 2).reshape((nb, b) + a.shape[3:]),
            new_cache_m,
        )
        noise = model.apply(
            {"params": rest_params},
            out,
            emb_t,
            gh,
            gw,
            method=PixArtTransformer.create_output,
        )
        return noise, new_cache

    return forward


class PipelinedPopulationDenoiser:
    """PopulationDenoiser with the block stage pipelined over pp: the full
    CFG + DPM-Solver trajectory (pipelines/pixart_pipeline.py's lax.scan
    over steps, traced masks via lax.cond) composed with the GPipe
    microbatch schedule — each denoise step streams its 2B CFG batch
    through the pp stages. Exists to prove (and test) that the scan ×
    pipeline composition compiles and matches the plain denoiser bitwise;
    PixArt itself fits one chip, so pp is never REQUIRED for it — the
    capability targets pod-scale serving of larger homogeneous towers
    where dp/tp over DCN is not viable."""

    def __init__(self, pipeline, mesh: Mesh, n_micro: int):
        self.pipeline = pipeline
        self.mesh = mesh
        self.n_micro = n_micro
        nb = pipeline.config.model.num_blocks
        self._fwd = build_pp_forward(pipeline.model, mesh, n_micro)
        stacked, rest = stack_block_params(pipeline.params, nb)
        bp_sh, _ = pp_shardings(mesh, stacked, {})
        self.stacked = jax.device_put(stacked, bp_sh)
        self.rest = rest
        self._fn_cache: dict = {}

    def _build(self, with_enc_mask: bool):
        from ..pipelines.pixart_pipeline import cfg_dpm_step
        from ..pipelines.samplers import dpm_scan_coeffs

        p = self.pipeline
        coeffs = jnp.asarray(dpm_scan_coeffs(p.dpm), jnp.float32)
        nb = p.config.model.num_blocks

        def denoise(stacked, rest, masks, noise, text, neg, text_mask,
                    neg_mask):
            b = noise.shape[0]
            enc2 = jnp.concatenate([neg, text], axis=0)
            enc_mask2 = None
            if with_enc_mask:
                enc_mask2 = jnp.concatenate([neg_mask, text_mask], axis=0)
            res, ar = p._additional_conditions(2 * b, noise.dtype)
            tokens = (noise.shape[1] // p.config.model.patch_size) * (
                noise.shape[2] // p.config.model.patch_size
            )
            cache = {
                k: jnp.zeros(
                    (nb, 2 * b, tokens, p.config.model.dim),
                    p.config.model.dtype,
                )
                for k in COMPONENTS
            }
            x0_init = jnp.zeros_like(noise, jnp.float32)
            # trajectory-constant text work hoisted out of the step scan,
            # mirroring PopulationDenoiser: caption projection once (vs 20×)
            # and every block's cross-attention K/V once (vs 20 × nb ×
            # n_micro recomputations inside the pipeline stages)
            enc_pre, _ = p.model.apply(
                {"params": rest}, enc2,
                method=PixArtTransformer.encode_text, with_kv=False,
            )
            kv_pre = stacked_cross_kv(p.config.model, stacked, enc_pre)

            def body(carry, inp):
                x, prev_x0, cache = carry
                mask_row, co = inp
                lat2 = jnp.concatenate([x, x], axis=0)
                t = jnp.full((2 * b,), co[0], jnp.float32)
                out, cache = self._fwd(
                    stacked, rest, lat2, enc2, t, cache, mask_row,
                    text_mask=enc_mask2, resolution=res, aspect_ratio=ar,
                    text_precomputed=(enc_pre, kv_pre),
                )
                new_x, x0 = cfg_dpm_step(
                    x, prev_x0, co, out, p.config.guidance_scale,
                    p.config.model.in_channels,
                )
                return (new_x, x0, cache), None

            init = (noise * p.dpm.init_noise_sigma, x0_init, cache)
            (x, _, _), _ = jax.lax.scan(body, init, (masks, coeffs))
            return x

        return jax.jit(denoise)

    def denoise(self, masks, noise, text, neg, text_mask=None,
                neg_mask=None) -> jax.Array:
        """Same contract as PopulationDenoiser.denoise; the CFG-doubled
        batch 2B must divide n_micro (× the mesh's dp)."""
        key = (noise.shape, text.shape, text_mask is not None)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build(text_mask is not None)
        return self._fn_cache[key](
            self.stacked, self.rest, jnp.asarray(masks), noise, text, neg,
            text_mask, neg_mask,
        )


class TGATEPipelinedDenoiser:
    """TGATE (pipelines/tgate.py) composed with the pp harness: the
    mid-trajectory CFG drop becomes TWO pp-scanned phases with a stacked
    gate-cache transform between them — phase 1 streams the 2B CFG batch
    through the stages for `gate_step` steps, the cross-attention cache's
    CFG halves are averaged (other components keep the uncond half, they
    are recomputed post-gate anyway, tgate.py gate_cache), and phase 2
    streams the B null-embedding batch for the remaining steps with a
    plain (no-CFG) DPM update. This pins the previously-untested
    pp × TGATE boundary (round-3 review): the batch change is legal under
    pp because each phase is its own shard_map program — nothing dynamic
    crosses the gate except the carried latents/x0/cache.

    Constraints: BOTH phases' batches split into n_micro microbatches
    whose size is dp-sharded, so B % n_micro == 0 AND
    (B // n_micro) % dp == 0 (phase 1 runs at 2B, which then divides
    automatically). The pipeline must be a TGATEPixArtPipeline — its
    set_schedule already validated phase-2 attn1/ff recompute and
    cleared post-gate attn2 recompute flags."""

    def __init__(self, pipeline, mesh: Mesh, n_micro: int):
        self.pipeline = pipeline
        self.mesh = mesh
        self.n_micro = n_micro
        nb = pipeline.config.model.num_blocks
        self._fwd = build_pp_forward(pipeline.model, mesh, n_micro)
        stacked, rest = stack_block_params(pipeline.params, nb)
        bp_sh, _ = pp_shardings(mesh, stacked, {})
        self.stacked = jax.device_put(stacked, bp_sh)
        self.rest = rest
        self._fn_cache: dict = {}

    def _build(self, with_enc_mask: bool):
        from ..pipelines.pixart_pipeline import cfg_dpm_step, dpm_update
        from ..pipelines.samplers import dpm_scan_coeffs

        p = self.pipeline
        gate = p.gate_step
        coeffs = jnp.asarray(dpm_scan_coeffs(p.dpm), jnp.float32)
        nb = p.config.model.num_blocks
        in_ch = p.config.model.in_channels

        def denoise(stacked, rest, masks, noise, text, neg, text_mask,
                    neg_mask):
            b = noise.shape[0]
            enc2 = jnp.concatenate([neg, text], axis=0)
            enc_mask2 = None
            if with_enc_mask:
                enc_mask2 = jnp.concatenate([neg_mask, text_mask], axis=0)
            res2, ar2 = p._additional_conditions(2 * b, noise.dtype)
            res1, ar1 = p._additional_conditions(b, noise.dtype)
            tokens = (noise.shape[1] // p.config.model.patch_size) * (
                noise.shape[2] // p.config.model.patch_size
            )
            cache = {
                k: jnp.zeros(
                    (nb, 2 * b, tokens, p.config.model.dim),
                    p.config.model.dtype,
                )
                for k in COMPONENTS
            }
            enc_pre2, _ = p.model.apply(
                {"params": rest}, enc2,
                method=PixArtTransformer.encode_text, with_kv=False,
            )
            kv_pre2 = stacked_cross_kv(p.config.model, stacked, enc_pre2)

            def body1(carry, inp):
                x, prev_x0, cache = carry
                mask_row, co = inp
                lat2 = jnp.concatenate([x, x], axis=0)
                t = jnp.full((2 * b,), co[0], jnp.float32)
                out, cache = self._fwd(
                    stacked, rest, lat2, enc2, t, cache, mask_row,
                    text_mask=enc_mask2, resolution=res2, aspect_ratio=ar2,
                    text_precomputed=(enc_pre2, kv_pre2),
                )
                new_x, x0 = cfg_dpm_step(
                    x, prev_x0, co, out, p.config.guidance_scale, in_ch
                )
                return (new_x, x0, cache), None

            init = (
                noise * p.dpm.init_noise_sigma,
                jnp.zeros_like(noise, jnp.float32),
                cache,
            )
            (x, prev_x0, cache), _ = jax.lax.scan(
                body1, init, (masks[:gate], coeffs[:gate])
            )

            # gate transform on the STACKED cache (nb, 2B, T, d): average
            # the CFG halves of cross-attention, keep the uncond half
            # elsewhere (enc2 = [neg, text], uncond first) — exactly
            # tgate.py's gate_cache on the stacked layout.
            cache = {
                k: (
                    (a[:, :b] + a[:, b:]) / 2
                    if k == "attn2"
                    else a[:, :b]
                )
                for k, a in cache.items()
            }

            enc_pre1, _ = p.model.apply(
                {"params": rest}, neg,
                method=PixArtTransformer.encode_text, with_kv=False,
            )
            kv_pre1 = stacked_cross_kv(p.config.model, stacked, enc_pre1)

            def body2(carry, inp):
                x, prev_x0, cache = carry
                mask_row, co = inp
                t = jnp.full((b,), co[0], jnp.float32)
                out, cache = self._fwd(
                    stacked, rest, x, neg, t, cache, mask_row,
                    text_mask=neg_mask if with_enc_mask else None,
                    resolution=res1, aspect_ratio=ar1,
                    text_precomputed=(enc_pre1, kv_pre1),
                )
                eps = out[..., :in_ch]
                new_x, x0 = dpm_update(x, prev_x0, co, eps)
                return (new_x, x0, cache), None

            (x, _, _), _ = jax.lax.scan(
                body2, (x, prev_x0, cache), (masks[gate:], coeffs[gate:])
            )
            return x

        return jax.jit(denoise)

    def denoise(self, noise, text, neg, text_mask=None,
                neg_mask=None) -> jax.Array:
        """Full TGATE trajectory; masks come from the pipeline's own
        (gate-validated) schedule. See class docstring for the batch
        divisibility constraints (checked here for a clear error)."""
        b = noise.shape[0]
        dp = self.mesh.shape.get("dp", 1)
        if b % self.n_micro or (b // self.n_micro) % dp:
            raise ValueError(
                f"TGATE pp phase 2 batch {b} must split into "
                f"n_micro={self.n_micro} microbatches divisible by "
                f"dp={dp}; need B % n_micro == 0 and "
                f"(B//n_micro) % dp == 0"
            )
        masks = jnp.asarray(np.asarray(self.pipeline.masks, dtype=bool))
        key = (noise.shape, text.shape, text_mask is not None)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build(text_mask is not None)
        return self._fn_cache[key](
            self.stacked, self.rest, masks, noise, text, neg,
            text_mask, neg_mask,
        )

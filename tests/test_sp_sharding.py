"""Sequence-parallel (sp>=2) correctness on the virtual 8-device CPU mesh.

The reference has no sequence parallelism (single-GPU torch,
ecad/transformer_2d_models/flux_transformer_2d_edited.py); on TPU the long
1024² sequences (4096 latent / 4608 joint tokens) can additionally shard
their TOKEN axis over an "sp" mesh axis (logical axis SEQ,
LOGICAL_AXIS_RULES in ecad_tpu/models/common.py): activations and the
per-step cache pytrees split 1/sp per chip, and attention all-gathers K/V
along sp (models/common._shard_map_attention on the pallas paths; GSPMD
inserts the same collective on the XLA path). These tests verify sp is
numerically a no-op versus single-device execution and that the caches
actually carry the sp sharding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ecad_tpu.genetic import CandidateEvaluator, EvalConfig
from ecad_tpu.models import FluxConfig, PixArtConfig, init_flux_params, init_params
from ecad_tpu.parallel import create_mesh, shard_params
from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
from ecad_tpu.schedules import PixArtCacheSchedule

STEPS = 3


@pytest.mark.parametrize("dp,sp,tp", [(1, 2, 2), (2, 2, 2), (1, 4, 1)])
def test_pixart_sp_eval_matches_single_device(dp, sp, tp):
    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=STEPS)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = 8
    text = jax.random.normal(k1, (p, config.text_len, config.caption_dim))
    neg = jax.random.normal(k2, (p, config.text_len, config.caption_dim))
    prompts = [f"p{i}" for i in range(p)]
    rng = np.random.default_rng(0)
    sched = PixArtCacheSchedule.from_numpy(
        rng.random(STEPS * config.num_blocks * 3) < 0.5,
        STEPS,
        config.num_blocks,
    )

    plain = CandidateEvaluator(
        PixArtPipeline(pcfg, params), text, neg, prompts, EvalConfig()
    )
    scores_plain, images_plain = plain.evaluate_candidate(sched)

    mesh = create_mesh(dp=dp, sp=sp, tp=tp, devices=jax.devices()[: dp * sp * tp])
    sharded_params = shard_params(params, mesh)
    with mesh:
        sharded = CandidateEvaluator(
            PixArtPipeline(pcfg, sharded_params), text, neg, prompts,
            EvalConfig(), mesh=mesh,
        )
        scores_sharded, images_sharded = sharded.evaluate_candidate(sched)

    np.testing.assert_allclose(
        images_plain.astype(np.int32), images_sharded.astype(np.int32),
        atol=1,
    )
    np.testing.assert_allclose(
        scores_plain["total_score"], scores_sharded["total_score"], rtol=1e-3
    )


@pytest.mark.parametrize("mode", ["dynamic", "stepwise"])
def test_flux_sp_eval_matches_single_device(mode):
    from ecad_tpu.genetic.evaluate import FluxCandidateEvaluator
    from ecad_tpu.pipelines.flux_pipeline import FluxPipeline, FluxPipelineConfig
    from ecad_tpu.schedules import FluxCacheSchedule

    config = FluxConfig.tiny(dtype=jnp.float32)
    _, params = init_flux_params(config, 0)
    pcfg = FluxPipelineConfig(
        model=config, num_inference_steps=STEPS, height=32, width=32
    )

    p = 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    text = jax.random.normal(k1, (p, config.text_len, config.joint_dim))
    pooled = jax.random.normal(k2, (p, config.pooled_dim))
    prompts = [f"p{i}" for i in range(p)]

    rng = np.random.default_rng(0)
    n_slots = config.num_blocks + config.num_single_blocks
    sched = FluxCacheSchedule.from_numpy(
        rng.random(STEPS * n_slots * 3) < 0.5, STEPS,
        num_blocks=config.num_blocks,
        num_single_blocks=config.num_single_blocks,
    )

    cfg = EvalConfig(mode=mode)
    plain = FluxCandidateEvaluator(
        FluxPipeline(pcfg, params), text, pooled, prompts, cfg
    )
    scores_plain, images_plain = plain.evaluate_candidate(sched)

    mesh = create_mesh(dp=2, sp=2, tp=2)
    sharded_params = shard_params(params, mesh)
    with mesh:
        sharded = FluxCandidateEvaluator(
            FluxPipeline(pcfg, sharded_params), text, pooled, prompts,
            cfg, mesh=mesh,
        )
        scores_sharded, images_sharded = sharded.evaluate_candidate(sched)

    np.testing.assert_allclose(
        images_plain.astype(np.int32), images_sharded.astype(np.int32),
        atol=1,
    )
    np.testing.assert_allclose(
        scores_plain["total_score"], scores_sharded["total_score"], rtol=1e-3
    )


def test_flux_dynamic_cache_sp_sharded():
    """On an sp mesh the lax.cond-mode caches must shard their token axis
    over "sp" in addition to dp (and tp for the MLP-width cache) — this is
    what divides the 1024² cache HBM by sp (docs/flux_hbm_accounting.md)."""
    from ecad_tpu.models.flux import FluxSingleBlock, rope_freqs

    config = FluxConfig.tiny(dtype=jnp.float32)
    block = FluxSingleBlock(config)
    b, t = 4, 8
    x = jnp.ones((b, t, config.dim))
    temb = jnp.ones((b, config.dim))
    cos_np, sin_np = rope_freqs(
        np.zeros((t, 3)), config.axes_dims, config.rope_theta
    )
    cos, sin = jnp.asarray(cos_np), jnp.asarray(sin_np)
    cache = {
        "single_attn": jnp.zeros((b, t, config.dim)),
        "single_proj_mlp": jnp.zeros((b, t, config.dim * config.mlp_ratio)),
        "single_proj_out": jnp.zeros((b, t, config.dim)),
    }
    params = block.init(
        jax.random.PRNGKey(0), x, temb, cos, sin, cache, (True,) * 3
    )["params"]

    mesh = create_mesh(dp=2, sp=2, tp=2)
    traced_mask = tuple(jnp.asarray(True) for _ in range(3))

    def fwd(params, x, cache):
        _, new_cache = block.apply(
            {"params": params}, x, temb, cos, sin, cache, traced_mask
        )
        return new_cache

    with mesh:
        new_cache = jax.jit(fwd)(params, x, cache)
        new_cache = jax.block_until_ready(new_cache)

    assert new_cache["single_proj_mlp"].sharding.spec == P("dp", "sp", "tp")
    for name in ("single_attn", "single_proj_out"):
        spec = new_cache[name].sharding.spec
        assert spec[0] == "dp" and spec[1] == "sp", (name, spec)

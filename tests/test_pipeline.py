"""Pipeline tests on the tiny model: sampler correctness properties,
unrolled/stepwise equivalence, and schedule-specialized execution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.pipelines import (
    PixArtPipeline,
    PixArtPipelineConfig,
    SharedModelStepper,
    make_dpm_schedule,
)
from ecad_tpu.models.pixart import schedule_step_masks
from ecad_tpu.schedules import PixArtCacheSchedule

STEPS = 4


@pytest.fixture(scope="module")
def tiny_pipeline():
    config = PixArtConfig.tiny(dtype=jnp.float32)
    model, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=STEPS)
    return config, params, pcfg


def _embeds(config, batch=2, seed=1):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    text = jax.random.normal(k1, (batch, config.text_len, config.caption_dim))
    neg = jax.random.normal(k2, (batch, config.text_len, config.caption_dim))
    return text, neg


def test_dpm_schedule_matches_diffusers_spacing():
    s = make_dpm_schedule(20)
    # linspace spacing (diffusers): 21 points over [0,999], drop the 0 →
    # descending from 999 to 50; the final update integrates to sigma=0
    assert s.timesteps[0] == 999 and s.timesteps[-1] == 50
    assert len(s.timesteps) == 20
    assert np.all(np.diff(s.timesteps) < 0)
    # alpha² + sigma² = 1
    np.testing.assert_allclose(s.alpha_t**2 + s.sigma_t**2, 1.0, rtol=1e-12)


def test_default_schedule_denoise(tiny_pipeline):
    config, params, pcfg = tiny_pipeline
    pipe = PixArtPipeline(pcfg, params)
    text, neg = _embeds(config)
    out = pipe.generate_latents(text, neg, seed=0)
    assert out.shape == (2, config.sample_size, config.sample_size, 4)
    assert np.isfinite(np.asarray(out)).all()
    # determinism
    out2 = pipe.generate_latents(text, neg, seed=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # different seed → different noise path
    out3 = pipe.generate_latents(text, neg, seed=1)
    assert not np.allclose(np.asarray(out), np.asarray(out3))


def test_unrolled_equals_stepwise(tiny_pipeline):
    config, params, pcfg = tiny_pipeline
    rng = np.random.default_rng(0)
    genome = rng.random(STEPS * config.num_blocks * 3) < 0.5
    sched = PixArtCacheSchedule.from_numpy(
        genome, STEPS, config.num_blocks, name="rand"
    )
    pipe = PixArtPipeline(pcfg, params, sched)
    text, neg = _embeds(config)
    out_u = pipe.generate_latents(text, neg, seed=3, mode="unrolled")
    out_s = pipe.generate_latents(text, neg, seed=3, mode="stepwise")
    np.testing.assert_allclose(
        np.asarray(out_u), np.asarray(out_s), rtol=1e-4, atol=1e-4
    )


def test_cached_schedule_differs_but_close(tiny_pipeline):
    config, params, pcfg = tiny_pipeline
    text, neg = _embeds(config)
    base = PixArtPipeline(pcfg, params).generate_latents(text, neg, seed=5)
    # recompute only every other step
    mask = np.zeros((STEPS, config.num_blocks * 3), dtype=bool)
    mask[::2] = True
    sched = PixArtCacheSchedule(
        config.num_blocks, STEPS, mask=mask, name="every2"
    )
    cached = PixArtPipeline(pcfg, params, sched).generate_latents(
        text, neg, seed=5
    )
    assert not np.allclose(np.asarray(base), np.asarray(cached))
    # trajectories share step-0 and step-2 computations → outputs correlated
    a, b = np.asarray(base).ravel(), np.asarray(cached).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.5, f"cached trajectory diverged entirely (corr={corr})"


def test_shared_stepper_population(tiny_pipeline):
    """Two candidates sharing step patterns must reuse compiled programs and
    produce results identical to per-schedule pipelines."""
    config, params, pcfg = tiny_pipeline
    text, neg = _embeds(config)
    rng = np.random.default_rng(7)
    genomes = [
        rng.random(STEPS * config.num_blocks * 3) < 0.5 for _ in range(2)
    ]
    base_pipe = PixArtPipeline(pcfg, params)
    stepper = SharedModelStepper(base_pipe)
    c = config
    noise = jax.random.normal(
        jax.random.PRNGKey(9), (2, c.sample_size, c.sample_size, 4)
    )
    for g in genomes:
        sched = PixArtCacheSchedule.from_numpy(g, STEPS, c.num_blocks)
        masks = schedule_step_masks(sched, c)
        out_pool = stepper.denoise(masks, noise, text, neg)
        ref_pipe = PixArtPipeline(pcfg, params, sched)
        out_ref = ref_pipe.denoise_stepwise(noise, text, neg)
        np.testing.assert_allclose(
            np.asarray(out_pool), np.asarray(out_ref), rtol=1e-5, atol=1e-5
        )


def test_additional_conditions_pipeline():
    """1024-checkpoint path: size-condition embedders drive the pipeline
    (resolution/aspect inputs constructed internally)."""
    config = PixArtConfig.tiny(
        dtype=jnp.float32, dim=48, num_heads=4, head_dim=12,
        use_additional_conditions=True,
    )
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=2)
    pipe = PixArtPipeline(pcfg, params)
    text, neg = _embeds(config)
    out = pipe.generate_latents(text, neg, seed=0)
    assert out.shape == (2, config.sample_size, config.sample_size, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_schedule_transfer_across_resolutions():
    """ECAD's 256→1024 transfer: the same (steps, blocks, comps) mask drives
    pipelines at different resolutions (schedules are resolution-free)."""
    from ecad_tpu.models.pixart import schedule_step_masks

    rng = np.random.default_rng(0)
    genome = rng.random(2 * 2 * 3) < 0.5
    sched = PixArtCacheSchedule.from_numpy(genome, 2, 2, name="transfer")
    for sample in (8, 16):
        config = PixArtConfig.tiny(dtype=jnp.float32, sample_size=sample)
        _, params = init_params(config, 0)
        pcfg = PixArtPipelineConfig(model=config, num_inference_steps=2)
        pipe = PixArtPipeline(pcfg, params, sched)
        text, neg = _embeds(config)
        out = pipe.generate_latents(text, neg, seed=0)
        assert out.shape == (2, sample, sample, 4)

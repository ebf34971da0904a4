"""The dynamic single-program population denoiser must match the
schedule-specialized pipelines bit-for-bit in semantics (same masks → same
trajectory) while compiling only once for all schedules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.models.pixart import schedule_mask_array
from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
from ecad_tpu.pipelines.pixart_pipeline import PopulationDenoiser
from ecad_tpu.schedules import PixArtCacheSchedule

STEPS = 4


@pytest.fixture(scope="module")
def setup():
    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=STEPS)
    return config, params, pcfg


def _embeds(config, batch=2):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    return (
        jax.random.normal(k1, (batch, config.text_len, config.caption_dim)),
        jax.random.normal(k2, (batch, config.text_len, config.caption_dim)),
        jax.random.normal(
            k3, (batch, config.sample_size, config.sample_size, 4)
        ),
    )


def test_dynamic_matches_specialized(setup):
    config, params, pcfg = setup
    text, neg, noise = _embeds(config)
    base_pipe = PixArtPipeline(pcfg, params)
    denoiser = PopulationDenoiser(base_pipe)

    rng = np.random.default_rng(3)
    for trial in range(3):
        genome = rng.random(STEPS * config.num_blocks * 3) < 0.5
        sched = PixArtCacheSchedule.from_numpy(
            genome, STEPS, config.num_blocks, name=f"cand{trial}"
        )
        # specialized unrolled program (per-schedule compile)
        spec = PixArtPipeline(pcfg, params, sched)
        fn = spec.build_denoise_fn(donate=False)
        want = fn(params, noise, text, neg, None, None)
        # dynamic single program (masks as data)
        masks = schedule_mask_array(sched, config)
        got = denoiser.denoise(masks, noise, text, neg)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4,
            err_msg=f"trial {trial}",
        )
    # one compiled program served all three schedules
    assert len(denoiser._fn_cache) == 1


def test_evaluator_dynamic_mode(setup):
    from ecad_tpu.genetic import CandidateEvaluator, EvalConfig

    config, params, pcfg = setup
    text, neg, _ = _embeds(config)
    pipe = PixArtPipeline(pcfg, params)
    rng = np.random.default_rng(5)
    sched = PixArtCacheSchedule.from_numpy(
        rng.random(STEPS * config.num_blocks * 3) < 0.5, STEPS,
        config.num_blocks,
    )
    dyn = CandidateEvaluator(
        pipe, text, neg, ["a", "b"], EvalConfig(mode="dynamic")
    )
    step = CandidateEvaluator(
        pipe, text, neg, ["a", "b"], EvalConfig(mode="stepwise")
    )
    s_dyn, img_dyn = dyn.evaluate_candidate(sched)
    s_step, img_step = step.evaluate_candidate(sched)
    np.testing.assert_allclose(
        img_dyn.astype(np.int32), img_step.astype(np.int32), atol=1
    )

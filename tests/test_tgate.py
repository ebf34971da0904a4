"""TGATE and pass-through pipeline variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
from ecad_tpu.pipelines.registry import PipelineRegistry, pipeline_from_config
from ecad_tpu.pipelines.tgate import (
    PassThroughPixArtPipeline,
    TGATEPixArtPipeline,
)
from ecad_tpu.schedules.generators import pixart_cache

STEPS = 4


@pytest.fixture(scope="module")
def tiny():
    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=STEPS)
    return config, params, pcfg


def _embeds(config, batch=2):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    return (
        jax.random.normal(k1, (batch, config.text_len, config.caption_dim)),
        jax.random.normal(k2, (batch, config.text_len, config.caption_dim)),
    )


def _tgate_schedule(config, gate):
    from ecad_tpu.schedules.generators.pixart_cache import _tgate_mask
    from ecad_tpu.schedules import PixArtCacheSchedule

    mask, _ = _tgate_mask(config.num_blocks, STEPS, gate, 1, 1, 2)
    return PixArtCacheSchedule(
        config.num_blocks, STEPS,
        mask=mask.reshape(STEPS, -1), name=f"tgate_{gate}",
    )


def test_registry():
    assert "tgate" in PipelineRegistry and "pass_through" in PipelineRegistry
    cls, kw = pipeline_from_config("tgate", {"gate_step": 10})
    assert cls is TGATEPixArtPipeline and kw == {"gate_step": 10}


def test_tgate_runs_and_differs_from_cfg(tiny):
    config, params, pcfg = tiny
    text, neg = _embeds(config)
    sched = _tgate_schedule(config, gate=2)
    tg = TGATEPixArtPipeline(pcfg, params, sched, gate_step=2)
    out = tg.generate_latents(text, neg, seed=0)
    assert out.shape == (2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    base = PixArtPipeline(pcfg, params).generate_latents(text, neg, seed=0)
    assert not np.allclose(np.asarray(out), np.asarray(base))
    # deterministic
    out2 = tg.generate_latents(text, neg, seed=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_tgate_rejects_phase2_cached_attn1(tiny):
    config, params, pcfg = tiny
    from ecad_tpu.schedules import PixArtCacheSchedule
    import numpy as np_

    mask = np_.ones((STEPS, config.num_blocks * 3), dtype=bool)
    mask[3, 0] = False  # attn1 cached after the gate — unsupported
    sched = PixArtCacheSchedule(config.num_blocks, STEPS, mask=mask)
    with pytest.raises(ValueError, match="phase 2 requires"):
        TGATEPixArtPipeline(pcfg, params, sched, gate_step=2)


def test_pass_through_isolated_overhead(tiny):
    config, params, pcfg = tiny
    text, neg = _embeds(config)
    pt = PassThroughPixArtPipeline(pcfg, params)
    out = pt.generate_latents(text, neg, seed=0)
    # zero eps at every step → DPM integrates toward x0 = x (eps=0 ⇒
    # x0=(x−σ·0)/α); the output is finite and text-independent
    text_b = text + 5.0
    out_b = pt.generate_latents(text_b, neg, seed=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_b))


def test_tgate_via_image_generator(tmp_path):
    """gen_tgate schedule JSON → tgate pipeline auto-selected from the
    schedule's embedded pipeline config."""
    from ecad_tpu.image_generators import get_image_generator_type
    from ecad_tpu.schedules.generators.pixart_cache import _tgate_family

    scheds = list(_tgate_family(2, STEPS, [2], [1], [1], [2], True))
    p = tmp_path / "tg.json"
    scheds[0].to_json(p)
    gen = get_image_generator_type("TinyPixArtImageGenerator")(
        schedule_path=p
    )
    assert gen.pipeline_name == "tgate"
    pipe = gen.create_diffusion_pipeline()
    assert isinstance(pipe, TGATEPixArtPipeline)
    assert pipe.gate_step == 2
    embs = gen.encode_prompts(["hi"])
    imgs = gen.generate_images(embs)
    assert len(imgs) == 1

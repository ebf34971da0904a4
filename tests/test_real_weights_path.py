"""Real-weight search-loop wiring (VERDICT r1 item 3).

The flagship capability — evolve schedules that maximize real ImageReward —
needs the train CLI to (a) fail loudly at startup when the real scorer
lacks weights, and (b) plumb a real VAE decode + resident ImageReward
scorer through CandidateEvaluator. These tests exercise both with tiny
random weights (the reference equivalent runs
ecad/genetic/train_nsga2_single_gpu.py:198-232 against HF checkpoints).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecad_tpu.genetic import CandidateEvaluator, EvalConfig
from ecad_tpu.genetic.train import build_parser, resolve_scorer_weights
from ecad_tpu.models import PixArtConfig, init_params
from ecad_tpu.models.vae import VAEConfig, VAEDecoder, VAEDecoderPipeline
from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
from ecad_tpu.schedules import PixArtCacheSchedule

STEPS = 2


class StubTokenizer:
    """BERT-tokenizer stand-in for the tiny vocab (64 ids)."""

    def __call__(self, prompts, padding=None, truncation=None,
                 max_length=35, return_tensors="np"):
        n = len(prompts)
        ids = np.zeros((n, 7), np.int64)
        mask = np.ones((n, 7), np.int64)
        for i, p in enumerate(prompts):
            for j, ch in enumerate(p.encode()[:7]):
                ids[i, j] = ch % 64
        return {"input_ids": ids, "attention_mask": mask}


def _tiny_image_reward_scorer():
    from test_image_reward import synthetic_image_reward_state

    from ecad_tpu.scoring.image_reward import (
        BertConfig,
        ImageRewardScorer,
        ViTConfig,
        convert_image_reward_state_dict,
    )

    params = convert_image_reward_state_dict(synthetic_image_reward_state())
    return ImageRewardScorer(
        params,
        StubTokenizer(),
        vit=ViTConfig.tiny(),
        bert=BertConfig.tiny(intermediate_size=64, encoder_width=32),
        mlp_dims=(64, 16, 1),
    )


def test_scorer_weights_fail_loudly(tmp_path, monkeypatch):
    for var in ("ECAD_IMAGE_REWARD_CHECKPOINT", "ECAD_IMAGE_REWARD_TOKENIZER"):
        monkeypatch.delenv(var, raising=False)
    args = build_parser().parse_args(
        ["--name", "x", "--scorer", "image_reward"]
    )
    with pytest.raises(SystemExit, match="image_reward"):
        resolve_scorer_weights(args)

    # an --image-reward-dir without the checkpoint is rejected too
    args = build_parser().parse_args(
        ["--name", "x", "--scorer", "image_reward",
         "--image-reward-dir", str(tmp_path)]
    )
    with pytest.raises(SystemExit, match="not found"):
        resolve_scorer_weights(args)

    # complete dir but no --weights-root: decoded-image scoring impossible
    (tmp_path / "ImageReward.pt").write_bytes(b"")
    (tmp_path / "tok").mkdir()
    (tmp_path / "tok" / "vocab.txt").write_text("[PAD]\n")
    args = build_parser().parse_args(
        ["--name", "x", "--scorer", "image_reward",
         "--image-reward-dir", str(tmp_path)]
    )
    with pytest.raises(SystemExit, match="weights-root"):
        resolve_scorer_weights(args)


def test_decode_score_integration(monkeypatch):
    """evaluate_candidate → VAE decode_fn → resident ImageReward scorer,
    end-to-end on tiny random weights."""
    import ecad_tpu.scoring.image_reward as ir

    monkeypatch.setattr(ir, "_RESIDENT", _tiny_image_reward_scorer())

    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pcfg = PixArtPipelineConfig(model=config, num_inference_steps=STEPS)
    pipeline = PixArtPipeline(pcfg, params)

    vcfg = VAEConfig.tiny()
    vae_model = VAEDecoder(vcfg)
    z0 = jnp.zeros((1, config.sample_size, config.sample_size, 4))
    vparams = jax.jit(lambda k: vae_model.init(k, z0))(
        jax.random.PRNGKey(1)
    )["params"]
    vae = VAEDecoderPipeline(vcfg, vparams)

    prompts = ["a red fox in snow", "an origami crane"]
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    text = jax.random.normal(k1, (2, config.text_len, config.caption_dim))
    neg = jax.random.normal(k2, (2, config.text_len, config.caption_dim))

    ev = CandidateEvaluator(
        pipeline, text, neg, prompts,
        EvalConfig(scorer="image_reward"),
        decode_fn=vae.decode,
    )
    rng = np.random.default_rng(0)
    sched = PixArtCacheSchedule.from_numpy(
        rng.random(STEPS * config.num_blocks * 3) < 0.5, STEPS,
        config.num_blocks,
    )
    scores, images = ev.evaluate_candidate(sched)

    # VAE upsamples 2x per extra block: tiny config has one upsample
    assert images.shape == (2, config.sample_size * 2, config.sample_size * 2, 3)
    assert images.dtype == np.uint8
    assert np.isfinite(scores["total_score"])
    assert len(scores["score_by_prompt_id"]) == 2
    # the real scorer path was used: scores differ per prompt text
    vals = list(scores["score_by_prompt_id"].values())
    assert vals[0] != vals[1]

"""Full search-protocol timing on one chip (VERDICT r2 item 2).

The reference's per-candidate evaluation unit is 100 ImageReward prompts ×
10 images = 1000 images through generate → score → MACs
(/root/reference/ecad/genetic/train_nsga2_base.py:140-156, pop 72). This
script runs that EXACT unit in-process on the TPU: full-size PixArt-α 256
(bf16 serving weights), dynamic-mode population program, per-chunk
denoise → VAE decode → ImageReward scoring with the whole chain on device
(EvalConfig.return_images=False), real ImageRewardPrompts.txt strings
through the BERT tokenizer path.

Weights are random (wall-clock is weight-independent); the ImageReward
tower is the real architecture (ViT-L/16 + BERT cross-encoder + MLP head)
with random parameters and a deterministic stand-in tokenizer (the BERT
vocab file is not in this image — tokenization cost is microseconds of
host work either way).

Prints:
* search_protocol_candidate_sec — measured sec/candidate (1000 images)
* search_loop_full_protocol — extrapolated pop-72 generation minutes on
  one chip and on a v5e-8 (dp=8 over the pleasingly-parallel
  candidate × prompt × image axis), vs the ≥1 gen/hour BASELINE target.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (cache dir + sync helpers)

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
PROMPT_FILE = REPO / "prompts/ImageRewardPrompts.txt"
N_PROMPTS = 100
IMAGES_PER_PROMPT = 10
BATCH = 25  # 40 even chunks of 25; dynamic-mode caches keep HBM in budget
POP = 72
MEASURED_CANDIDATES = 3


class _StubTokenizer:
    """Deterministic stand-in for the BERT tokenizer (vocab not in image):
    stable per-prompt ids, correct shapes/dtypes, same padding contract."""

    def __call__(self, prompts, padding=None, truncation=None,
                 max_length=35, return_tensors="np"):
        import hashlib

        ids = np.zeros((len(prompts), max_length), np.int32)
        mask = np.zeros((len(prompts), max_length), np.int32)
        for i, p in enumerate(prompts):
            toks = p.split()[: max_length - 2]
            h = [
                int.from_bytes(
                    hashlib.sha256(t.encode()).digest()[:4], "little"
                )
                % 30000
                + 1000
                for t in toks
            ]
            seq = [101] + h + [102]
            ids[i, : len(seq)] = seq
            mask[i, : len(seq)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def main() -> None:
    import jax
    import jax.numpy as jnp

    from ecad_tpu.genetic import CandidateEvaluator, EvalConfig
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.models.vae import random_decoder_pipeline
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule
    from ecad_tpu.scoring import ScorerRegistry
    from ecad_tpu.scoring.image_reward import ImageRewardScorer

    prompts = [
        l.strip() for l in PROMPT_FILE.read_text().splitlines() if l.strip()
    ][:N_PROMPTS]
    assert len(prompts) == N_PROMPTS, len(prompts)

    config = PixArtConfig()
    _, params = init_params(config, 0)
    params = serving_cast(params, config.dtype)
    pipe = PixArtPipeline(
        PixArtPipelineConfig(model=config), params,
        PixArtCacheSchedule.default(),
    )
    vae = random_decoder_pipeline(latent_channels=config.in_channels)

    # real-architecture ImageReward tower, random params
    from ecad_tpu.scoring.image_reward import (
        BertConfig,
        ImageRewardModel,
        ViTConfig,
    )

    vit, bert = ViTConfig(), BertConfig()
    model = ImageRewardModel(vit, bert)
    init = jax.jit(
        lambda k: model.init(
            k,
            jnp.zeros((1, vit.image_size, vit.image_size, 3)),
            jnp.zeros((1, 35), jnp.int32),
            jnp.ones((1, 35), jnp.int32),
        )
    )
    ir_params = init(jax.random.PRNGKey(0))["params"]
    scorer_model = ImageRewardScorer(
        ir_params, _StubTokenizer(), vit=vit, bert=bert
    )
    ScorerRegistry.register(scorer_model, name="image_reward_random")

    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    text = jax.random.normal(
        k1, (N_PROMPTS, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    neg = jax.random.normal(
        k2, (N_PROMPTS, config.text_len, config.caption_dim)
    ).astype(config.dtype)

    evaluator = CandidateEvaluator(
        pipe, text, neg, prompts,
        EvalConfig(
            images_per_prompt=IMAGES_PER_PROMPT,
            batch_size=BATCH,
            mode="dynamic",
            scorer="image_reward_random",
            return_images=False,
        ),
        decode_fn=vae.decode_device,
    )

    rng = np.random.default_rng(0)

    def random_candidate(seed):
        r = np.random.default_rng(seed)
        return PixArtCacheSchedule.from_numpy(
            r.random(20 * config.num_blocks * 3) < 0.5, 20, config.num_blocks,
            name=f"cand_{seed}",
        )

    # warmup: compiles the dynamic program + decode + scorer once
    t0 = time.perf_counter()
    scores, _ = evaluator.evaluate_candidate(random_candidate(999))
    t_warm = time.perf_counter() - t0
    print(
        f"warmup candidate (incl. compile): {t_warm:.1f}s, "
        f"total_score={scores['total_score']:.4f}",
        file=sys.stderr, flush=True,
    )

    times = []
    for i in range(MEASURED_CANDIDATES):
        t0 = time.perf_counter()
        scores, _ = evaluator.evaluate_candidate(random_candidate(i))
        times.append(time.perf_counter() - t0)
    sec_per_cand = float(np.mean(times))
    n_images = N_PROMPTS * IMAGES_PER_PROMPT

    print(
        json.dumps(
            {
                "metric": "search_protocol_candidate_sec",
                "value": round(sec_per_cand, 2),
                "unit": "sec_per_candidate_1000_images",
                "detail": {
                    "images": n_images,
                    "ms_per_image_e2e": round(
                        sec_per_cand / n_images * 1e3, 2
                    ),
                    "chain": "denoise(dynamic, random novel mask) -> VAE "
                    "decode -> ImageReward(ViT-L+BERT, random params), all "
                    "on device; scores only to host",
                    "per_candidate_times": [round(t, 2) for t in times],
                    "batch": BATCH,
                },
            }
        ),
        flush=True,
    )

    gen_min_1chip = POP * sec_per_cand / 60.0
    gen_min_v5e8 = gen_min_1chip / 8.0
    print(
        json.dumps(
            {
                "metric": "search_loop_full_protocol",
                "value": round(gen_min_v5e8, 2),
                "unit": "min_per_pop72_generation_v5e8_extrapolated",
                "vs_baseline": round(60.0 / gen_min_v5e8, 2),
                "detail": {
                    "protocol": "pop 72 x 100 ImageReward prompts x 10 "
                    "images (train_nsga2_base.py:140-156), measured "
                    f"{MEASURED_CANDIDATES} candidates x arithmetic to 72 "
                    "(dynamic mode: zero per-candidate compiles)",
                    "min_per_generation_1chip_measured_x72": round(
                        gen_min_1chip, 2
                    ),
                    "v5e8_note": "candidates are independent (dp over the "
                    "candidate axis; tests/test_mesh_eval.py,"
                    " tests/test_multihost_pod.py); NSGA-II ask/tell is "
                    "host-side milliseconds",
                    "target": ">=1 generation/hour on v5e-8 (BASELINE.json)",
                },
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

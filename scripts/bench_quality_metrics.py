"""FID / CLIP scale evidence on the TPU (VERDICT r2 item 7).

The quality-metric towers are parity-tested against torch at tiny configs
(tests/test_inception.py, test_clip_fid.py) but had no scale numbers.
This measures, with real-architecture random-parameter towers (throughput
is weight-independent):

* inception_fid_images_per_sec — InceptionV3-FID features (299², 2048-d)
* clip_score_images_per_sec — CLIP ViT-B/32 vision + text towers + both
  projections + cosine score (the clip-score protocol)
* image_reward_images_per_sec — the search objective tower (re-measured
  r3 alongside the others)
* fid_e2e — an actual end-to-end FID between two generated image sets
  (PixArt tiny pipeline, default vs ours_fast-style masks) through
  FIDStats.from_images → fid_between, exercising compute_fid's machinery
  beyond unit tests.

Mirrors /root/reference/ecad/benchmark/compute_fid.py / compute_clip.py.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

import numpy as np  # noqa: E402

BATCH = 64


def report(metric, value, unit, **detail):
    print(
        json.dumps(
            {"metric": metric, "value": value, "unit": unit,
             "detail": detail}
        ),
        flush=True,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    images = np.random.default_rng(0).integers(
        0, 256, (BATCH, 256, 256, 3), dtype=np.uint8
    )
    prompts = [f"a photo of object {i}" for i in range(BATCH)]

    # ---- InceptionV3-FID features ----------------------------------------
    from ecad_tpu.scoring.inception import (
        InceptionFeatureExtractor,
        InceptionV3FID,
    )

    model = InceptionV3FID()
    init = jax.jit(lambda k: model.init(k, jnp.zeros((1, 299, 299, 3))))
    inc = InceptionFeatureExtractor(init(jax.random.PRNGKey(0))["params"])

    imgs_dev = jnp.asarray(images)
    sec = bench.time_fn(
        lambda: inc._features(
            inc.params,
            2.0
            * jax.image.resize(
                imgs_dev.astype(jnp.float32) / 255.0,
                (BATCH, 299, 299, 3),
                method="bilinear",
            )
            - 1.0,
        ),
        sync_out=bench.sync,
        warmup=2,
        samples=5,
    )
    report(
        "inception_fid_images_per_sec", round(BATCH / sec, 1), "img/s",
        batch=BATCH, ms_per_image=round(sec / BATCH * 1e3, 3),
        note="2048-d pool features incl. on-device bilinear 299 resize",
    )

    # ---- CLIP score (vision + text towers + projections) -----------------
    from ecad_tpu.models.clip import CLIPTextConfig, CLIPTextEncoder
    from ecad_tpu.scoring.clip_score import (
        CLIPVisionConfig,
        CLIPVisionEncoder,
    )

    vc, tc = CLIPVisionConfig(), CLIPTextConfig()
    vision, text = CLIPVisionEncoder(vc), CLIPTextEncoder(tc)
    vinit = jax.jit(
        lambda k: vision.init(
            k, jnp.zeros((1, vc.image_size, vc.image_size, 3))
        )
    )
    tinit = jax.jit(
        lambda k: text.init(k, jnp.zeros((1, 77), jnp.int32))
    )
    vp = vinit(jax.random.PRNGKey(1))["params"]
    tp = tinit(jax.random.PRNGKey(2))["params"]
    rng = np.random.default_rng(1)
    vproj = jnp.asarray(
        rng.standard_normal((vc.hidden_size, 512), dtype=np.float32) * 0.02
    )
    tproj = jnp.asarray(
        rng.standard_normal((tc.hidden_size, 512), dtype=np.float32) * 0.02
    )
    ids = jnp.asarray(
        rng.integers(0, 49000, (BATCH, 77), dtype=np.int32)
    )

    from ecad_tpu.scoring.clip_score import (
        CLIP_IMAGE_MEAN,
        CLIP_IMAGE_STD,
    )

    @jax.jit
    def clip_score(vp, tp, vproj, tproj, images_u8, ids):
        x = images_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(
            x, (x.shape[0], vc.image_size, vc.image_size, 3),
            method="bicubic",
        )
        x = (x - jnp.asarray(CLIP_IMAGE_MEAN)) / jnp.asarray(CLIP_IMAGE_STD)
        img = vision.apply({"params": vp}, x) @ vproj
        _, pooled = text.apply({"params": tp}, ids)
        txt = pooled @ tproj
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        return 100.0 * jnp.maximum(jnp.sum(img * txt, axis=-1), 0.0)

    sec = bench.time_fn(
        lambda: clip_score(vp, tp, vproj, tproj, imgs_dev, ids),
        sync_out=bench.sync, warmup=2, samples=5,
    )
    report(
        "clip_score_images_per_sec", round(BATCH / sec, 1), "img/s",
        batch=BATCH, ms_per_image=round(sec / BATCH * 1e3, 3),
        note="ViT-B/32 vision + text towers + projections + cosine, "
        "on-device preprocess",
    )

    # ---- ImageReward (the search objective) ------------------------------
    from ecad_tpu.scoring.image_reward import (
        BertConfig,
        ImageRewardModel,
        ViTConfig,
    )

    vit, bert = ViTConfig(), BertConfig()
    ir = ImageRewardModel(vit, bert)
    ir_init = jax.jit(
        lambda k: ir.init(
            k,
            jnp.zeros((1, vit.image_size, vit.image_size, 3)),
            jnp.zeros((1, 35), jnp.int32),
            jnp.ones((1, 35), jnp.int32),
        )
    )
    irp = ir_init(jax.random.PRNGKey(3))["params"]
    ir_ids = jnp.asarray(rng.integers(0, 30000, (BATCH, 35), dtype=np.int32))
    ir_mask = jnp.ones((BATCH, 35), jnp.int32)

    from ecad_tpu.scoring.image_reward import IMAGE_MEAN, IMAGE_STD

    @jax.jit
    def ir_score(p, images_u8, ids, mask):
        x = images_u8.astype(jnp.float32) / 255.0
        x = jax.image.resize(
            x, (x.shape[0], vit.image_size, vit.image_size, 3),
            method="bicubic",
        )
        x = (x - jnp.asarray(IMAGE_MEAN)) / jnp.asarray(IMAGE_STD)
        return ir.apply({"params": p}, x, ids, mask)

    sec = bench.time_fn(
        lambda: ir_score(irp, imgs_dev, ir_ids, ir_mask),
        sync_out=bench.sync, warmup=2, samples=5,
    )
    report(
        "image_reward_images_per_sec", round(BATCH / sec, 1), "img/s",
        batch=BATCH, ms_per_image=round(sec / BATCH * 1e3, 3),
        note="ViT-L/16 + BERT cross-encoder + MLP head, on-device "
        "preprocess",
    )

    # ---- end-to-end FID between two generated sets -----------------------
    from ecad_tpu.scoring.fid import (
        FeatureExtractorRegistry,
        FIDStats,
        fid_between,
    )

    FeatureExtractorRegistry.register(inc, name="inception_random")

    from ecad_tpu.image_generators import get_image_generator_type

    n_set = 32
    gen = get_image_generator_type("TinyPixArtImageGenerator")(batch_size=16)
    emb = gen.encode_prompts([f"fid probe {i}" for i in range(n_set)])
    for e in emb:
        e.setdefault("name", "fid")
    set_a = np.stack(gen.generate_images(emb, 1))
    gen2 = get_image_generator_type("TinyPixArtImageGenerator")(
        batch_size=16, start_seed=123
    )
    set_b = np.stack(gen2.generate_images(emb, 1))

    noise_set = np.random.default_rng(7).integers(
        0, 256, set_a.shape, dtype=np.uint8
    )
    stats_a = FIDStats.from_images(set_a, extractor="inception_random")
    stats_b = FIDStats.from_images(set_b, extractor="inception_random")
    stats_n = FIDStats.from_images(noise_set, extractor="inception_random")
    same = fid_between(stats_a, stats_a)
    same_dist = fid_between(stats_a, stats_b)
    diff_dist = fid_between(stats_a, stats_n)
    assert abs(same) < 1e-6
    assert np.isfinite(same_dist) and np.isfinite(diff_dist)
    # separation: same-distribution sets (different seeds) must score far
    # closer than a different distribution (uniform noise)
    assert diff_dist > 10 * max(same_dist, 1e-9), (same_dist, diff_dist)
    report(
        "fid_e2e", round(float(diff_dist), 4), "fid",
        note=f"{n_set}-image generated set vs uniform-noise set through "
        "InceptionV3-FID features -> Frechet distance; same-distribution "
        f"control {same_dist:.2e} (≥10x separation asserted), self-FID "
        f"{same:.2e}",
    )


if __name__ == "__main__":
    main()

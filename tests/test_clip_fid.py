"""CLIP score parity (full pipeline vs torch CLIPModel) and FID math."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_clip_score_parity_with_torch():
    """End-to-end CLIP score (vision+text towers + projections + cosine)
    against transformers' CLIPModel on a tiny random-init config."""
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFT, CLIPVisionConfig as HFV

    from ecad_tpu.models.clip import CLIPTextConfig, convert_clip_state_dict
    from ecad_tpu.scoring.clip_score import (
        CLIPScorer,
        CLIPVisionConfig,
        convert_clip_vision_state_dict,
    )

    text_cfg = HFT(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, eos_token_id=98, bos_token_id=97,
        hidden_act="quick_gelu", attention_dropout=0.0,
    )
    vision_cfg = HFV(
        image_size=16, patch_size=8, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    cfg = CLIPConfig.from_text_vision_configs(
        text_cfg, vision_cfg, projection_dim=16
    )
    torch.manual_seed(0)
    hf = CLIPModel(cfg).eval()

    pixels = torch.randn(2, 3, 16, 16)
    ids = torch.randint(0, 97, (2, 12))
    ids[:, -1] = 98
    with torch.no_grad():
        img_emb = hf.get_image_features(pixel_values=pixels)
        txt_emb = hf.get_text_features(input_ids=ids)
        img_n = img_emb / img_emb.norm(dim=-1, keepdim=True)
        txt_n = txt_emb / txt_emb.norm(dim=-1, keepdim=True)
        want = (100 * (img_n * txt_n).sum(-1).clamp(min=0)).numpy()

    state = {k: v.numpy() for k, v in hf.state_dict().items()}
    my_v = CLIPVisionConfig.tiny()
    my_t = CLIPTextConfig.tiny()
    scorer = CLIPScorer(
        my_v, my_t,
        convert_clip_vision_state_dict(state, my_v),
        convert_clip_state_dict(state, my_t),
        state["visual_projection.weight"].T,
        state["text_projection.weight"].T,
        tokenizer=None,
    )
    got = scorer._score(
        scorer.vision_params, scorer.text_params, scorer.vproj, scorer.tproj,
        jnp.asarray(pixels.permute(0, 2, 3, 1).numpy()),
        jnp.asarray(ids.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_fid_math_properties():
    from ecad_tpu.scoring.fid import (
        FIDStats,
        compute_statistics,
        fid_between,
        frechet_distance,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    b = rng.standard_normal((500, 8)) + 2.0
    mu_a, s_a = compute_statistics(a)
    mu_b, s_b = compute_statistics(b)
    # identical distributions → ~0
    assert frechet_distance(mu_a, s_a, mu_a, s_a) == pytest.approx(0, abs=1e-8)
    d = frechet_distance(mu_a, s_a, mu_b, s_b)
    assert d > 8 * 3  # dominated by the mean shift |2|² per dim
    # symmetric
    assert frechet_distance(mu_b, s_b, mu_a, s_a) == pytest.approx(d, rel=1e-6)


def test_fid_stats_cache_and_cli(tmp_path):
    from PIL import Image

    from ecad_tpu.benchmark import compute_fid
    from ecad_tpu.scoring.fid import FIDStats

    rng = np.random.default_rng(1)
    ref_dir = tmp_path / "ref"
    gen_dir = tmp_path / "gen"
    for d, offset in ((ref_dir, 0), (gen_dir, 60)):
        d.mkdir()
        for i in range(8):
            img = (rng.random((16, 16, 3)) * 128 + offset).astype(np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")

    stats_p = tmp_path / "stats.npz"
    compute_fid.main(
        ["--image-dir", str(ref_dir), "--stats", str(stats_p), "--make-stats"]
    )
    assert stats_p.exists()
    compute_fid.main(
        ["--image-dir", str(gen_dir), "--stats", str(stats_p)]
    )
    result = json.loads((gen_dir / "fid_scores.json").read_text())
    assert result["fid"] > 0
    # extractor mismatch is rejected
    with pytest.raises(ValueError, match="computed with"):
        FIDStats.load(stats_p, expect_extractor="inception")


def test_compute_clip_cli_with_mock(tmp_path):
    from PIL import Image

    from ecad_tpu.benchmark import compute_clip

    d = tmp_path / "imgs" / "sched"
    d.mkdir(parents=True)
    for i, pid in enumerate(["p1", "p2"]):
        Image.fromarray(
            np.full((8, 8, 3), i * 100, np.uint8)
        ).save(d / f"00{i}__prompt_id:{pid}__prompt_seed:000__image_seed:000.png")
    pf = tmp_path / "prompts.json"
    pf.write_text(json.dumps(
        [{"id": "p1", "prompt": "a"}, {"id": "p2", "prompt": "b"}]
    ))
    compute_clip.main(
        ["--image-dir", str(tmp_path / "imgs"), "--prompt-file", str(pf),
         "--scorer", "mock"]
    )
    scores = json.loads((d / "clip_scores.json").read_text())
    assert set(scores["avg_by_prompt"]) == {"p1", "p2"}

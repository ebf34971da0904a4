"""ImageReward backbone parity (ViT vs transformers ViTModel, cross-attn
BERT vs transformers BertModel) and synthetic-checkpoint conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def test_vit_parity_with_transformers():
    from transformers import ViTConfig as HFViTConfig, ViTModel

    from ecad_tpu.scoring.image_reward import ViTConfig, VisionTransformer

    hf_cfg = HFViTConfig(
        image_size=16, patch_size=8, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128, hidden_act="gelu",
        layer_norm_eps=1e-6, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = ViTModel(hf_cfg, add_pooling_layer=False).eval()

    pixels = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        want = hf(pixel_values=pixels).last_hidden_state.numpy()

    cfg = ViTConfig.tiny()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    def t(k):
        return state[k].T

    params = {
        "patch_embed": {
            "kernel": state[
                "embeddings.patch_embeddings.projection.weight"
            ].transpose(2, 3, 1, 0),
            "bias": state["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": state["embeddings.cls_token"],
        "pos_embed": state["embeddings.position_embeddings"],
        "norm": {
            "scale": state["layernorm.weight"],
            "bias": state["layernorm.bias"],
        },
    }
    for i in range(2):
        b = f"encoder.layer.{i}"
        params[f"block_{i}"] = {
            "norm1": {
                "scale": state[f"{b}.layernorm_before.weight"],
                "bias": state[f"{b}.layernorm_before.bias"],
            },
            "q": {
                "kernel": t(f"{b}.attention.attention.query.weight"),
                "bias": state[f"{b}.attention.attention.query.bias"],
            },
            "k": {
                "kernel": t(f"{b}.attention.attention.key.weight"),
                "bias": state[f"{b}.attention.attention.key.bias"],
            },
            "v": {
                "kernel": t(f"{b}.attention.attention.value.weight"),
                "bias": state[f"{b}.attention.attention.value.bias"],
            },
            "proj": {
                "kernel": t(f"{b}.attention.output.dense.weight"),
                "bias": state[f"{b}.attention.output.dense.bias"],
            },
            "norm2": {
                "scale": state[f"{b}.layernorm_after.weight"],
                "bias": state[f"{b}.layernorm_after.bias"],
            },
            "fc1": {
                "kernel": t(f"{b}.intermediate.dense.weight"),
                "bias": state[f"{b}.intermediate.dense.bias"],
            },
            "fc2": {
                "kernel": t(f"{b}.output.dense.weight"),
                "bias": state[f"{b}.output.dense.bias"],
            },
        }
    # transformers ViT mlp_ratio: intermediate 128 = 4×32 ✓
    got = VisionTransformer(cfg).apply(
        {"params": params}, jnp.asarray(pixels.permute(0, 2, 3, 1).numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=3e-4, atol=3e-4
    )


def test_bert_cross_parity_with_transformers():
    # BlipTextModel is transformers' port of BLIP's med-BERT — bidirectional
    # self-attention with per-layer cross-attention, exactly ImageReward's
    # text encoder.
    from transformers.models.blip.configuration_blip import BlipTextConfig
    from transformers.models.blip.modeling_blip_text import BlipTextModel

    from ecad_tpu.scoring.image_reward import BertConfig, BertCrossEncoder

    hf_cfg = BlipTextConfig(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=32, encoder_hidden_size=32,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0, is_decoder=True,
    )
    torch.manual_seed(0)
    hf = BlipTextModel(hf_cfg, add_pooling_layer=False).eval()

    ids = torch.randint(0, 64, (2, 9))
    mask = torch.ones((2, 9), dtype=torch.long)
    mask[1, 6:] = 0
    ctx = torch.randn(2, 5, 32)
    with torch.no_grad():
        want = hf(
            input_ids=ids, attention_mask=mask, encoder_hidden_states=ctx
        ).last_hidden_state.numpy()

    cfg = BertConfig.tiny()
    state = {k: v.numpy() for k, v in hf.state_dict().items()}

    def lin(k):
        return {"kernel": state[f"{k}.weight"].T, "bias": state[f"{k}.bias"]}

    def ln(k):
        return {"scale": state[f"{k}.weight"], "bias": state[f"{k}.bias"]}

    params = {
        "word_embeddings": state["embeddings.word_embeddings.weight"],
        "position_embeddings": state["embeddings.position_embeddings.weight"],
        "embed_norm": ln("embeddings.LayerNorm"),
    }
    for i in range(2):
        b = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "self_q": lin(f"{b}.attention.self.query"),
            "self_k": lin(f"{b}.attention.self.key"),
            "self_v": lin(f"{b}.attention.self.value"),
            "self_out": lin(f"{b}.attention.output.dense"),
            "self_norm": ln(f"{b}.attention.output.LayerNorm"),
            "cross_q": lin(f"{b}.crossattention.self.query"),
            "cross_k": lin(f"{b}.crossattention.self.key"),
            "cross_v": lin(f"{b}.crossattention.self.value"),
            "cross_out": lin(f"{b}.crossattention.output.dense"),
            "cross_norm": ln(f"{b}.crossattention.output.LayerNorm"),
            "fc1": lin(f"{b}.intermediate.dense"),
            "fc2": lin(f"{b}.output.dense"),
            "out_norm": ln(f"{b}.output.LayerNorm"),
        }
    got = BertCrossEncoder(cfg).apply(
        {"params": params},
        jnp.asarray(ids.numpy()),
        jnp.asarray(ctx.numpy()),
        jnp.asarray(mask.numpy()),
    )
    got = np.asarray(got)
    np.testing.assert_allclose(got[0], want[0], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(
        got[1, :6], want[1, :6], rtol=3e-4, atol=3e-4
    )


def synthetic_image_reward_state(seed: int = 0) -> dict:
    """ImageReward.pt-layout state dict for the tiny ViT/BERT configs
    (ViTConfig.tiny / BertConfig.tiny(intermediate_size=64,
    encoder_width=32), mlp_dims=(64, 16, 1)). Shared with the decode→score
    integration test."""
    rng = np.random.default_rng(seed)
    state = {}

    def lin(key, cin, cout):
        state[f"{key}.weight"] = rng.standard_normal(
            (cout, cin), dtype=np.float32
        ) * 0.03
        state[f"{key}.bias"] = np.zeros(cout, np.float32)

    def ln(key, d):
        state[f"{key}.weight"] = np.ones(d, np.float32)
        state[f"{key}.bias"] = np.zeros(d, np.float32)

    vd, bd = 32, 32
    ve = "blip.visual_encoder"
    state[f"{ve}.patch_embed.proj.weight"] = rng.standard_normal(
        (vd, 3, 8, 8), dtype=np.float32
    ) * 0.03
    state[f"{ve}.patch_embed.proj.bias"] = np.zeros(vd, np.float32)
    state[f"{ve}.cls_token"] = rng.standard_normal((1, 1, vd), dtype=np.float32)
    state[f"{ve}.pos_embed"] = rng.standard_normal((1, 5, vd), dtype=np.float32)
    ln(f"{ve}.norm", vd)
    for i in range(2):
        b = f"{ve}.blocks.{i}"
        ln(f"{b}.norm1", vd)
        ln(f"{b}.norm2", vd)
        state[f"{b}.attn.qkv.weight"] = rng.standard_normal(
            (3 * vd, vd), dtype=np.float32
        ) * 0.03
        state[f"{b}.attn.qkv.bias"] = np.zeros(3 * vd, np.float32)
        lin(f"{b}.attn.proj", vd, vd)
        lin(f"{b}.mlp.fc1", vd, 4 * vd)
        lin(f"{b}.mlp.fc2", 4 * vd, vd)
    te = "blip.text_encoder.bert"
    state[f"{te}.embeddings.word_embeddings.weight"] = rng.standard_normal(
        (64, bd), dtype=np.float32
    )
    state[f"{te}.embeddings.position_embeddings.weight"] = rng.standard_normal(
        (32, bd), dtype=np.float32
    )
    ln(f"{te}.embeddings.LayerNorm", bd)
    for i in range(2):
        b = f"{te}.encoder.layer.{i}"
        for n in ("query", "key", "value"):
            lin(f"{b}.attention.self.{n}", bd, bd)
            lin(f"{b}.crossattention.self.{n}", bd if n == "query" else vd, bd)
        lin(f"{b}.attention.output.dense", bd, bd)
        ln(f"{b}.attention.output.LayerNorm", bd)
        lin(f"{b}.crossattention.output.dense", bd, bd)
        ln(f"{b}.crossattention.output.LayerNorm", bd)
        lin(f"{b}.intermediate.dense", bd, 2 * bd)
        lin(f"{b}.output.dense", 2 * bd, bd)
        ln(f"{b}.output.LayerNorm", bd)
    dims = [(bd, 64), (64, 16), (16, 1)]
    for j, (cin, cout) in enumerate(dims):
        lin(f"mlp.layers.{j}", cin, cout)
    return state


def test_image_reward_synthetic_checkpoint():
    """Conversion of an ImageReward.pt-layout state dict + end-to-end score."""
    from ecad_tpu.scoring.image_reward import (
        BertConfig,
        ImageRewardModel,
        ViTConfig,
        convert_image_reward_state_dict,
    )

    rng = np.random.default_rng(0)
    state = synthetic_image_reward_state()
    params = convert_image_reward_state_dict(state)
    model = ImageRewardModel(
        ViTConfig.tiny(),
        BertConfig.tiny(intermediate_size=64, encoder_width=32),
        mlp_dims=(64, 16, 1),
    )
    px = jnp.asarray(
        rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    )
    ids = jnp.asarray(rng.integers(0, 64, (2, 7)))
    scores = model.apply({"params": params}, px, ids)
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()


def test_mock_scorer_deterministic():
    from ecad_tpu.scoring import get_scorer

    imgs = np.zeros((2, 8, 8, 3), np.uint8)
    imgs[1] += 1
    s1 = get_scorer("mock")(imgs, ["a", "b"], ["a", "b"])
    s2 = get_scorer("mock")(imgs, ["a", "b"], ["a", "b"])
    assert s1 == s2
    assert s1["score_by_prompt_id"]["a"] != s1["score_by_prompt_id"]["b"]

"""Numerical parity of the Flax text encoders against transformers' torch
implementations on tiny random-init configs (no downloads)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_t5_encoder_parity():
    from transformers import T5Config as HFT5Config
    from transformers.models.t5.modeling_t5 import T5EncoderModel

    from ecad_tpu.models.t5 import T5Config, T5Encoder, convert_t5_state_dict

    hf_cfg = HFT5Config(
        vocab_size=128,
        d_model=32,
        d_kv=8,
        d_ff=64,
        num_layers=2,
        num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
        is_encoder_decoder=False,
        use_cache=False,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    ids = torch.randint(0, 128, (2, 10))
    mask = torch.ones((2, 10), dtype=torch.long)
    mask[1, 6:] = 0
    with torch.no_grad():
        want = hf(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    cfg = T5Config.tiny(
        relative_attention_num_buckets=8, relative_attention_max_distance=16
    )
    params = convert_t5_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    got = T5Encoder(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
    )
    got = np.asarray(got)
    np.testing.assert_allclose(got[0], want[0], rtol=2e-4, atol=2e-4)
    # masked-row positions may differ (torch computes them with mask bias
    # too); compare only valid positions for the masked sample
    np.testing.assert_allclose(got[1, :6], want[1, :6], rtol=2e-4, atol=2e-4)


def test_clip_text_encoder_parity():
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    from ecad_tpu.models.clip import (
        CLIPTextConfig,
        CLIPTextEncoder,
        convert_clip_state_dict,
    )

    hf_cfg = HFCLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        eos_token_id=98,
        bos_token_id=97,
        hidden_act="quick_gelu",
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    ids = torch.randint(0, 97, (2, 12))
    ids[0, 7] = 98  # eos
    ids[1, 11] = 98
    with torch.no_grad():
        out = hf(input_ids=ids)
        want_hidden = out.last_hidden_state.numpy()
        want_pooled = out.pooler_output.numpy()

    cfg = CLIPTextConfig.tiny()
    params = convert_clip_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    got_hidden, got_pooled = CLIPTextEncoder(cfg).apply(
        {"params": params}, jnp.asarray(ids.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got_hidden), want_hidden, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_pooled), want_pooled, rtol=2e-4, atol=2e-4
    )

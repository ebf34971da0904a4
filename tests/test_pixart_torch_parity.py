"""Cross-implementation parity for the PixArt transformer.

An independent torch mirror of the reference block semantics
(ecad/transformer_blocks/cached_transformer_block.py:167-324 — ada_norm_single
modulation order, gated residuals, norm-free cross-attention, tanh-GELU FF)
is evaluated against our Flax model THROUGH the diffusers-named state-dict
converter, catching transcription errors in either the model math or the
checkpoint key mapping. Everything runs on tiny random weights (no
downloads, no diffusers)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


DIM, HEADS, HEAD_DIM, L = 32, 4, 8, 6
FF_MULT = 4


class TorchAttention(torch.nn.Module):
    def __init__(self, kv_dim=DIM):
        super().__init__()
        inner = HEADS * HEAD_DIM
        self.to_q = torch.nn.Linear(DIM, inner)
        self.to_k = torch.nn.Linear(kv_dim, inner)
        self.to_v = torch.nn.Linear(kv_dim, inner)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(inner, DIM)])

    def forward(self, x, ctx=None, mask_bias=None):
        ctx = x if ctx is None else ctx
        b, tq, _ = x.shape
        tk = ctx.shape[1]

        def heads(t, n):
            return t.view(b, n, HEADS, HEAD_DIM).transpose(1, 2)

        q = heads(self.to_q(x), tq)
        k = heads(self.to_k(ctx), tk)
        v = heads(self.to_v(ctx), tk)
        scores = q @ k.transpose(-1, -2) / math.sqrt(HEAD_DIM)
        if mask_bias is not None:
            scores = scores + mask_bias
        att = scores.softmax(-1) @ v
        att = att.transpose(1, 2).reshape(b, tq, -1)
        return self.to_out[0](att)


class TorchPixArtBlock(torch.nn.Module):
    """ada_norm_single BasicTransformerBlock semantics, written from the
    reference forward (cached_transformer_block.py:167-324)."""

    def __init__(self):
        super().__init__()
        self.scale_shift_table = torch.nn.Parameter(torch.randn(6, DIM) / DIM**0.5)
        self.attn1 = TorchAttention()
        self.attn2 = TorchAttention()
        self.ff = torch.nn.ModuleDict({})
        self.ff_in = torch.nn.Linear(DIM, FF_MULT * DIM)
        self.ff_out = torch.nn.Linear(FF_MULT * DIM, DIM)

    def forward(self, h, enc, t6, enc_mask_bias):
        b = h.shape[0]
        mods = self.scale_shift_table[None] + t6.reshape(b, 6, DIM)
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            mods[:, i : i + 1] for i in range(6)
        )
        norm = torch.nn.functional.layer_norm(h, (DIM,), eps=1e-6)
        h = gate_msa * self.attn1(norm * (1 + scale_msa) + shift_msa) + h
        # ada_norm_single: no norm before cross-attention
        h = self.attn2(h, enc, enc_mask_bias) + h
        norm2 = torch.nn.functional.layer_norm(h, (DIM,), eps=1e-6)
        ffh = self.ff_in(norm2 * (1 + scale_mlp) + shift_mlp)
        ffh = torch.nn.functional.gelu(ffh, approximate="tanh")
        h = gate_mlp * self.ff_out(ffh) + h
        return h


def _diffusers_named_state(block: TorchPixArtBlock, i: int) -> dict:
    """Emit the torch block's weights under diffusers key names so our
    converter (models/weights.py) is exercised."""
    sd = {}
    pre = f"transformer_blocks.{i}"
    sd[f"{pre}.scale_shift_table"] = block.scale_shift_table.detach().numpy()
    for name, attn in (("attn1", block.attn1), ("attn2", block.attn2)):
        for proj in ("to_q", "to_k", "to_v"):
            lin = getattr(attn, proj)
            sd[f"{pre}.{name}.{proj}.weight"] = lin.weight.detach().numpy()
            sd[f"{pre}.{name}.{proj}.bias"] = lin.bias.detach().numpy()
        sd[f"{pre}.{name}.to_out.0.weight"] = attn.to_out[0].weight.detach().numpy()
        sd[f"{pre}.{name}.to_out.0.bias"] = attn.to_out[0].bias.detach().numpy()
    sd[f"{pre}.ff.net.0.proj.weight"] = block.ff_in.weight.detach().numpy()
    sd[f"{pre}.ff.net.0.proj.bias"] = block.ff_in.bias.detach().numpy()
    sd[f"{pre}.ff.net.2.weight"] = block.ff_out.weight.detach().numpy()
    sd[f"{pre}.ff.net.2.bias"] = block.ff_out.bias.detach().numpy()
    return sd


def test_block_parity_through_converter():
    from ecad_tpu.models.pixart import PixArtBlock, PixArtConfig
    from ecad_tpu.models.weights import _lin

    torch.manual_seed(0)
    tb = TorchPixArtBlock().eval()

    b, t = 2, 10
    h = torch.randn(b, t, DIM)
    enc = torch.randn(b, L, DIM)
    t6 = torch.randn(b, 6 * DIM)
    mask = torch.ones(b, 1, 1, L)
    mask[1, ..., 4:] = 0
    bias = (1 - mask) * -10000.0
    with torch.no_grad():
        want = tb(h, enc, t6, bias).numpy()

    state = _diffusers_named_state(tb, 0)

    def attn_params(name):
        return {
            "to_q": _lin(state, f"transformer_blocks.0.{name}.to_q"),
            "to_k": _lin(state, f"transformer_blocks.0.{name}.to_k"),
            "to_v": _lin(state, f"transformer_blocks.0.{name}.to_v"),
            "to_out": _lin(state, f"transformer_blocks.0.{name}.to_out.0"),
        }

    params = {
        "scale_shift_table": state["transformer_blocks.0.scale_shift_table"],
        "attn1": attn_params("attn1"),
        "attn2": attn_params("attn2"),
        "ff": {
            "proj_in": _lin(state, "transformer_blocks.0.ff.net.0.proj"),
            "proj_out": _lin(state, "transformer_blocks.0.ff.net.2"),
        },
    }
    config = PixArtConfig.tiny(
        dim=DIM, num_heads=HEADS, head_dim=HEAD_DIM, dtype=jnp.float32
    )
    block = PixArtBlock(config)
    cache = {
        k: jnp.zeros((b, t, DIM))
        for k in ("attn1", "attn2", "ff")
    }
    enc_bias = jnp.asarray(bias.numpy())
    got, _ = block.apply(
        {"params": params},
        jnp.asarray(h.numpy()),
        jnp.asarray(enc.numpy()),
        jnp.asarray(t6.numpy()),
        enc_bias,
        cache,
        (True, True, True),
    )
    np.testing.assert_allclose(
        np.asarray(got), want, rtol=3e-4, atol=3e-4
    )


def test_full_model_conversion_parity_on_shared_pieces():
    """Caption projection + adaln through the converter against a direct
    torch evaluation of the same MLPs (silu/gelu-tanh orders)."""
    import torch.nn.functional as F

    from ecad_tpu.models.common import TextProjection, TimestepEmbedding

    torch.manual_seed(1)
    lin1 = torch.nn.Linear(16, DIM)
    lin2 = torch.nn.Linear(DIM, DIM)
    x = torch.randn(3, 5, 16)
    with torch.no_grad():
        want_caption = lin2(F.gelu(lin1(x), approximate="tanh")).numpy()
        want_timestep = lin2(F.silu(lin1(torch.randn(0, 16)))).numpy()  # shape only

    params = {
        "linear_1": {"kernel": lin1.weight.detach().numpy().T,
                     "bias": lin1.bias.detach().numpy()},
        "linear_2": {"kernel": lin2.weight.detach().numpy().T,
                     "bias": lin2.bias.detach().numpy()},
    }
    got = TextProjection(DIM, dtype=jnp.float32).apply(
        {"params": params}, jnp.asarray(x.numpy())
    )
    np.testing.assert_allclose(
        np.asarray(got), want_caption, rtol=2e-5, atol=2e-5
    )

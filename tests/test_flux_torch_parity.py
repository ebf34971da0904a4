"""Cross-implementation parity for the FLUX blocks.

Independent torch mirrors of the reference block semantics
(ecad/transformer_blocks/cached_flux_transformer_block.py:99-130 single,
:228-291 dual: AdaLayerNormZero modulation, joint attention with RMS qk
norms and interleaved RoPE over [text; image], gated residuals, fused
single-stream proj_out) evaluated against our Flax blocks THROUGH the
diffusers-named state-dict converter."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

DIM, HEADS, HEAD_DIM = 32, 4, 8
MLP = 4 * DIM
T_IMG, T_TXT = 12, 6


def rope_tables(t_txt, t_img):
    import numpy as _np

    from ecad_tpu.models.flux import make_image_ids, rope_freqs

    ids = _np.concatenate([_np.zeros((t_txt, 3)), make_image_ids(3, 4)])
    cos, sin = rope_freqs(ids, (4, 2, 2), 10000)  # head_dim 8 → 4 pairs
    return cos, sin


def apply_rope_torch(x, cos, sin):
    # x (B, H, S, D); pairs = (even, odd) of last dim
    b, h, s, d = x.shape
    xf = x.reshape(b, h, s, d // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    c = torch.tensor(cos)[None, None]
    sn = torch.tensor(sin)[None, None]
    r1 = x1 * c - x2 * sn
    r2 = x2 * c + x1 * sn
    return torch.stack([r1, r2], -1).reshape(b, h, s, d)


def rms(x, w):
    var = x.pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(var + 1e-6) * w


def sdpa(q, k, v):
    scores = q @ k.transpose(-1, -2) / math.sqrt(q.shape[-1])
    return scores.softmax(-1) @ v


class TorchDualBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        lin = torch.nn.Linear
        self.norm1 = lin(DIM, 6 * DIM)
        self.norm1_context = lin(DIM, 6 * DIM)
        inner = HEADS * HEAD_DIM
        for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
            setattr(self, n, lin(DIM, inner))
        self.to_out = lin(inner, DIM)
        self.to_add_out = lin(inner, DIM)
        self.norm_q = torch.nn.Parameter(torch.randn(HEAD_DIM))
        self.norm_k = torch.nn.Parameter(torch.randn(HEAD_DIM))
        self.norm_added_q = torch.nn.Parameter(torch.randn(HEAD_DIM))
        self.norm_added_k = torch.nn.Parameter(torch.randn(HEAD_DIM))
        self.ff_in = lin(DIM, MLP)
        self.ff_out = lin(MLP, DIM)
        self.ffc_in = lin(DIM, MLP)
        self.ffc_out = lin(MLP, DIM)

    def forward(self, img, txt, temb, cos, sin):
        b = img.shape[0]

        def adaln(linear, x):
            mods = linear(torch.nn.functional.silu(temb))[:, None]
            sh, sc, g, sh_m, sc_m, g_m = mods.chunk(6, -1)
            normed = torch.nn.functional.layer_norm(x, (DIM,), eps=1e-6)
            return normed * (1 + sc) + sh, g, sh_m, sc_m, g_m

        n_img, g_msa, sh_mlp, sc_mlp, g_mlp = adaln(self.norm1, img)
        n_txt, cg_msa, csh_mlp, csc_mlp, cg_mlp = adaln(self.norm1_context, txt)

        def heads(t, s):
            return t.view(b, s, HEADS, HEAD_DIM).transpose(1, 2)

        q = rms(heads(self.to_q(n_img), T_IMG), self.norm_q)
        k = rms(heads(self.to_k(n_img), T_IMG), self.norm_k)
        v = heads(self.to_v(n_img), T_IMG)
        qc = rms(heads(self.add_q_proj(n_txt), T_TXT), self.norm_added_q)
        kc = rms(heads(self.add_k_proj(n_txt), T_TXT), self.norm_added_k)
        vc = heads(self.add_v_proj(n_txt), T_TXT)
        q = apply_rope_torch(torch.cat([qc, q], 2), cos, sin)
        k = apply_rope_torch(torch.cat([kc, k], 2), cos, sin)
        v = torch.cat([vc, v], 2)
        att = sdpa(q, k, v).transpose(1, 2).reshape(b, T_TXT + T_IMG, -1)
        ctx_att, img_att = att[:, :T_TXT], att[:, T_TXT:]
        img_att = self.to_out(img_att)
        ctx_att = self.to_add_out(ctx_att)

        img = img + g_msa * img_att
        n2 = torch.nn.functional.layer_norm(img, (DIM,), eps=1e-6)
        ff = self.ff_out(
            torch.nn.functional.gelu(self.ff_in(n2 * (1 + sc_mlp) + sh_mlp), approximate="tanh")
        )
        img = img + g_mlp * ff

        txt = txt + cg_msa * ctx_att
        n2c = torch.nn.functional.layer_norm(txt, (DIM,), eps=1e-6)
        ffc = self.ffc_out(
            torch.nn.functional.gelu(self.ffc_in(n2c * (1 + csc_mlp) + csh_mlp), approximate="tanh")
        )
        txt = txt + cg_mlp * ffc
        return img, txt


def _dual_state(tb: TorchDualBlock) -> dict:
    sd = {}
    p = "transformer_blocks.0"

    def lin(key, mod):
        sd[f"{key}.weight"] = mod.weight.detach().numpy()
        sd[f"{key}.bias"] = mod.bias.detach().numpy()

    lin(f"{p}.norm1.linear", tb.norm1)
    lin(f"{p}.norm1_context.linear", tb.norm1_context)
    for n in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj"):
        lin(f"{p}.attn.{n}", getattr(tb, n))
    lin(f"{p}.attn.to_out.0", tb.to_out)
    lin(f"{p}.attn.to_add_out", tb.to_add_out)
    for name, w in (
        ("norm_q", tb.norm_q), ("norm_k", tb.norm_k),
        ("norm_added_q", tb.norm_added_q), ("norm_added_k", tb.norm_added_k),
    ):
        sd[f"{p}.attn.{name}.weight"] = w.detach().numpy()
    lin(f"{p}.ff.net.0.proj", tb.ff_in)
    lin(f"{p}.ff.net.2", tb.ff_out)
    lin(f"{p}.ff_context.net.0.proj", tb.ffc_in)
    lin(f"{p}.ff_context.net.2", tb.ffc_out)
    return sd


def test_dual_block_parity_through_converter():
    from ecad_tpu.models.flux import FluxConfig, FluxDualBlock

    torch.manual_seed(0)
    tb = TorchDualBlock().eval()
    b = 2
    img = torch.randn(b, T_IMG, DIM)
    txt = torch.randn(b, T_TXT, DIM)
    temb = torch.randn(b, DIM)
    cos, sin = rope_tables(T_TXT, T_IMG)
    with torch.no_grad():
        want_img, want_txt = tb(img, txt, temb, cos, sin)

    # convert through the real converter by embedding in a 1-block state
    from ecad_tpu.models.weights import convert_flux_state_dict

    config = FluxConfig.tiny(
        dim=DIM, num_heads=HEADS, head_dim=HEAD_DIM,
        num_blocks=1, num_single_blocks=0, axes_dims=(4, 2, 2),
        text_len=T_TXT, dtype=jnp.float32,
    )
    state = _dual_state(tb)
    # converter also wants top-level weights; provide minimal extras
    rng = np.random.default_rng(0)
    for key, (cin, cout) in {
        "x_embedder": (config.in_channels, DIM),
        "context_embedder": (config.joint_dim, DIM),
        "time_text_embed.timestep_embedder.linear_1": (256, DIM),
        "time_text_embed.timestep_embedder.linear_2": (DIM, DIM),
        "time_text_embed.guidance_embedder.linear_1": (256, DIM),
        "time_text_embed.guidance_embedder.linear_2": (DIM, DIM),
        "time_text_embed.text_embedder.linear_1": (config.pooled_dim, DIM),
        "time_text_embed.text_embedder.linear_2": (DIM, DIM),
        "norm_out.linear": (DIM, 2 * DIM),
        "proj_out": (DIM, config.in_channels),
    }.items():
        state[f"{key}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        state[f"{key}.bias"] = np.zeros(cout, np.float32)
    params = convert_flux_state_dict(state, config)["block_0"]

    block = FluxDualBlock(config)
    cache = {
        "full_attn": (jnp.zeros((b, T_IMG, DIM)), jnp.zeros((b, T_TXT, DIM))),
        "full_ff": jnp.zeros((b, T_IMG, DIM)),
        "full_ff_context": jnp.zeros((b, T_TXT, DIM)),
    }
    got_img, got_txt, _ = block.apply(
        {"params": params},
        jnp.asarray(img.numpy()),
        jnp.asarray(txt.numpy()),
        jnp.asarray(temb.numpy()),
        jnp.asarray(cos),
        jnp.asarray(sin),
        cache,
        (True, True, True),
    )
    np.testing.assert_allclose(
        np.asarray(got_img), want_img.numpy(), rtol=5e-4, atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_txt), want_txt.numpy(), rtol=5e-4, atol=5e-4
    )


class TorchSingleBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        lin = torch.nn.Linear
        self.norm = lin(DIM, 3 * DIM)
        inner = HEADS * HEAD_DIM
        for n in ("to_q", "to_k", "to_v"):
            setattr(self, n, lin(DIM, inner))
        self.norm_q = torch.nn.Parameter(torch.randn(HEAD_DIM))
        self.norm_k = torch.nn.Parameter(torch.randn(HEAD_DIM))
        self.proj_mlp = lin(DIM, MLP)
        self.proj_out = lin(DIM + MLP, DIM)

    def forward(self, x, temb, cos, sin):
        b, s, _ = x.shape
        mods = self.norm(torch.nn.functional.silu(temb))[:, None]
        sh, sc, gate = mods.chunk(3, -1)
        normed = torch.nn.functional.layer_norm(x, (DIM,), eps=1e-6)
        normed = normed * (1 + sc) + sh
        mlp = torch.nn.functional.gelu(self.proj_mlp(normed), approximate="tanh")

        def heads(t):
            return t.view(b, s, HEADS, HEAD_DIM).transpose(1, 2)

        q = apply_rope_torch(rms(heads(self.to_q(normed)), self.norm_q), cos, sin)
        k = apply_rope_torch(rms(heads(self.to_k(normed)), self.norm_k), cos, sin)
        v = heads(self.to_v(normed))
        att = sdpa(q, k, v).transpose(1, 2).reshape(b, s, -1)
        out = self.proj_out(torch.cat([att, mlp], -1))
        return x + gate * out


def test_single_block_parity_through_converter():
    from ecad_tpu.models.flux import FluxConfig, FluxSingleBlock
    from ecad_tpu.models.weights import convert_flux_state_dict

    torch.manual_seed(1)
    tb = TorchSingleBlock().eval()
    b, s = 2, T_TXT + T_IMG
    x = torch.randn(b, s, DIM)
    temb = torch.randn(b, DIM)
    cos, sin = rope_tables(T_TXT, T_IMG)
    with torch.no_grad():
        want = tb(x, temb, cos, sin).numpy()

    sd = {}
    p = "single_transformer_blocks.0"

    def lin(key, mod):
        sd[f"{key}.weight"] = mod.weight.detach().numpy()
        sd[f"{key}.bias"] = mod.bias.detach().numpy()

    lin(f"{p}.norm.linear", tb.norm)
    for n in ("to_q", "to_k", "to_v"):
        lin(f"{p}.attn.{n}", getattr(tb, n))
    sd[f"{p}.attn.norm_q.weight"] = tb.norm_q.detach().numpy()
    sd[f"{p}.attn.norm_k.weight"] = tb.norm_k.detach().numpy()
    lin(f"{p}.proj_mlp", tb.proj_mlp)
    lin(f"{p}.proj_out", tb.proj_out)

    config = FluxConfig.tiny(
        dim=DIM, num_heads=HEADS, head_dim=HEAD_DIM,
        num_blocks=0, num_single_blocks=1, axes_dims=(4, 2, 2),
        text_len=T_TXT, dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    for key, (cin, cout) in {
        "x_embedder": (config.in_channels, DIM),
        "context_embedder": (config.joint_dim, DIM),
        "time_text_embed.timestep_embedder.linear_1": (256, DIM),
        "time_text_embed.timestep_embedder.linear_2": (DIM, DIM),
        "time_text_embed.guidance_embedder.linear_1": (256, DIM),
        "time_text_embed.guidance_embedder.linear_2": (DIM, DIM),
        "time_text_embed.text_embedder.linear_1": (config.pooled_dim, DIM),
        "time_text_embed.text_embedder.linear_2": (DIM, DIM),
        "norm_out.linear": (DIM, 2 * DIM),
        "proj_out": (DIM, config.in_channels),
    }.items():
        sd[f"{key}.weight"] = rng.standard_normal((cout, cin)).astype(np.float32)
        sd[f"{key}.bias"] = np.zeros(cout, np.float32)
    params = convert_flux_state_dict(sd, config)["single_block_0"]

    block = FluxSingleBlock(config)
    cache = {
        "single_attn": jnp.zeros((b, s, DIM)),
        "single_proj_mlp": jnp.zeros((b, s, MLP)),
        "single_proj_out": jnp.zeros((b, s, DIM)),
    }
    got, _ = block.apply(
        {"params": params},
        jnp.asarray(x.numpy()),
        jnp.asarray(temb.numpy()),
        jnp.asarray(cos),
        jnp.asarray(sin),
        cache,
        (True, True, True),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=5e-4)

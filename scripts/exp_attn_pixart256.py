"""Routing decision for the PixArt-256 attention shapes (headline bench).

Self-attention (B64 H16 T1024 D72, no bias) sits below the long-seq
routing threshold and is served by XLA today; cross-attention
(Tq1024 → Tk120, key-padding bias) likewise. Measures XLA vs the
single-tile Pallas kernel vs the chunked row-block kernel at both shapes
to decide whether the threshold should move (B64 = bench batch 32 × CFG).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def measure(label, fn, *args):
    jfn = jax.jit(fn)
    jfn(*args)
    ms = bench.time_fn(
        lambda: jfn(*args), sync_out=bench.sync, warmup=2, samples=8
    ) * 1e3
    print(
        json.dumps({"metric": label, "value": round(ms, 3), "unit": "ms"}),
        flush=True,
    )
    return ms


def main() -> None:
    import ecad_tpu.ops.attention as A

    b, h, d = 64, 16, 72
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda key, t: (  # noqa: E731
        jax.random.normal(key, (b, t, h, d)).astype(jnp.bfloat16)
    )

    # self-attention: Tq = Tk = 1024, no bias
    q = mk(keys[0], 1024)
    k = mk(keys[1], 1024)
    v = mk(keys[2], 1024)
    measure(
        "p256_self_xla",
        lambda q, k, v: jax.nn.dot_product_attention(q, k, v), q, k, v,
    )
    measure(
        "p256_self_single_tile",
        lambda q, k, v: A.fused_attention.__wrapped__(
            q, k, v, None, False
        ),
        q, k, v,
    )
    measure(
        "p256_self_rowblock",
        lambda q, k, v: A._rowblock_attention(q, k, v, None, False),
        q, k, v,
    )

    # cross-attention: Tk = 120 text tokens, key-padding bias
    kx = mk(keys[1], 120)
    vx = mk(keys[2], 120)
    bias = jnp.where(
        jnp.arange(120)[None, None, None, :] < 100, 0.0, -1e9
    ) * jnp.ones((b, 1, 1, 120))
    measure(
        "p256_cross_xla",
        lambda q, k, v, bias: jax.nn.dot_product_attention(
            q, k, v, bias=bias
        ),
        q, kx, vx, bias,
    )
    measure(
        "p256_cross_single_tile",
        lambda q, k, v, bias: A.fused_attention.__wrapped__(
            q, k, v, bias, False
        ),
        q, kx, vx, bias,
    )
    # FLUX-256 self-attention shapes (256 packed latent + 512 text = 768
    # tokens): full-width head dim 128, width-reduced (dim 1536) head dim
    # 64 — measure whether the single-tile kernel should claim lane-
    # aligned short sequences too, or only the D72 lane-padded regime
    for d_f, tag in ((128, "flux256_fullwidth"), (64, "flux256_dim1536")):
        bf, hf, tf = 8, 24, 768
        kf = jax.random.split(jax.random.PRNGKey(1), 3)
        mkf = lambda key: (  # noqa: E731
            jax.random.normal(key, (bf, tf, hf, d_f)).astype(jnp.bfloat16)
        )
        qf, kk, vf = mkf(kf[0]), mkf(kf[1]), mkf(kf[2])
        measure(
            f"{tag}_self_xla",
            lambda q, k, v: jax.nn.dot_product_attention(q, k, v),
            qf, kk, vf,
        )
        measure(
            f"{tag}_self_single_tile",
            lambda q, k, v: A.fused_attention.__wrapped__(
                q, k, v, None, False
            ),
            qf, kk, vf,
        )


if __name__ == "__main__":
    main()

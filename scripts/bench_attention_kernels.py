"""Attention-kernel shootout on the real TPU at the two headline shapes.

Shapes (self-attention, bf16, no bias — what the DiT towers emit):
* FLUX-1024:   B2  H24 T4608 D128 (4096 packed latent + 512 text joint)
* PixArt-1024: B8  H16 T4096 D72  (4096 latent tokens, head_dim 72)

Contenders:
* xla        — jax.nn.dot_product_attention (the fallback path)
* flash      — KV-blocked online-softmax streaming kernel (round-2 winner:
               6.0 ms at the FLUX shape)
* rowblock/N — single-pass row-block kernel (round 3): whole key sequence
               VMEM-resident, exp2 softmax with scale·log2e prefolded into
               q, q-block size N
* transposed — sublane-contracted kernel for lane-padded head dims
               (round 4): head dim on SUBLANES of every operand, so D=72
               pads to 80 sublanes instead of 128 lanes on both matmuls
* auto       — the public fused_attention() routing — what the models
               actually call

Each row prints ms and max|err| vs an fp32 einsum reference computed on
device. Used to pick _ROWBLOCK_BLOCK_Q and the D=72 routing; this one
script regenerates the BENCH_LADDER `kernels` section (VERDICT r3 item 9).
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (repo-root bench.py: sync + cache-dir setup)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SHAPES = {
    "flux1024": dict(b=2, h=24, t=4608, d=128),
    "pixart1024": dict(b=8, h=16, t=4096, d=72),
}


def make_inputs(b, h, t, d):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    mk = lambda key: (  # noqa: E731
        jax.random.normal(key, (b, t, h, d)).astype(jnp.bfloat16)
    )
    return mk(keys[0]), mk(keys[1]), mk(keys[2])


def fp32_reference(q, k, v):
    """fp32 softmax-attention reference on a 2-head slice (the full
    (B,H,T,T) fp32 logits at the PixArt shape are 2×8.6 GB — OOM on a
    16 GB chip; a slice is enough for an error bound)."""
    qf, kf, vf = (x[:, :, :2].astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bqhd,bkhd->bhqk", qf, kf) / np.sqrt(q.shape[-1])
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vf)


def measure(fn, q, k, v):
    jfn = jax.jit(fn)
    out = jfn(q, k, v)
    err = None
    ms = bench.time_fn(
        lambda: jfn(q, k, v), sync_out=bench.sync, warmup=2, samples=8
    )
    return ms * 1e3, out


def main() -> None:
    import ecad_tpu.ops.attention as A

    for name, s in SHAPES.items():
        q, k, v = make_inputs(**s)
        ref = fp32_reference(q, k, v)
        bench.sync(ref)

        rows = {}

        def err(out):
            return float(
                jnp.abs(out[:, :, :2].astype(jnp.float32) - ref).max()
            )

        ms, out = measure(
            lambda q, k, v: jax.nn.dot_product_attention(q, k, v), q, k, v
        )
        rows["xla"] = (ms, err(out))

        saved = A._ROWBLOCK_MAX_KV_ELEMS
        A._ROWBLOCK_MAX_KV_ELEMS = 0  # force streaming kernel
        ms, out = measure(
            lambda q, k, v: A._flash_attention(q, k, v, None, False), q, k, v
        )
        A._ROWBLOCK_MAX_KV_ELEMS = saved
        rows["flash"] = (ms, err(out))

        # sweep the q-block knob the kernel actually reads for this shape:
        # _ROWBLOCK_BLOCK_Q for lane-aligned head dims, _PADDED_D otherwise
        # (ops/attention.py _rowblock_attention); restore both afterwards
        saved_bq = (A._ROWBLOCK_BLOCK_Q, A._ROWBLOCK_BLOCK_Q_PADDED_D)
        padded = s["d"] % 128 != 0
        try:
            for bq in (128, 256, 512):
                if padded:
                    A._ROWBLOCK_BLOCK_Q_PADDED_D = bq
                else:
                    A._ROWBLOCK_BLOCK_Q = bq
                ms, out = measure(
                    lambda q, k, v: A._rowblock_attention(
                        q, k, v, None, False
                    ),
                    q,
                    k,
                    v,
                )
                rows[f"rowblock/{bq}"] = (ms, err(out))
        finally:
            A._ROWBLOCK_BLOCK_Q, A._ROWBLOCK_BLOCK_Q_PADDED_D = saved_bq

        if padded:
            ms, out = measure(
                lambda q, k, v: A._transposed_attention(
                    q, k, v, None, False
                ),
                q,
                k,
                v,
            )
            rows["transposed"] = (ms, err(out))

        ms, out = measure(
            lambda q, k, v: A.fused_attention(q, k, v), q, k, v
        )
        rows["auto"] = (ms, err(out))

        for label, (ms, err) in rows.items():
            print(
                json.dumps(
                    {
                        "metric": f"attn_{name}_{label.replace('/', '_bq')}",
                        "value": round(ms, 3),
                        "unit": "ms",
                        "detail": {"shape": s, "max_abs_err_vs_fp32": err},
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

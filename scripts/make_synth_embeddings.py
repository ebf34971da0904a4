"""Synthesize random prompt-embedding files for latency protocol runs.

The reference's compute_latency.py times the diffusion pipeline on saved
embeddings; the text encoder is outside the timed region, so random
embeddings give identical timing without T5/CLIP checkpoints. Writes one
NPZ per prompt in the PixArt layout (types.py:13-18 keys). FLUX via
--model flux (prompt_embeds 512×4096 + pooled 768).

Usage:
  python scripts/make_synth_embeddings.py OUT_DIR [--n 4] [--model pixart]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out_dir", type=Path)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--model", choices=["pixart", "flux"], default="pixart")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    args.out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(args.n):
        name = f"{i:03}__prompt_id:{i}__prompt_seed:{i:03}"
        if args.model == "pixart":
            data = {
                "prompt_embeds": rng.standard_normal(
                    (120, 4096), dtype=np.float32
                ),
                "prompt_attention_mask": np.ones((120,), np.int64),
                "negative_prompt_embeds": rng.standard_normal(
                    (120, 4096), dtype=np.float32
                ),
                "negative_prompt_attention_mask": np.ones((120,), np.int64),
            }
        else:
            data = {
                "prompt_embeds": rng.standard_normal(
                    (512, 4096), dtype=np.float32
                ),
                "pooled_prompt_embeds": rng.standard_normal(
                    (768,), dtype=np.float32
                ),
            }
        np.savez(args.out_dir / f"{name}.npz", **data)
    print(f"wrote {args.n} {args.model} embedding files to {args.out_dir}")


if __name__ == "__main__":
    main()

"""compute_clip — CLIP score for generated images against their prompts.

Parity with ecad/benchmark/compute_clip.py: resolves prompts from image
filenames via the naming-mode regexes (5 patterns incl. mjhq/coco,
:18-33), scores each schedule directory, writes clip_scores.json. Runs
in-process on the Flax CLIP towers instead of shelling out to
`python -m clip_score` (:180-214).
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

import numpy as np

from ..scoring import get_scorer
from .prompts import normalize_prompt_id, read_benchmark_prompts
from .score_images import NAMING_MODES, parse_prompt_id


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--image-dir", type=Path, required=True)
    p.add_argument("--prompt-file", type=Path, required=True)
    p.add_argument("--naming", choices=sorted(NAMING_MODES),
                   default="image_reward")
    p.add_argument("--scorer", default="clip",
                   help="scorer registry name (clip needs "
                        "ECAD_CLIP_MODEL_DIR; mock for smoke tests)")
    args = p.parse_args(argv)

    prompts_by_id = {}
    for name, prompt in read_benchmark_prompts(args.prompt_file).items():
        m = re.search(r"prompt_id:(?P<pid>.+?)__", name)
        pid = m.group("pid") if m else name.split("__")[0]
        prompts_by_id[normalize_prompt_id(pid)] = prompt

    from PIL import Image

    leaf_dirs = sorted({q.parent for q in args.image_dir.rglob("*.png")})
    scorer = get_scorer(args.scorer)
    for d in leaf_dirs:
        images, prompts, ids = [], [], []
        for q in sorted(d.glob("*.png")):
            pid = parse_prompt_id(q.stem, args.naming)
            if pid is None:
                continue
            images.append(np.asarray(Image.open(q).convert("RGB")))
            prompts.append(prompts_by_id.get(pid, pid))
            ids.append(pid)
        if not images:
            continue
        result = scorer(np.stack(images), prompts, ids)
        out = d / "clip_scores.json"
        with out.open("w") as f:
            json.dump(result, f, indent=4)
        print(f"{d}: CLIP score = {result['total_score']:.4f}")


if __name__ == "__main__":
    main()

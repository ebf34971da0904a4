"""Distill a search run's per-generation objective trend into one JSON.

The committed evidence for the on-TPU NSGA-II run (VERDICT r3 item 1,
deliverable a) can't be the full 500 MB run directory; this script reads
every generation's checkpoint.npz (X bool genome, F = [1 - fidelity_dB,
macs_T] — the reference's "1 - score" minimize convention,
population_io.py load_evaluation_scores — G hamming constraint) and
emits a compact trend record: per-gen
hypervolume, Pareto-front size, and best fidelity within fixed MACs
budgets. The monotone hypervolume rise is the "objective actually moved"
proof the reference's published searches carry implicitly
(/root/reference/ecad/train_nsga2_base.py:255-283 — each generation's
population directory is the reference's own audit trail).

Usage:
  python scripts/distill_search_trend.py --run-dir search_runs/fidelity_pixart256_v2 \
      [--out <run-dir>/trend.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from ecad_tpu.genetic import hypervolume_2d  # noqa: E402
from ecad_tpu.genetic.nsga2 import fast_non_dominated_sort  # noqa: E402

# fixed compute budgets (schedule MACs, T) at which the trend reports the
# best fidelity seen so far; the PixArt-256 defaults: 0.66 T ≈ the paper
# ours_fast point's budget, 1.4 T ≈ recompute-every-2, 5.6 T ≈ uncached
# (macs.py transformer MACs). FLUX searches pass --budgets scaled to that
# model's uncached MACs (dim-1536/20-step uncached ≈ 180 T).
BUDGETS_T = (0.4, 0.66, 1.0, 1.4, 2.8)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", type=pathlib.Path, required=True)
    ap.add_argument("--out", type=pathlib.Path, default=None)
    ap.add_argument("--budgets", type=float, nargs="+",
                    default=list(BUDGETS_T),
                    help="MACs budgets (T) for the best-fidelity-so-far "
                    "curves; defaults are PixArt-256-scale")
    args = ap.parse_args()

    pops = args.run_dir / "populations"
    names = [p.name for p in pops.iterdir() if p.is_dir()]
    assert len(names) == 1, names
    ckpts = sorted((pops / names[0]).glob("gen_*/checkpoint.npz"))
    assert ckpts, f"no checkpoints under {pops}"

    # hypervolume reference point: worst corner across the whole run so
    # per-gen values are comparable (fidelity floor 0 dB, MACs ceiling =
    # max observed)
    all_F = []
    per_gen = []
    for ck in ckpts:
        d = np.load(ck)
        # F is the current evaluated parent population ([1 - fidelity_dB,
        # macs_T]); the checkpoint's `pending` array is the OFFSPRING
        # genome matrix awaiting evaluation (nsga2.py ask/tell), not a
        # per-row validity flag. Shift F[:,0] to -fidelity_dB so the
        # hypervolume floor and the budget curves are in true dB.
        F = d["F"]
        F = F[np.isfinite(F).all(axis=1)]
        F = F - np.array([1.0, 0.0])
        if not len(F):
            continue
        per_gen.append((int(ck.parent.name.split("_")[1]), F))
        all_F.append(F)
    cat = np.concatenate(all_F)
    ref = np.array([0.0, float(cat[:, 1].max()) * 1.05])

    trend = []
    seen = None  # best-so-far archive for the budget curves
    for gen, F in per_gen:
        seen = F if seen is None else np.concatenate([seen, F])
        front = F[fast_non_dominated_sort(F)[0]] if len(F) else F
        row = {
            "gen": gen,
            "n_evaluated": int(len(F)),
            "front_size": int(len(front)),
            "hypervolume": round(float(hypervolume_2d(F, ref)), 4),
            "best_fidelity_db_at_macs_T": {
                str(b): round(float(-seen[seen[:, 1] <= b, 0].min()), 3)
                if (seen[:, 1] <= b).any()
                else None
                for b in args.budgets
            },
        }
        trend.append(row)

    out = {
        "run_dir": str(args.run_dir),
        "objectives": ["-fidelity_dB (checkpoint F[:,0] - 1; trajectory "
                       "SNR vs uncached)",
                       "macs_T (schedule transformer MACs)"],
        "hv_reference_point": [float(ref[0]), round(float(ref[1]), 4)],
        "generations": trend,
        "summary": {
            "gen_first": trend[0]["gen"],
            "gen_last": trend[-1]["gen"],
            "hypervolume_first": trend[0]["hypervolume"],
            "hypervolume_last": trend[-1]["hypervolume"],
            "hypervolume_gain_pct": round(
                100.0
                * (trend[-1]["hypervolume"] / max(trend[0]["hypervolume"],
                                                  1e-12) - 1.0),
                2,
            ),
        },
    }
    out_path = args.out or (args.run_dir / "trend.json")
    out_path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out["summary"]))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

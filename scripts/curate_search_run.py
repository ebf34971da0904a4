"""Curate a search run directory for committing as evidence.

A full run directory is ~0.5 GB (every generation's 24-72 candidate
schedule JSONs); the committed evidence keeps the complete, auditable
algorithm chain at ~2% of that:

  - gen_000/candidates/            (the heuristic seeds)
  - gen_<last>/candidates/         (the final population)
  - every gen_*/checkpoint.npz     (full X/F/G + RNG state per cycle —
                                    any intermediate generation's genomes
                                    are reconstructable from these)
  - every gen_*/manager_config.json
  - benchmarks/<name>/gen_<last evaluated>/  (final scores)
  - train.log, trend.json, search_quality.json, README.md

This PRINTS the `git add -f` command for the curated set (search_runs/
is gitignored; evidence is force-added deliberately) and, with --prune,
deletes the unselected candidate directories. The pixart run
(search_runs/fidelity_pixart256_v2) was curated to exactly this shape in
round 4, by hand; this script makes the curation reproducible.

Usage: python scripts/curate_search_run.py --run-dir search_runs/<name>
           [--prune]
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", type=pathlib.Path, required=True)
    ap.add_argument("--prune", action="store_true",
                    help="delete unselected candidate dirs (keeps "
                    "checkpoints/configs/logs)")
    args = ap.parse_args()
    run = args.run_dir.resolve()
    pops_root = run / "populations"
    names = [p.name for p in pops_root.iterdir() if p.is_dir()]
    assert len(names) == 1, names
    name = names[0]
    pops = pops_root / name
    gens = sorted(pops.glob("gen_*"))
    assert gens, f"no generations under {pops}"
    last = gens[-1]

    bench_root = run / "benchmarks" / name
    bench_gens = sorted(bench_root.glob("gen_*")) if bench_root.exists() \
        else []

    keep: list[pathlib.Path] = []
    for g in gens:
        keep += sorted(g.glob("checkpoint.npz"))
        keep += sorted(g.glob("manager_config.json"))
    for g in (gens[0], last):
        cand = g / "candidates"
        if cand.exists():
            keep.append(cand)
    if bench_gens:
        keep.append(bench_gens[-1])
    for fname in ("train.log", "trend.json", "search_quality.json",
                  "README.md"):
        f = run / fname
        if f.exists():
            keep.append(f)

    rels = [p.relative_to(REPO) for p in keep]
    print(f"curated set: {len(rels)} paths "
          f"(gens {gens[0].name}..{last.name}, "
          f"final scores {bench_gens[-1].name if bench_gens else 'none'})")
    print("git add -f " + " ".join(str(r) for r in rels))

    if args.prune:
        pruned = 0
        for g in gens[1:-1]:
            cand = g / "candidates"
            if cand.exists():
                shutil.rmtree(cand)
                pruned += 1
        for g in bench_gens[:-1]:
            shutil.rmtree(g)
            pruned += 1
        print(f"pruned {pruned} unselected candidate/benchmark dirs",
              file=sys.stderr)


if __name__ == "__main__":
    main()

"""Seed a FLUX NSGA-II run's gen_000 from the heuristic schedule families
and the paper's evolved points (pop 24 — the reference's FLUX population
size, /root/reference/ecad/genetic/flux_population_io_manager.py:37).

Same protocol as seed_search_population.py (the PixArt seeder): the
reference never starts real searches from random genomes — gen_000 is a
density ladder of heuristics plus crossover donors from the evolved
regime, and train's init_gen_0 loads exactly such a directory
(/root/reference/ecad/genetic/train_nsga2_base.py:184-252).

Composition (24 candidates, deduplicated, genome = 3420 genes for 20
steps: per step 19 dual blocks × {full_attn, full_ff, full_ff_context}
then 38 single blocks × {single_attn, single_proj_mlp, single_proj_out};
ecad_tpu/schedules/flux.py):
  * gen_recompute_all_every_n   n ∈ {2,3,4,5,6,8,10,14,20} — FORA-style
  * gen_recompute_attn_every_n  n ∈ {2,4,8}
  * gen_evenly_cache_mlp_ff_evenly_spaced — corners of the grid
  * gen_evenly_cache_single_full_attn_evenly_spaced — corners
  * schedules_in_paper flux_256 ours_fast / ours_faster (the reference's
    evolved points — crossover donors for the low-MACs regime)
  * random fill to --population-size with the reference's high-density
    skew (0.6–0.95 recompute probability)

Usage:
  python scripts/seed_flux_search_population.py --name fidelity_flux256 \
      --populations-dir search_runs/fidelity_flux256/populations \
      --benchmarks-dir search_runs/fidelity_flux256/benchmarks
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
PAPER_DIR = REPO / "schedules/schedules_in_paper/flux_256"

NUM_BLOCKS = 19
NUM_SINGLE = 38
STEPS = 20


def heuristic_vectors() -> list[tuple[str, np.ndarray]]:
    import ecad_tpu.schedules.generators.flux_cache as G

    out = []
    keep_all_n = {2, 3, 4, 5, 6, 8, 10, 14, 20}
    for sched in G.gen_recompute_all_every_n(NUM_BLOCKS, NUM_SINGLE, STEPS):
        n = int(sched.name.rsplit("_", 1)[1])
        if n in keep_all_n:
            out.append((sched.name, sched.to_numpy(flatten=True)))
    keep_attn_n = {2, 4, 8}
    for sched in G.gen_recompute_attn_every_n(NUM_BLOCKS, NUM_SINGLE, STEPS):
        n = int(sched.name.rsplit("_", 1)[1])
        if n in keep_attn_n:
            out.append((sched.name, sched.to_numpy(flatten=True)))
    # corners + centre of each evenly-spaced grid (affected blocks × steps)
    for fam, keep in (
        ("gen_evenly_cache_mlp_ff_evenly_spaced",
         {(56, 19), (26, 13), (51, 19)}),
        ("gen_evenly_cache_single_full_attn_evenly_spaced",
         {(46, 16), (31, 11)}),
    ):
        for sched in getattr(G, fam)(NUM_BLOCKS, NUM_SINGLE, STEPS):
            parts = sched.name.split("_")
            n_blocks, n_steps = int(parts[-4]), int(parts[-1])
            if (n_blocks, n_steps) in keep:
                out.append((sched.name, sched.to_numpy(flatten=True)))
    return out


def paper_vectors() -> list[tuple[str, np.ndarray]]:
    from ecad_tpu.schedules import FluxCacheSchedule

    out = []
    for name in ("ours_fast", "ours_faster"):
        sched = FluxCacheSchedule.from_json(PAPER_DIR / f"{name}.json")
        out.append((name, sched.to_numpy(flatten=True)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--name", required=True)
    ap.add_argument("--populations-dir", type=pathlib.Path, required=True)
    ap.add_argument("--benchmarks-dir", type=pathlib.Path, required=True)
    ap.add_argument("--population-size", type=int, default=24)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from ecad_tpu.genetic import FluxPopulationIOManager

    named = heuristic_vectors() + paper_vectors()

    seen: set[bytes] = set()
    vectors: list[np.ndarray] = []
    names: list[str] = []
    for name, v in named:
        v = np.asarray(v, dtype=bool)
        if v.tobytes() in seen:
            continue
        seen.add(v.tobytes())
        vectors.append(v)
        names.append(name)
        if len(vectors) == args.population_size:
            break

    rng = np.random.default_rng(args.seed)
    n_var = vectors[0].shape[0]
    assert n_var == STEPS * (NUM_BLOCKS + NUM_SINGLE) * 3, n_var
    while len(vectors) < args.population_size:
        p = rng.uniform(0.6, 0.95)
        v = rng.random(n_var) < p
        if v.tobytes() in seen:
            continue
        seen.add(v.tobytes())
        vectors.append(v)
        names.append(f"random_p{p:.2f}")

    mgr = FluxPopulationIOManager(
        args.name,
        all_populations_dir=args.populations_dir,
        all_benchmarks_dir=args.benchmarks_dir,
        generation_num=0,
        num_inference_steps=STEPS,
        population_size=args.population_size,
    )
    X0 = np.stack(vectors)
    paths = mgr.save_population(X0, generation=0)
    densities = X0.mean(axis=1)
    n_random = sum(1 for n in names if n.startswith("random"))
    print(
        f"Seeded {len(paths)} candidates into {paths[0].parent}\n"
        f"  densities: min {densities.min():.3f} max {densities.max():.3f} "
        f"mean {densities.mean():.3f}\n"
        f"  sources: {len(vectors) - n_random} named, {n_random} random"
    )
    for i, n in enumerate(names):
        print(f"  cand_{i:03d}: {n}")


if __name__ == "__main__":
    main()

"""Seed a PixArt NSGA-II run's gen_000 from the heuristic schedule
families, the paper's evolved points, and (optionally) a previous run's
Pareto front.

The reference never starts its real searches from random genomes: the
committed seed population at
/root/reference/schedules/population_initialization/pixart_alpha_256x256/
gen_000/candidates (72 candidates, bit-density 0.055–1.0 skewed high) is
the heuristic families laid out as a density ladder, and train_nsga2's
init_gen_0 loads exactly such a directory
(/root/reference/ecad/genetic/train_nsga2_base.py:184-252). A
random-seeded run starts at ~0.5 density where every candidate is far
from the high-fidelity near-default corner, so the front takes hundreds
of generations to reach the regime the heuristics already occupy — this
script reproduces the reference's protocol instead.

Composition (72 candidates, deduplicated):
  * gen_recompute_all_every_n        — all 19 (FORA-style, density ladder)
  * gen_recompute_ca_sa_every_n      — n = 2..8
  * gen_tgate                        — all 6
  * gen_evenly_cache_{ca,sa,ff}_evenly_spaced — affected {1,13,27} ×
    steps {1,9,19} (9 per family — corners + centre of each grid)
  * schedules_in_paper ours_fast/faster/fastest (the reference's evolved
    points — crossover donors for the low-MACs regime)
  * --carry-from RUN_DIR: the final Pareto front of a previous run
  * random fill to --population-size with the reference's high-density
    skew (0.6–0.95 recompute probability)

Usage:
  python scripts/seed_search_population.py --name fidelity_pixart256_v2 \
      --populations-dir search_runs/v2/populations \
      --benchmarks-dir search_runs/v2/benchmarks \
      --carry-from search_runs/fidelity_pixart256
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]
PAPER_DIR = REPO / "schedules/schedules_in_paper/pixart_alpha_256"

NUM_BLOCKS = 28
STEPS = 20


def heuristic_vectors() -> list[tuple[str, np.ndarray]]:
    import ecad_tpu.schedules.generators.pixart_cache as G

    out = []
    for sched in G.gen_recompute_all_every_n(NUM_BLOCKS, STEPS):
        out.append((sched.name, sched.to_numpy(flatten=True)))
    for sched in G.gen_recompute_ca_sa_every_n(NUM_BLOCKS, STEPS):
        n = int(sched.name.rsplit("_", 1)[1])
        if n <= 8:
            out.append((sched.name, sched.to_numpy(flatten=True)))
    for sched in G.gen_tgate(NUM_BLOCKS, STEPS):
        out.append((sched.name, sched.to_numpy(flatten=True)))
    keep_aff = {1, 13, 27}
    keep_steps = {1, 9, 19}
    for fam in (
        "gen_evenly_cache_ca_evenly_spaced",
        "gen_evenly_cache_sa_evenly_spaced",
        "gen_evenly_cache_ff_evenly_spaced",
    ):
        for sched in getattr(G, fam)(NUM_BLOCKS, STEPS):
            parts = sched.name.split("_")
            aff, stp = int(parts[-4]), int(parts[-1])
            if aff in keep_aff and stp in keep_steps:
                out.append((sched.name, sched.to_numpy(flatten=True)))
    return out


def paper_vectors() -> list[tuple[str, np.ndarray]]:
    from ecad_tpu.schedules import PixArtCacheSchedule

    out = []
    for name in ("ours_fast", "ours_faster", "ours_fastest"):
        sched = PixArtCacheSchedule.from_json(PAPER_DIR / f"{name}.json")
        out.append((name, sched.to_numpy(flatten=True)))
    return out


def carry_front_vectors(run_dir: pathlib.Path) -> list[tuple[str, np.ndarray]]:
    """Final-generation Pareto front of a previous run (checkpoint.npz)."""
    from ecad_tpu.genetic import NSGA2
    from ecad_tpu.genetic.nsga2 import fast_non_dominated_sort

    pops = run_dir / "populations"
    names = [p.name for p in pops.iterdir() if p.is_dir()]
    assert len(names) == 1, names
    ckpts = sorted((pops / names[0]).glob("gen_*/checkpoint.npz"))
    assert ckpts, f"no checkpoints under {pops / names[0]}"
    algo = NSGA2.load(ckpts[-1])
    front = fast_non_dominated_sort(algo.F)[0]
    return [
        (f"{names[0]}_front_{j:02d}", np.asarray(algo.X[i], dtype=bool))
        for j, i in enumerate(front)
    ]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--name", required=True)
    ap.add_argument("--populations-dir", type=pathlib.Path, required=True)
    ap.add_argument("--benchmarks-dir", type=pathlib.Path, required=True)
    ap.add_argument("--population-size", type=int, default=72)
    ap.add_argument("--carry-from", type=pathlib.Path, default=None,
                    help="previous run dir whose final Pareto front joins "
                         "the seeds")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from ecad_tpu.genetic import PixArtPopulationIOManager

    named = heuristic_vectors() + paper_vectors()
    if args.carry_from is not None:
        named += carry_front_vectors(args.carry_from)

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
    while len(vectors) < args.population_size:
        # reference seed-density skew: recompute-heavy genomes
        p = rng.uniform(0.6, 0.95)
        v = rng.random(n_var) < p
        if v.tobytes() in seen:
            continue
        seen.add(v.tobytes())
        vectors.append(v)
        names.append(f"random_p{p:.2f}")

    mgr = PixArtPopulationIOManager(
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
    print(
        f"Seeded {len(paths)} candidates into {paths[0].parent}\n"
        f"  densities: min {densities.min():.3f} max {densities.max():.3f} "
        f"mean {densities.mean():.3f}\n"
        f"  sources: {len(named)} named candidates "
        f"({len(vectors) - (len(names) - sum(1 for n in names if n.startswith('random')))}"
        f" used), {sum(1 for n in names if n.startswith('random'))} random"
    )
    for i, n in enumerate(names):
        print(f"  cand_{i:03d}: {n}")


if __name__ == "__main__":
    main()

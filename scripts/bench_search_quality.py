"""Search-quality analysis: does the evolved Pareto front dominate the
heuristic schedule families? (VERDICT r3 item 1, deliverables b + c.)

The reference's core claim is that NSGA-II-evolved schedules beat the
heuristic baselines (FORA-style recompute-every-n, TGATE, evenly-spaced
grids) at equal compute (ecad/genetic/train_nsga2_base.py:255-283 drives
the search; schedules_in_paper/** are its outputs). This script measures
that claim for OUR on-TPU search with the trajectory-fidelity objective:

1. rebuilds the exact evaluator the search ran (same seed → same noise
   batch → same uncached reference trajectory, dynamic mode, full-size
   PixArt-α 256, bf16 serving weights),
2. evaluates every heuristic family member + the paper's evolved
   `ours_fast/faster/fastest` points under that objective,
3. re-evaluates the evolved front candidates from the search run dir
   (no trust in the on-disk scores — same program, fresh numbers),
4. reports per-family dominance at equal MACs and hypervolume in
   (−fidelity_dB, macs_T) space, plus a plot-data JSON.

Both model families are supported (--model-family): `pixart` rebuilds
the full-size PixArt-alpha 256 evaluator; `flux` rebuilds the FLUX search's
evaluator (width-reduced dim-1536, all 57 blocks, the real 3420-gene
genome, 4 prompts, seed 0 -- exactly train.py's --flux-dim 1536 path) and
compares against the FLUX heuristic families
(reference flux_schedule_generators.py:15-373) plus the paper's
flux_256 ours_fast/ours_faster points.

Usage:
  python scripts/bench_search_quality.py --run-dir search_runs/fidelity_pixart256 \
      [--model-family pixart] [--out .../search_quality.json]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench  # noqa: E402  (repo-root: compile-cache env)

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parents[1]

STEPS = 20
SEED = 0

FAMILY = {
    "pixart": dict(
        num_blocks=28,
        num_prompts=16,
        paper_dir="schedules_in_paper/pixart_alpha_256",
        paper_names=("ours_fast", "ours_faster", "ours_fastest"),
        heuristics=(
            "gen_recompute_all_every_n",  # FORA-style
            "gen_recompute_ca_sa_every_n",
            "gen_tgate",
            "gen_evenly_cache_ca_evenly_spaced",
            "gen_evenly_cache_sa_evenly_spaced",
            "gen_evenly_cache_ff_evenly_spaced",
        ),
    ),
    "flux": dict(
        num_blocks=19,
        num_single_blocks=38,
        num_prompts=4,  # the search ran --num-prompts 4
        paper_dir="schedules_in_paper/flux_256",
        paper_names=("ours_fast", "ours_faster"),
        heuristics=(
            "gen_recompute_all_every_n",  # FORA-style
            "gen_recompute_attn_every_n",
            "gen_evenly_cache_mlp_ff_evenly_spaced",
            "gen_evenly_cache_single_full_attn_evenly_spaced",
        ),
    ),
}


def build_evaluator(family: str):
    """The search's evaluator, bit-identically (train.py build_evaluator
    with the run's flags: full-size PixArt / dim-1536 FLUX, seed 0,
    dynamic mode)."""
    import jax

    from ecad_tpu.genetic import CandidateEvaluator, EvalConfig

    fam = FAMILY[family]
    n_prompts = fam["num_prompts"]
    cfg = EvalConfig(scorer="fidelity", mode="dynamic", return_images=False)
    if family == "flux":
        from ecad_tpu.genetic.evaluate import FluxCandidateEvaluator
        from ecad_tpu.models.common import random_serving_params
        from ecad_tpu.models.flux import FluxConfig, init_flux_params
        from ecad_tpu.pipelines.flux_pipeline import (
            FluxPipeline,
            FluxPipelineConfig,
        )

        config = FluxConfig(dim=1536, num_heads=12)
        params = random_serving_params(
            jax.eval_shape(lambda: init_flux_params(config, SEED)[1]),
            seed=SEED,
            dtype=config.dtype,
        )
        pipe = FluxPipeline(
            FluxPipelineConfig(
                model=config, num_inference_steps=STEPS,
                height=256, width=256,
            ),
            params,
        )
        k1, k2 = jax.random.split(jax.random.PRNGKey(SEED))
        text = jax.random.normal(
            k1, (n_prompts, config.text_len, config.joint_dim)
        ).astype(config.dtype)
        pooled = jax.random.normal(k2, (n_prompts, config.pooled_dim)).astype(
            config.dtype
        )
        prompts = [f"prompt_{i}" for i in range(n_prompts)]
        return FluxCandidateEvaluator(pipe, text, pooled, prompts, cfg)

    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.models.common import serving_cast
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig

    config = PixArtConfig()
    _, params = init_params(config, SEED)
    pipe = PixArtPipeline(
        PixArtPipelineConfig(model=config, num_inference_steps=STEPS),
        params,
    )
    pipe.params = serving_cast(pipe.params, config.dtype)
    k1, k2 = jax.random.split(jax.random.PRNGKey(SEED))
    text = jax.random.normal(
        k1, (n_prompts, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    neg = jax.random.normal(
        k2, (n_prompts, config.text_len, config.caption_dim)
    ).astype(config.dtype)
    prompts = [f"prompt_{i}" for i in range(n_prompts)]
    return CandidateEvaluator(pipe, text, neg, prompts, cfg)


def macs_T(schedule) -> float:
    from ecad_tpu.macs import attach_metrics

    attach_metrics(schedule)
    return float(schedule.metrics["total_macs_T"])


def eval_point(ev, schedule, name: str, family: str) -> dict:
    t0 = time.perf_counter()
    scores, _ = ev.evaluate_candidate(schedule)
    return {
        "name": name,
        "family": family,
        "fidelity_db": float(scores["total_score"]),
        "macs_T": macs_T(schedule),
        "eval_sec": round(time.perf_counter() - t0, 2),
    }


def heuristic_points(ev, family: str) -> list[dict]:
    fam = FAMILY[family]
    if family == "flux":
        import ecad_tpu.schedules.generators.flux_cache as G

        gen_args = (fam["num_blocks"], fam["num_single_blocks"], STEPS)
    else:
        import ecad_tpu.schedules.generators.pixart_cache as G

        gen_args = (fam["num_blocks"], STEPS)
    points = []
    for name in fam["heuristics"]:
        for sched in getattr(G, name)(*gen_args):
            points.append(eval_point(ev, sched, sched.name, name))
            print(json.dumps(points[-1]), flush=True)
    return points


def paper_points(ev, family: str) -> list[dict]:
    from ecad_tpu.schedules import FluxCacheSchedule, PixArtCacheSchedule

    fam = FAMILY[family]
    cls = FluxCacheSchedule if family == "flux" else PixArtCacheSchedule
    paper_dir = REPO / "schedules" / fam["paper_dir"]
    points = []
    for name in fam["paper_names"]:
        sched = cls.from_json(paper_dir / f"{name}.json")
        points.append(eval_point(ev, sched, name, "paper_evolved_reference"))
        print(json.dumps(points[-1]), flush=True)
    return points


def evolved_front_points(
    ev, run_dir: pathlib.Path, family: str, evolved_set: str = "archive"
) -> tuple[list[dict], int]:
    """Re-evaluate the search's non-dominated output with this evaluator.

    `evolved_set='final'` takes the last checkpoint's population front
    (what the r4 verifier did). `'archive'` (default) takes the
    non-dominated set over EVERY candidate the search evaluated — the
    union of all checkpoints' (X, F) — which is the run's true output:
    NSGA-II's fixed-size population necessarily drops front coverage in
    regions of low hypervolume contribution (the near-uncached corner),
    but the dropped candidates were still found, scored and saved by the
    search (the reference likewise publishes schedules picked from
    population directories at any generation, e.g. the σ transfer
    artifact from gen 250). Either way every returned point is
    re-evaluated fresh - no on-disk score is trusted."""
    import numpy as np

    from ecad_tpu.genetic import (
        FluxPopulationIOManager,
        NSGA2,
        PixArtPopulationIOManager,
    )
    from ecad_tpu.genetic.nsga2 import fast_non_dominated_sort

    pops = run_dir / "populations"
    names = [p.name for p in pops.iterdir() if p.is_dir()]
    assert len(names) == 1, names
    gens = sorted((pops / names[0]).glob("gen_*/checkpoint.npz"))
    assert gens, f"no checkpoints under {pops / names[0]}"
    gen_num = int(gens[-1].parent.name.split("_")[1])
    if evolved_set == "final":
        algo = NSGA2.load(gens[-1])
        X, F = algo.X, algo.F
    else:
        assert evolved_set == "archive", evolved_set
        xs, fs, seen = [], [], set()
        for ck in gens:
            algo = NSGA2.load(ck)
            for x, f in zip(algo.X, algo.F):
                key = np.packbits(x).tobytes()
                if key in seen:
                    continue
                seen.add(key)
                xs.append(x)
                fs.append(f)
        X, F = np.array(xs), np.array(fs)
        print(f"archive: {len(X)} unique evaluated candidates", flush=True)
    mgr_cls = (
        FluxPopulationIOManager if family == "flux"
        else PixArtPopulationIOManager
    )
    mgr = mgr_cls(
        names[0],
        all_populations_dir=pops,
        all_benchmarks_dir=run_dir / "benchmarks",
        generation_num=gen_num,
        num_inference_steps=STEPS,
    )
    front_idx = fast_non_dominated_sort(F)[0]
    points = []
    for j, i in enumerate(front_idx):
        sched = mgr.vector_to_schedule(X[i], int(i))
        p = eval_point(ev, sched, f"evolved_{j:02d}", "evolved")
        p["search_F"] = [float(v) for v in F[i]]
        points.append(p)
        print(json.dumps(p), flush=True)
    return points, gen_num


def dominance_stats(evolved: list[dict], others: list[dict]) -> dict:
    """For each non-evolved point: is there an evolved point with
    macs_T <= point's (+tol) and fidelity >= point's? Strict dominance =
    at least one inequality strict."""
    tol = 1e-9
    by_family: dict[str, dict] = {}
    for p in others:
        dominated = any(
            e["macs_T"] <= p["macs_T"] + tol
            and e["fidelity_db"] >= p["fidelity_db"] - tol
            and (
                e["macs_T"] < p["macs_T"] - tol
                or e["fidelity_db"] > p["fidelity_db"] + tol
            )
            for e in evolved
        )
        fam = by_family.setdefault(
            p["family"], {"n": 0, "dominated": 0, "undominated": []}
        )
        fam["n"] += 1
        fam["dominated"] += int(dominated)
        if not dominated:
            fam["undominated"].append(p["name"])
    for fam in by_family.values():
        fam["dominated_pct"] = round(100.0 * fam["dominated"] / fam["n"], 1)
    return by_family


def uncached_macs_T(family: str) -> float:
    """Analytic MACs of the all-recompute (uncached) schedule — the
    anchor for the useful-region cut. CPU-only (macs.py)."""
    from ecad_tpu.schedules import FluxCacheSchedule, PixArtCacheSchedule

    fam = FAMILY[family]
    if family == "flux":
        sched = FluxCacheSchedule.default(
            STEPS, fam["num_blocks"], fam["num_single_blocks"]
        )
    else:
        sched = PixArtCacheSchedule.default(STEPS, fam["num_blocks"])
    return macs_T(sched)


# A heuristic point offering less than this MACs saving vs uncached is a
# near-identity schedule (e.g. FLUX "cache 1 of 57 blocks for 1 of 20
# steps" = 99.5% of uncached MACs, 1.005x speedup): its trajectory is
# within measurement noise of uncached, so its fidelity sits above any
# genuinely-caching point's by construction, and no acceleration user
# would deploy it. The useful-region stats exclude that corner; the raw
# stats keep it.
USEFUL_REGION_MIN_SAVING = 0.05


def dominance_in_useful_region(
    evolved: list[dict], others: list[dict], uncached_T: float
) -> dict:
    cut = (1.0 - USEFUL_REGION_MIN_SAVING) * uncached_T
    useful = [p for p in others if p["macs_T"] <= cut]
    stats = dominance_stats(evolved, useful)
    return {
        "comment": (
            "dominance restricted to heuristic points saving >= "
            f"{USEFUL_REGION_MIN_SAVING:.0%} of uncached MACs "
            f"(macs_T <= {cut:.2f} of uncached {uncached_T:.2f}); "
            "near-identity schedules above the cut are within "
            "measurement noise of the uncached trajectory and outside "
            "any acceleration deployment"
        ),
        "macs_cut_T": round(cut, 3),
        "n_excluded_near_identity": len(others) - len(useful),
        "per_family": stats,
        "overall_dominated_pct": round(
            100.0 * sum(f["dominated"] for f in stats.values())
            / max(1, sum(f["n"] for f in stats.values())), 1),
    }


def hypervolumes(evolved, heuristics) -> dict:
    from ecad_tpu.genetic import hypervolume_2d

    def F(points):
        return np.array(
            [[-p["fidelity_db"], p["macs_T"]] for p in points], np.float64
        )
    all_F = np.concatenate([F(evolved), F(heuristics)])
    ref = all_F.max(axis=0) + 1.0
    return {
        "ref_point_neg_fid_macsT": [float(v) for v in ref],
        "evolved": hypervolume_2d(F(evolved), ref),
        "heuristics_union": hypervolume_2d(F(heuristics), ref),
        "evolved_plus_heuristics": hypervolume_2d(all_F, ref),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run-dir", type=pathlib.Path, required=True)
    ap.add_argument("--model-family", choices=sorted(FAMILY),
                    default="pixart")
    ap.add_argument("--out", type=pathlib.Path, default=None)
    ap.add_argument("--skip-heuristics", action="store_true",
                    help="reuse heuristic points from an existing --out file")
    ap.add_argument("--evolved-set", choices=("archive", "final"),
                    default="archive",
                    help="non-dominated set over every candidate the "
                    "search evaluated (archive, default) or only the "
                    "final population's front (final)")
    ap.add_argument("--stats-only", action="store_true",
                    help="recompute every statistic from the existing "
                    "--out file's measured points (no chip, no re-eval)")
    args = ap.parse_args()
    out_path = args.out or (args.run_dir / "search_quality.json")

    if args.stats_only:
        prev = json.loads(out_path.read_text())
        evolved = [p for p in prev["points"] if p["family"] == "evolved"]
        gen_num = prev["final_generation"]
        evolved_set = prev.get("evolved_set", "archive")
        heur = [p for p in prev["points"] if p["family"] != "evolved"
                and p["family"] != "paper_evolved_reference"]
        paper = [p for p in prev["points"]
                 if p["family"] == "paper_evolved_reference"]
    else:
        evolved_set = args.evolved_set
        ev = build_evaluator(args.model_family)
        evolved, gen_num = evolved_front_points(ev, args.run_dir,
                                                args.model_family,
                                                args.evolved_set)
        if args.skip_heuristics and out_path.exists():
            prev = json.loads(out_path.read_text())
            heur = [p for p in prev["points"] if p["family"] != "evolved"
                    and p["family"] != "paper_evolved_reference"]
            paper = [p for p in prev["points"]
                     if p["family"] == "paper_evolved_reference"]
        else:
            heur = heuristic_points(ev, args.model_family)
            paper = paper_points(ev, args.model_family)

    stats = {
        "final_generation": gen_num,
        "evolved_set": evolved_set,
        "evolved_points": len(evolved),
        "objective": "trajectory fidelity (latent SNR dB vs uncached) "
                     "maximized; total_macs_T minimized",
        "dominance_at_equal_macs": dominance_stats(evolved, heur + paper),
        "dominance_useful_region": dominance_in_useful_region(
            evolved, heur + paper, uncached_macs_T(args.model_family)),
        "hypervolume": hypervolumes(evolved, heur),
        "points": evolved + heur + paper,
    }
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(stats, indent=1))

    dom = stats["dominance_at_equal_macs"]
    summary = {
        "metric": f"search_quality_dominance_pct_{args.model_family}",
        "value": round(
            100.0
            * sum(f["dominated"] for k, f in dom.items()
                  if k != "paper_evolved_reference")
            / max(1, sum(f["n"] for k, f in dom.items()
                         if k != "paper_evolved_reference")),
            1,
        ),
        "unit": "pct_heuristics_dominated",
        "detail": {
            "per_family": {
                k: f["dominated_pct"] for k, f in dom.items()
            },
            "hypervolume": stats["hypervolume"],
            "out": str(out_path),
        },
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()

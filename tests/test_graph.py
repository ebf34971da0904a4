"""DiT topology DSL tests: plan construction semantics (skip / repeat /
parallel / reverse), validation, JSON round-trip, and model integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ecad_tpu.graph import (
    DiTSchedule,
    build_plan,
    check_for_cycles,
    default_config,
    execute_plan,
    middle_repeat,
    middle_skip,
    parallel,
    plan_block_sequence,
    reverse,
    skip_blocks,
    verify_matching_io,
)


def _trace_plan(config, n_blocks=6):
    """Execute a plan symbolically: blocks append their index."""
    plan = build_plan(config)
    log = []

    def apply(i, x):
        log.append(i)
        return x + 10 ** i

    out = execute_plan(plan, 0.0, apply)
    return log, out, plan


def test_default_sequential():
    log, _, plan = _trace_plan(default_config(6))
    assert log == [0, 1, 2, 3, 4, 5]
    assert plan_block_sequence(plan) == log


def test_skip_blocks():
    log, _, _ = _trace_plan(skip_blocks(6, [2, 3]))
    assert log == [0, 1, 4, 5]


def test_middle_skip_even_odd():
    assert plan_block_sequence(build_plan(middle_skip(6, 2))) == [0, 1, 4, 5]
    assert plan_block_sequence(build_plan(middle_skip(7, 3))) == [0, 1, 5, 6]


def test_middle_repeat_unrolls():
    # skip 1..4, loop block 2 for repeat_count=3 extra passes → 1 + 3 applies
    cfg = middle_repeat(6, 1, 4)
    log, _, _ = _trace_plan(cfg)
    assert log == [0, 2, 2, 2, 2, 5]


def test_parallel_add_and_avg():
    cfg = parallel(6, 2, 4, 0, "add")
    plan = build_plan(cfg)
    order = plan_block_sequence(plan)
    assert sorted(order[:2]) == [0, 1] and sorted(order[2:5]) == [2, 3, 4]
    assert order[5] == 5

    # numeric check: blocks multiply by (i+2); parallel segment sums/avgs
    def apply(i, x):
        return x * (i + 2)

    out_add = execute_plan(plan, 1.0, apply)
    # chain: 1*2*3 = 6 → fan to blocks 2,3,4: 6*4+6*5+6*6 = 90 → *7 = 630
    assert out_add == 630
    out_avg = execute_plan(build_plan(parallel(6, 2, 4, 0, "avg")), 1.0, apply)
    assert out_avg == pytest.approx(630 / 3)


def test_looped_parallel():
    cfg = parallel(6, 2, 3, loop_count=2, aggregate_func="avg")
    log, _, _ = _trace_plan(cfg)
    # fan of (2,3) executed 1 + 2 times; block 4 stays sequential after it
    assert log[:2] == [0, 1] and log[-2:] == [4, 5]
    assert sorted(log[2:-2]) == [2, 2, 2, 3, 3, 3]


def test_reverse_plan():
    assert plan_block_sequence(build_plan(reverse(6, 1, 4))) == [0, 4, 3, 2, 1, 5]
    assert plan_block_sequence(build_plan(reverse(6, 0, 5))) == [5, 4, 3, 2, 1, 0]


def test_validation_errors():
    cfg = default_config(4)
    cfg["1"]["inputs"] = ["7"]
    with pytest.raises(ValueError, match="missing from"):
        verify_matching_io(cfg)
    cyc = default_config(3)
    cyc["2"]["outputs"] = ["0"]
    cyc["0"]["inputs"] = ["2"]
    with pytest.raises(ValueError, match="Cycle"):
        check_for_cycles(cyc)
    multi = parallel(6, 2, 4)
    del multi["dummy_after"]["input_type"]
    with pytest.raises(ValueError, match="no input_type"):
        verify_matching_io(multi)


def test_dit_schedule_json_round_trip(tmp_path):
    s = DiTSchedule(
        6, 3, "mix",
        {
            0: default_config(6),
            1: middle_repeat(6, 1, 4),
            2: parallel(6, 2, 4, 0, "avg"),
        },
        attributes={"x": 1},
    )
    p = tmp_path / "s.json"
    s.to_json(p)
    s2 = DiTSchedule.from_json(p)
    assert s2.schedule == s.schedule
    assert s2.attributes == {"x": 1}
    assert s2.block_sequence(1) == s.block_sequence(1)
    assert not s2.is_default()
    assert DiTSchedule.default(6, 3).is_default()
    dots = s.visualize(tmp_path / "viz")
    assert len(dots) == 3 and "digraph" in dots[0].read_text()


def test_generators_registry_and_counts():
    from ecad_tpu.graph.generators import GEN_FUNCTIONS

    expected = {
        "gen_default",
        "gen_skip_block_individual_evenly_spaced",
        "gen_skip_block_all_timesteps",
        "gen_skip_block_progressive",
        "gen_middle_skip_progressive",
        "gen_middle_skip_evenly_spaced",
        "gen_middle_parallel_all_timesteps",
        "gen_middle_parallel_progressive",
        "gen_middle_parallel_evenly_spaced",
        "gen_middle_looped_parallel_all_timesteps",
        "gen_middle_looped_parallel_progressive",
        "gen_middle_looped_parallel_evenly_spaced",
        "gen_middle_repeat_all_timesteps",
        "gen_middle_repeat_progressive",
        "gen_middle_repeat_evenly_spaced",
        "gen_reverse_all_timesteps",
        "gen_middle_reverse_progressive",
        "gen_middle_reverse_evenly_spaced",
    }
    assert expected <= set(GEN_FUNCTIONS)
    # every generated schedule has valid plans for every step
    for name in ["gen_middle_repeat_all_timesteps", "gen_reverse_all_timesteps"]:
        for s in GEN_FUNCTIONS[name](6, 4):
            for step in range(4):
                s.plan(step)


def test_model_runs_topology_plan():
    from ecad_tpu.models import PixArtConfig, full_step_mask, init_cache, init_params
    from ecad_tpu.graph import build_plan

    config = PixArtConfig.tiny(dtype=jnp.float32)
    model, params = init_params(config, 0)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 32))
    t = jnp.full((1,), 500.0)
    cache = init_cache(config, 1)
    mask = full_step_mask(config)

    out_seq, _ = model.apply(
        {"params": params}, latents, text, t, cache, mask
    )
    # skip block 1 → different output
    plan = build_plan(skip_blocks(2, [1]))
    out_skip, _ = model.apply(
        {"params": params}, latents, text, t, cache, mask, plan=plan
    )
    assert not np.allclose(np.asarray(out_seq), np.asarray(out_skip))
    # reverse of both blocks
    plan_rev = build_plan(reverse(2, 0, 1))
    out_rev, _ = model.apply(
        {"params": params}, latents, text, t, cache, mask, plan=plan_rev
    )
    assert not np.allclose(np.asarray(out_seq), np.asarray(out_rev))
    # default plan == sequential
    out_def, _ = model.apply(
        {"params": params}, latents, text, t, cache, mask,
        plan=build_plan(default_config(2)),
    )
    np.testing.assert_allclose(
        np.asarray(out_seq), np.asarray(out_def), rtol=1e-5, atol=1e-5
    )

"""Schedule data-model tests: JSON round-trip, genome flatten order, and
golden-file compatibility with the reference's committed schedule JSONs."""

import json

import numpy as np
import pytest

from ecad_tpu.schedules import (
    FluxCacheSchedule,
    PixArtCacheSchedule,
)


def test_pixart_default_shape():
    s = PixArtCacheSchedule.default()
    assert s.num_slots == 28 * 3
    assert s.mask.shape == (20, 84)
    assert s.mask.all()
    arr = s.to_numpy()
    assert arr.shape == (20, 28, 3)
    assert s.to_numpy(flatten=True).shape == (1680,)


def test_pixart_genome_round_trip():
    rng = np.random.default_rng(0)
    genome = rng.random(1680) < 0.5
    s = PixArtCacheSchedule.from_numpy(genome, 20, 28, name="rt")
    assert np.array_equal(s.to_numpy(flatten=True), genome)
    # flatten order: step-major, then block, then (attn1, attn2, ff)
    assert s.get_recompute(0, "0", "attn1") == genome[0]
    assert s.get_recompute(0, "0", "attn2") == genome[1]
    assert s.get_recompute(0, "0", "ff") == genome[2]
    assert s.get_recompute(0, "1", "attn1") == genome[3]
    assert s.get_recompute(1, "0", "attn1") == genome[84]


def test_pixart_json_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    s = PixArtCacheSchedule.from_numpy(rng.random(1680) < 0.3, 20, 28, name="x")
    s.metrics = {"total_macs_T": 1.5}
    s.top_level_config = {"pipeline": {"name": "pixart_alpha", "kwargs": {}}}
    p = tmp_path / "s.json"
    s.to_json(p)
    s2 = PixArtCacheSchedule.from_json(p)
    assert s2 == s
    assert s2.metrics == s.metrics
    assert s2.top_level_config == s.top_level_config
    assert s2.name == "x"
    # zero-padded step keys on disk (cache_schedule.py:75-112)
    raw = json.loads(p.read_text())
    assert "000" in raw["cache_schedule"]["schedule"]
    assert "019" in raw["cache_schedule"]["schedule"]


def test_flux_genome_layout():
    s = FluxCacheSchedule.default()
    assert s.num_slots == 19 * 3 + 38 * 3
    g = s.to_numpy()
    assert g.shape == (20 * 171,)
    rng = np.random.default_rng(2)
    genome = rng.random(3420) < 0.5
    s2 = FluxCacheSchedule.from_numpy(genome, 20, 19, name="rt")
    assert np.array_equal(s2.to_numpy(), genome)
    # full blocks come first within a step (flux_cache_schedule.py:62-90)
    assert s2.get_recompute(0, "0", "full_attn") == genome[0]
    assert s2.get_recompute(0, "18", "full_ff_context") == genome[19 * 3 - 1]
    assert s2.get_recompute(0, "single_0", "single_attn") == genome[19 * 3]
    assert s2.get_recompute(0, "single_37", "single_proj_out") == genome[170]
    assert s2.get_recompute(1, "0", "full_attn") == genome[171]


def test_flux_json_round_trip(tmp_path):
    rng = np.random.default_rng(3)
    s = FluxCacheSchedule.from_numpy(rng.random(3420) < 0.4, 20, 19, name="f")
    p = tmp_path / "f.json"
    s.to_json(p)
    s2 = FluxCacheSchedule.from_json(p)
    assert s2 == s
    assert s2.num_single_blocks == 38
    raw = json.loads(p.read_text())
    assert raw["cache_schedule"]["num_single_blocks"] == 38


def test_diff_attributes():
    base = PixArtCacheSchedule.default()
    m = base.mask.copy()
    m[3, 0] = False  # block 0 attn1 at step 3
    m[3, 1] = False
    m[7, 84 - 1] = False  # block 27 ff at step 7
    s = PixArtCacheSchedule(28, 20, mask=m)
    attrs = s.compute_diff_attributes(base)
    assert attrs["num_affected_steps"] == 2
    assert attrs["num_affected_blocks"] == 2
    assert attrs["total_num_affected_blocks"] == 3


def test_step_key_dedup():
    rng = np.random.default_rng(4)
    m = np.ones((20, 84), dtype=bool)
    m[5] = m[9] = rng.random(84) < 0.5
    s = PixArtCacheSchedule(28, 20, mask=m)
    assert s.step_key(5) == s.step_key(9)
    assert s.step_key(5) != s.step_key(0)


# ---- golden tests against the reference checkout --------------------------


def _ref_schedules(reference_root, glob, n=6):
    paths = sorted((reference_root / "schedules").rglob(glob))
    assert paths, f"no reference schedules matching {glob}"
    return paths[:n]


def test_golden_pixart_round_trip(reference_root, tmp_path):
    paths = [
        reference_root
        / "schedules/schedules_in_paper/pixart_alpha_256/ours_fast.json",
        reference_root
        / "schedules/schedules_in_paper/pixart_alpha_256/ours_fastest.json",
        reference_root / "schedules/alpha_cache_schedules/gen_default/default.json",
    ]
    for p in paths:
        raw = json.loads(p.read_text())
        s = PixArtCacheSchedule.from_json(p)
        assert s.num_blocks == 28 and s.num_inference_steps == 20
        # re-serialize and compare semantic content
        out = s.to_dict()
        assert out["metrics"] == raw.get("metrics", {})
        assert out["config"] == raw.get("config", {})
        got = out["cache_schedule"]
        want = raw["cache_schedule"]
        assert got["name"] == want["name"]
        assert got["attributes"] == want["attributes"]
        assert got["schedule"] == want["schedule"]


def test_golden_flux_round_trip(reference_root):
    p = (
        reference_root
        / "schedules/schedules_in_paper/flux_256/ours_fast.json"
    )
    raw = json.loads(p.read_text())
    s = FluxCacheSchedule.from_json(p)
    assert s.num_blocks == 19 and s.num_single_blocks == 38
    out = s.to_dict()
    assert out["cache_schedule"]["schedule"] == raw["cache_schedule"]["schedule"]
    assert out["cache_schedule"]["num_single_blocks"] == 38
    assert s.to_numpy().shape == (3420,)


def test_golden_tgate_custom_funcs(reference_root):
    # TGATE schedules carry custom_compute_attn hooks (types.py:50-64)
    paths = _ref_schedules(reference_root, "gen_tgate/*.json", n=1)
    s = PixArtCacheSchedule.from_json(paths[0])
    assert s.custom_funcs, "expected custom compute hooks in tgate schedule"
    (step, block), funcs = next(iter(s.custom_funcs.items()))
    cfg = s.get_custom_compute(step, block, "attn")
    assert "name" in cfg
    # round-trip preserves hooks
    out = s.to_dict()
    raw = json.loads(paths[0].read_text())
    assert out["cache_schedule"]["schedule"] == raw["cache_schedule"]["schedule"]

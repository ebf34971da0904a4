"""Analytic MACs model must reproduce the reference's calflops measurements
bit-for-bit for every schedule JSON that carries by_inference_step metrics."""

import json
import pathlib

import conftest

import pytest

from ecad_tpu.macs import (
    compute_schedule_metrics,
    flux_cost_table,
    pixart_cost_table,
    table_for_schedule,
)
from ecad_tpu.schedules import FluxCacheSchedule, PixArtCacheSchedule


def _iter_metric_files(reference_root, flux: bool):
    root = reference_root / "schedules"
    for p in sorted(root.rglob("*.json")):
        try:
            d = json.loads(p.read_text())
        except Exception:
            continue
        cs = d.get("cache_schedule")
        if not cs or (("num_single_blocks" in cs) != flux):
            continue
        if not d.get("metrics", {}).get("by_inference_step"):
            continue
        yield p, d


def _exact_check(schedule, data, path):
    got = compute_schedule_metrics(schedule)
    want = data["metrics"]
    # MACs — the NSGA-II objective — must be bit-exact everywhere.
    assert got["total_macs"] == want["total_macs"], (
        f"{path.name}: total_macs {got['total_macs']} != {want['total_macs']}"
    )
    if "total_macs_T" in want:
        assert got["total_macs_T"] == pytest.approx(
            want["total_macs_T"], abs=1e-9
        )
    # FLOPs: exact except on TGATE half-batch steps, where the reference's
    # own runs disagree with each other by +3/step (90 of 200 expanded-tgate
    # files differ from the rest in identical step states) — profiler
    # nondeterminism we don't model.
    is_tgate = (
        (schedule.top_level_config or {}).get("pipeline", {}) or {}
    ).get("name") == "tgate"
    flops_tol = 3 if is_tgate else 0
    for step, vals in want["by_inference_step"].items():
        g = got["by_inference_step"][step]
        assert g["macs"] == vals["macs"], (
            f"{path.name} step {step}: macs {g['macs']} != {vals['macs']}"
        )
        assert abs(g["flops"] - vals["flops"]) <= flops_tol, (
            f"{path.name} step {step}: flops {g['flops']} != {vals['flops']}"
        )


def test_pixart_macs_exact_everywhere(reference_root):
    n = 0
    skipped_1024_weight_confusion = 0
    for p, d in _iter_metric_files(reference_root, flux=False):
        s = PixArtCacheSchedule.from_dict(d)
        # Seed-population candidates inherited a 1024 transformer_weights
        # config from their generator but were measured at 256 — detect by
        # directory (they live under *_256x256 population dirs).
        if "256x256" in str(p) and "1024" in (
            s.top_level_config.get("transformer_weights", "")
        ):
            s.top_level_config = {
                k: v
                for k, v in s.top_level_config.items()
                if k not in ("transformer_weights", "height", "width")
            }
            skipped_1024_weight_confusion += 1
        _exact_check(s, d, p)
        n += 1
    # full reference checkout: ~1300 files; vendored in-repo subset: 166
    full_breadth = reference_root == conftest.REFERENCE_ROOT
    assert n > (1000 if full_breadth else 100), f"only {n} pixart files checked"
    assert skipped_1024_weight_confusion > 0


def test_flux_macs_exact_everywhere(reference_root):
    n = 0
    for p, d in _iter_metric_files(reference_root, flux=True):
        s = FluxCacheSchedule.from_dict(d)
        _exact_check(s, d, p)
        n += 1
    full_breadth = reference_root == conftest.REFERENCE_ROOT
    assert n > (30 if full_breadth else 15), f"only {n} flux files checked"


def test_headline_totals(reference_root):
    # BASELINE.md rows: ours_fast 2.134989471744 T, flux ours_fast 63.02 T
    s = PixArtCacheSchedule.from_json(
        reference_root
        / "schedules/schedules_in_paper/pixart_alpha_256/ours_fast.json"
    )
    m = compute_schedule_metrics(s)
    assert m["total_macs_T"] == pytest.approx(2.134989471744, abs=1e-12)

    f = FluxCacheSchedule.from_json(
        reference_root / "schedules/schedules_in_paper/flux_256/ours_fast.json"
    )
    mf = compute_schedule_metrics(f)
    assert mf["total_macs_T"] == pytest.approx(63.0233, abs=1e-3)


def test_default_uncached_totals():
    # PixArt-α 256 uncached: 28 blocks fully recomputed for 20 steps
    s = PixArtCacheSchedule.default()
    m = compute_schedule_metrics(s)
    assert m["total_macs"] == 20 * 285_689_806_848
    # PixArt 1024
    s1024 = PixArtCacheSchedule.default(name="default_1024x1024")
    s1024.top_level_config = {
        "transformer_weights": "PixArt-alpha/PixArt-XL-2-1024-MS"
    }
    m1024 = compute_schedule_metrics(s1024)
    assert m1024["total_macs_T"] == pytest.approx(85.6288, abs=1e-3)
    # FLUX 256 uncached ≈ 198.69 T
    fx = FluxCacheSchedule.default()
    mfx = compute_schedule_metrics(fx)
    assert mfx["total_macs_T"] == pytest.approx(198.69, abs=0.01)


def test_step0_forcing():
    import numpy as np

    s = PixArtCacheSchedule.default()
    m_all = compute_schedule_metrics(s)
    mask = np.array(s.mask)
    mask[0] = False  # fully cached step 0 — must still cost full recompute
    s0 = PixArtCacheSchedule(28, 20, mask=mask)
    m0 = compute_schedule_metrics(s0)
    assert (
        m0["by_inference_step"]["000"] == m_all["by_inference_step"]["000"]
    )


def test_tgate_half_batch(reference_root):
    p = sorted(
        (reference_root / "schedules/alpha_cache_schedules/gen_tgate").glob(
            "*.json"
        )
    )[0]
    d = json.loads(p.read_text())
    s = PixArtCacheSchedule.from_dict(d)
    _exact_check(s, d, p)


def test_dit_schedule_macs():
    from ecad_tpu.graph import DiTSchedule, skip_blocks
    from ecad_tpu.macs import compute_dit_schedule_metrics

    # default topology == default cache schedule totals
    d = DiTSchedule.default(28, 20)
    m = compute_dit_schedule_metrics(d)
    m2 = compute_schedule_metrics(PixArtCacheSchedule.default())
    assert m["total_macs"] == m2["total_macs"]
    assert m["total_flops"] == m2["total_flops"]
    # skipping 2 blocks every step drops exactly 2/28 of the block cost
    s = DiTSchedule(
        28, 20, "skip", {i: skip_blocks(28, [0, 1]) for i in range(20)}
    )
    ms = compute_dit_schedule_metrics(s)
    per_block = (m["total_macs"] - 20 * 2 * 749_223_936) / 28
    assert ms["total_macs"] == m["total_macs"] - 2 * per_block


def test_compute_macs_cli_handles_dit(tmp_path):
    import json as _json

    from ecad_tpu.benchmark import compute_macs as cm
    from ecad_tpu.graph import DiTSchedule

    p = tmp_path / "dit.json"
    DiTSchedule.default(28, 20, name="d").to_json(p)
    cm.main(["--schedule", str(p)])
    data = _json.loads(p.read_text())
    assert data["metrics"]["total_macs_T"] == pytest.approx(
        5.713796136960, abs=1e-9
    )


def test_hardware_flops_exceed_metrics_flops():
    """hardware_flops_per_image = calflops-parity total_flops + the SDPA
    matmul FLOPs the reference profiler never counts (module hooks don't
    see torch SDPA, /root/reference/ecad/benchmark/compute_macs.py:279-286).
    The SDPA share follows the schedule mask (cached attn skips its SDPA)
    and the TGATE gate halves the batch."""
    from ecad_tpu.macs import (
        compute_schedule_metrics,
        hardware_flops_per_image,
    )
    from ecad_tpu.schedules import PixArtCacheSchedule

    default = PixArtCacheSchedule.default()
    base = compute_schedule_metrics(default)["total_flops"]
    hw = hardware_flops_per_image(default)
    # analytic SDPA for the uncached 256² schedule: per step, batch 2,
    # 28 blocks × (attn1 2·T²·d + attn2 2·T·L·d), T=256, L=120, d=1152
    sdpa = 20 * 2 * 28 * (2 * 256 * 256 * 1152 + 2 * 256 * 120 * 1152)
    assert hw == base + 2 * sdpa

    # caching attn components removes their SDPA from the hardware count
    import numpy as np

    mask = np.ones((20, 28, 3), dtype=bool)
    mask[5:, :, :2] = False  # cache attn1+attn2 after step 5
    cached = PixArtCacheSchedule.from_numpy(
        mask.reshape(-1), 20, 28, name="attn_cached"
    )
    hw_cached = hardware_flops_per_image(cached)
    assert hw_cached < hw
    expected_sdpa = 5 * 2 * 28 * (
        2 * 256 * 256 * 1152 + 2 * 256 * 120 * 1152
    )
    base_cached = compute_schedule_metrics(cached)["total_flops"]
    assert hw_cached == base_cached + 2 * expected_sdpa


def test_vae_decoder_flops_structure():
    """vae_decoder_flops replays models/vae.py:VAEDecoder; pin the 256²
    value and the ~16x spatial scaling to 1024² (convs scale with output
    area; the 32×32 mid attention is resolution-invariant only for the
    latent grid it runs on)."""
    from ecad_tpu.macs import vae_decoder_flops

    f256 = vae_decoder_flops(256, 256)
    f1024 = vae_decoder_flops(1024, 1024)
    assert 0.5e12 < f256 < 0.8e12  # SD-VAE decoder scale at 256²
    # all convs scale ×16 with area; the mid attention (quadratic in the
    # latent grid) grows faster — ratio lands a bit above 16
    assert 16.0 < f1024 / f256 < 18.0

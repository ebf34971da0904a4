"""Generator golden tests: generated schedules must match the reference's
committed heuristic schedule JSONs bit-for-bit in mask content."""

import json

import numpy as np
import pytest

from ecad_tpu.schedules import FluxCacheSchedule, PixArtCacheSchedule
from ecad_tpu.schedules.generators import pixart_cache, flux_cache, save_schedules


def _by_name(gen, *args):
    return {s.name: s for s in gen(*args)}


def test_gen_function_registries():
    assert "gen_default" in pixart_cache.GEN_FUNCTIONS
    assert "gen_tgate" in pixart_cache.GEN_FUNCTIONS
    assert "gen_recompute_all_every_n" in flux_cache.GEN_FUNCTIONS
    # helpers must not leak into the registry
    assert all(n.startswith("gen_") for n in pixart_cache.GEN_FUNCTIONS)


@pytest.mark.parametrize(
    "gen_dir,gen_fn",
    [
        ("gen_default", pixart_cache.gen_default),
        ("gen_recompute_all_every_n", pixart_cache.gen_recompute_all_every_n),
        ("gen_recompute_ca_sa_every_n", pixart_cache.gen_recompute_ca_sa_every_n),
        (
            "gen_evenly_cache_sa_evenly_spaced",
            pixart_cache.gen_evenly_cache_sa_evenly_spaced,
        ),
        (
            "gen_middle_cache_ff_evenly_spaced",
            pixart_cache.gen_middle_cache_ff_evenly_spaced,
        ),
        ("gen_tgate", pixart_cache.gen_tgate),
        ("gen_tgate_without_ca_avg", pixart_cache.gen_tgate_without_ca_avg),
    ],
)
def test_golden_pixart_generators(reference_root, gen_dir, gen_fn):
    ref_dir = reference_root / "schedules/alpha_cache_schedules" / gen_dir
    ours = _by_name(gen_fn, 28, 20)
    ref_files = sorted(ref_dir.glob("*.json"))
    if not ref_files:
        pytest.skip(f"{gen_dir} not in the vendored artifact subset")
    checked = 0
    for p in ref_files:
        ref = PixArtCacheSchedule.from_json(p)
        if ref.name not in ours:
            continue
        mine = ours[ref.name]
        assert np.array_equal(mine.mask, ref.mask), f"mask mismatch: {p.name}"
        assert mine.attributes == ref.attributes, f"attrs mismatch: {p.name}"
        # custom compute hooks and pipeline config for tgate
        assert mine.custom_funcs == ref.custom_funcs, f"hooks mismatch: {p.name}"
        if ref.top_level_config:
            assert mine.top_level_config == ref.top_level_config
        checked += 1
    assert checked >= min(3, len(ref_files)), f"too few matched in {gen_dir}"


@pytest.mark.parametrize(
    "gen_dir,gen_fn",
    [
        ("gen_recompute_all_every_n", flux_cache.gen_recompute_all_every_n),
        ("gen_recompute_attn_every_n", flux_cache.gen_recompute_attn_every_n),
        (
            "gen_default_varied_guidance_256",
            flux_cache.gen_default_varied_guidance_256,
        ),
    ],
)
def test_golden_flux_generators(reference_root, gen_dir, gen_fn):
    ref_dir = reference_root / "schedules/flux_cache_schedules" / gen_dir
    if not ref_dir.exists():
        pytest.skip(f"{gen_dir} not committed in reference")
    ours = _by_name(gen_fn, 19, 38, 20)
    checked = 0
    for p in sorted(ref_dir.glob("*.json")):
        ref = FluxCacheSchedule.from_json(p)
        if ref.name not in ours:
            continue
        mine = ours[ref.name]
        assert np.array_equal(mine.mask, ref.mask), f"mask mismatch: {p.name}"
        if ref.top_level_config:
            assert mine.top_level_config == ref.top_level_config
        checked += 1
    assert checked >= 1


def test_save_schedules_collision(tmp_path):
    written = save_schedules(
        pixart_cache.gen_default(28, 20), tmp_path, verbose=False
    )
    assert len(written) == 1
    # skip_existing
    again = save_schedules(
        pixart_cache.gen_default(28, 20), tmp_path, verbose=False
    )
    assert not again
    # collision renaming
    renamed = save_schedules(
        pixart_cache.gen_default(28, 20),
        tmp_path,
        skip_existing=False,
        verbose=False,
    )
    assert renamed[0].name == "default_1.json"


def test_sigma_shares_pixart_generators(reference_root):
    # PixArt-Σ uses the same generator family (sigma_cache_schedules dir)
    ref = PixArtCacheSchedule.from_json(
        reference_root / "schedules/sigma_cache_schedules/gen_default/default.json"
    )
    mine = next(pixart_cache.gen_default(28, 20))
    assert np.array_equal(mine.mask, ref.mask)

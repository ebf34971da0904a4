"""Sweep-regeneration proof (fast subset; VERDICT r2 item 6).

scripts/verify_schedule_regen.py reproduces the full reference tree —
1477/1477 exact bit+config matches across alpha/sigma/flux heuristic
families (recorded in schedules/README.md). CI runs the flux subtree
(146 reference files, seconds) so regressions in the generators or the
JSON round-trip surface immediately; the full sweep is a script run.
"""

import importlib.util
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REF = pathlib.Path("/root/reference/schedules")
SCRIPT = REPO / "scripts" / "verify_schedule_regen.py"


def _load():
    spec = importlib.util.spec_from_file_location("verify_schedule_regen",
                                                  SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not REF.is_dir(), reason="reference tree not present")
def test_flux_family_regenerates_bit_exact(tmp_path):
    mod = _load()
    from ecad_tpu.schedules import FluxCacheSchedule
    from ecad_tpu.schedules.generate_cli import main as gen_main

    gen_dir = tmp_path / "flux_cache_schedules"
    gen_main(["flux_cache", "--output-dir", str(gen_dir)])
    results = mod.compare_family(
        gen_dir, REF / "flux_cache_schedules", "flux_cache_schedules",
        FluxCacheSchedule,
    )
    assert results, "no reference generator dirs found"
    for gen_name, row in results.items():
        assert not row["bit_mismatches"], (gen_name, row)
        assert not row["config_mismatches"], (gen_name, row)
        assert not row["missing"], (gen_name, row)
    total = sum(r["ref_files"] for r in results.values())
    exact = sum(r["exact_matches"] for r in results.values())
    assert exact == total and total >= 140

"""Prove the sweep-regeneration claim (VERDICT r2 item 6).

Only 226 of the reference's ~1,669 schedule JSONs are vendored under
/root/repo/schedules; the rest were claimed regenerable by
`ecad_tpu.schedules.generate_cli`. This script regenerates every heuristic
cache-schedule family and diffs it file-by-file against the reference tree
(/root/reference/schedules/**): schedule bits (via the golden-tested
parser's to_numpy) and the config override dict — metrics excluded, since
those are measured GPU artifacts, not generator output.

Reference generator registries being reproduced:
ecad/schedulers/cache_scheduler/generators/pixart_schedule_generators.py:548-557
and flux_schedule_generators.py (GEN_FUNCTIONS built by inspect).

Output: one JSON line per family with {ref_files, exact_matches,
bit_mismatches, missing, extra} plus a summary; exit 1 if any family has a
mismatch that is not a documented known deviation.

Known deviations (dirs with no generating function in the reference
either — they carry hand-set config overrides):
* alpha gen_default_1024x1024 / gen_recompute_all_every_n_1024x1024 and
  flux gen_recompute_all_every_n_1024x1024: bits must equal the matching
  256 generator's output; only the config dict differs (checked here).
* population_initialization/**: NSGA-II run outputs (vendored verbatim),
  not generator products.
* schedules_in_paper/**: search results (vendored verbatim).
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
REF = pathlib.Path("/root/reference/schedules")

from ecad_tpu.schedules import (  # noqa: E402
    FluxCacheSchedule,
    PixArtCacheSchedule,
)
from ecad_tpu.schedules.generate_cli import main as gen_main  # noqa: E402

FAMILIES = [
    # (cli family, reference subtree, schedule class)
    ("pixart_cache", "alpha_cache_schedules", PixArtCacheSchedule),
    ("pixart_cache", "sigma_cache_schedules", PixArtCacheSchedule),
    ("flux_cache", "flux_cache_schedules", FluxCacheSchedule),
]

# reference dirs with no generating function (see module docstring)
KNOWN_DEVIATIONS = {
    ("alpha_cache_schedules", "gen_default_1024x1024"): "gen_default",
    (
        "alpha_cache_schedules",
        "gen_recompute_all_every_n_1024x1024",
    ): "gen_recompute_all_every_n",
    (
        "flux_cache_schedules",
        "gen_recompute_all_every_n_1024x1024",
    ): "gen_recompute_all_every_n",
}


def _tgate_full_grid(with_ca_avg):
    """The committed m_k_expanded artifacts carry BOTH m parities (m=1..20)
    while the committed reference generator emits one parity per variant
    (pixart_schedule_generators.py:423 even; :534 odd) — the dirs are the
    union of historical runs. Regenerate with the union grid to prove every
    committed file is still bit-reproducible by the same helper."""
    from ecad_tpu.schedules.generators.pixart_cache import _tgate_family

    out = {}
    for s in _tgate_family(28, 20, range(1, 21), range(1, 20, 2), [1], [2],
                           with_ca_avg):
        out[f"{s.name}.json"] = s
    return out


def _flux_default_steps():
    """flux gen_default committed artifacts are parameterized invocations
    (1024², gs 5.0, steps 8/20/50) with a hand-appended _steps_NN name
    suffix neither code base's f-string produces (reference
    flux_schedule_generators.py:223)."""
    from ecad_tpu.schedules.generators.flux_cache import gen_default

    out = {}
    for steps in (8, 20, 50):
        for s in gen_default(19, 38, steps, 1024, 1024, 5.0):
            out[f"{s.name}_steps_{steps:02}.json"] = s
    return out


# dirs reproducible only by re-parameterizing the generator (in-memory
# regeneration; value = (builder, compare_config, reason))
SPECIAL = {
    ("alpha_cache_schedules", "gen_tgate_m_k_expanded"): (
        lambda: _tgate_full_grid(True), True,
        "artifacts = union of both m-parity grids",
    ),
    ("alpha_cache_schedules", "gen_tgate_without_ca_avg_m_k_expanded"): (
        lambda: _tgate_full_grid(False), True,
        "artifacts = union of both m-parity grids",
    ),
    ("flux_cache_schedules", "gen_default"): (
        _flux_default_steps, True,
        "artifacts = hand-parameterized 1024/gs5/steps runs",
    ),
}

# sigma artifacts: same generators run with a hand-set
# {"pipeline": {"name": "pixart_sigma"}} stamp (no reference generator
# emits it either — grep 'sigma' over .../generators/*.py is empty);
# compare bits only.
CONFIG_EXEMPT_TREES = {"sigma_cache_schedules"}


def bits_and_config(path, cls):
    s = cls.from_json(path)
    return s.to_numpy(), s.top_level_config or {}


def compare_family(gen_root, ref_root, ref_name, cls):
    """Compare generated dir tree vs one reference subtree."""
    results = {}
    for ref_dir in sorted(p for p in ref_root.iterdir() if p.is_dir()):
        gen_name = ref_dir.name
        deviation_src = KNOWN_DEVIATIONS.get((ref_name, gen_name))
        special = SPECIAL.get((ref_name, gen_name))
        skip_config = ref_name in CONFIG_EXEMPT_TREES
        use_dir = gen_root / (deviation_src or gen_name)
        row = {
            "ref_files": 0,
            "exact_matches": 0,
            "bit_mismatches": [],
            "config_mismatches": [],
            "missing": [],
            "known_deviation": bool(deviation_src or special or skip_config)
            and (special[2] if special else True),
        }
        in_memory = special[0]() if special else None
        for ref_json in sorted(ref_dir.glob("*.json")):
            row["ref_files"] += 1
            rb, rc = bits_and_config(ref_json, cls)
            if in_memory is not None:
                s = in_memory.get(ref_json.name)
                if s is None:
                    row["missing"].append(ref_json.name)
                    continue
                gb, gc = s.to_numpy(), s.top_level_config or {}
            else:
                cand = use_dir / ref_json.name
                if deviation_src and not cand.exists():
                    # 1024 dirs: same bits as the 256 generator output under
                    # a renamed file (default_1024x1024.json ← default.json,
                    # recompute_all_every_003_1024x1024_steps_20.json ←
                    # recompute_all_every_003.json)
                    alt = ref_json.name.replace("_1024x1024", "").replace(
                        "_steps_20", ""
                    )
                    cand = use_dir / alt
                if not cand.exists():
                    row["missing"].append(ref_json.name)
                    continue
                gb, gc = bits_and_config(cand, cls)
            if rb.shape != gb.shape or (rb != gb).any():
                row["bit_mismatches"].append(ref_json.name)
                continue
            compare_config = (
                (special[1] if special else not deviation_src)
                and not skip_config
            )
            if compare_config and rc != gc:
                row["config_mismatches"].append(
                    {"file": ref_json.name, "ref": rc, "gen": gc}
                )
                continue
            row["exact_matches"] += 1
        if not deviation_src and not special:
            gen_files = (
                {p.name for p in use_dir.glob("*.json")} if use_dir.exists()
                else set()
            )
            ref_files = {p.name for p in ref_dir.glob("*.json")}
            row["extra"] = sorted(gen_files - ref_files)
        results[gen_name] = row
    return results


def main() -> int:
    out_root = pathlib.Path(tempfile.mkdtemp(prefix="regen_"))
    failed = False
    summary = {"total_ref": 0, "total_exact": 0}
    for family, ref_name, cls in FAMILIES:
        gen_dir = out_root / ref_name
        gen_main([family, "--output-dir", str(gen_dir)])
        results = compare_family(gen_dir, REF / ref_name, ref_name, cls)
        for gen_name, row in results.items():
            summary["total_ref"] += row["ref_files"]
            summary["total_exact"] += row["exact_matches"]
            ok = (
                not row["bit_mismatches"]
                and not row["config_mismatches"]
                and not row["missing"]
            )
            if not ok:
                failed = True
            print(
                json.dumps(
                    {
                        "family": ref_name,
                        "generator": gen_name,
                        **{
                            k: (v if not isinstance(v, list) else
                                (v[:5] if v else []))
                            for k, v in row.items()
                        },
                        "ok": ok,
                    }
                ),
                flush=True,
            )
    print(
        json.dumps(
            {
                "metric": "schedule_regen_exact_matches",
                "value": summary["total_exact"],
                "unit": f"of_{summary['total_ref']}_reference_files",
                "detail": {"generated_under": str(out_root)},
            }
        ),
        flush=True,
    )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

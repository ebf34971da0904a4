"""The committed bench ladder regenerates byte-exact from committed evidence.

VERDICT r3 #9 asked for one-invocation regeneration of the ladder
artifact; `scripts/assemble_ladder.py` maps each BENCH_LADDER_r05.json
section to exactly one evidence log under `.r5_evidence/` (plus the
standalone artifacts FLUX1024_FULLDEPTH.json / the search runs'
search_quality.json and rows carried from BENCH_LADDER_r04.json, tagged
`carried_from`). This test pins that invariant in the test suite: if an
evidence log changes, the assembler must be re-run so the committed
ladder never drifts from its sources.

Mirrors the audit-trail role of the reference's benchmark JSON outputs
(ecad/benchmark/compute_latency.py writes per-schedule metric files that
downstream tooling consumes verbatim).
"""

from __future__ import annotations

import importlib.util
import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parents[1]


def _load_assembler():
    spec = importlib.util.spec_from_file_location(
        "assemble_ladder", ROOT / "scripts" / "assemble_ladder.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_ladder_regenerates_byte_exact(tmp_path):
    mod = _load_assembler()
    dest = tmp_path / "ladder.json"
    mod.main(dest)
    # byte equality, not just parsed-JSON equality (ADVICE r4): the
    # committed artifact is the bytes reviewers diff
    assert dest.read_bytes() == (ROOT / "BENCH_LADDER_r05.json").read_bytes()


def test_every_carried_row_is_tagged():
    committed = json.loads((ROOT / "BENCH_LADDER_r05.json").read_text())
    r04 = json.loads((ROOT / "BENCH_LADDER_r04.json").read_text())
    for key, row in committed.items():
        if not isinstance(row, dict):
            continue
        tag = row.get("carried_from")
        if tag and tag.startswith("r04"):
            # "r04" = same key; "r04:<key>" records a section rename
            src = tag.split(":", 1)[1] if ":" in tag else key
            assert src in r04, f"carried row {key} missing from r04 ladder"


def test_headline_comment_claims_match_sections():
    """The r4 failure mode, pinned structurally: every section name the
    headline comment references must exist in the file, and the
    section-gated clauses must only appear when their section does."""
    committed = json.loads((ROOT / "BENCH_LADDER_r05.json").read_text())
    comment = committed["comment"]
    for claim, present in [
        ("batch_max section",
         "batch_max" in committed.get("flux_full_width_12B_single_chip",
                                      {})),
        ("search_quality.flux_256 section",
         "flux_256" in committed.get("search_quality", {})
         and "carried_from" not in committed.get("search_quality", {})),
        ("profile_breakdown section", "profile_breakdown" in committed),
    ]:
        if claim in comment:
            assert present, f"comment claims '{claim}' but it is absent"


def test_headline_mfu_claim_is_true_of_the_file():
    """If the comment claims fresh rows self-report MFU, scan every
    non-carried latency row for tflops_per_sec."""
    committed = json.loads((ROOT / "BENCH_LADDER_r05.json").read_text())
    if "self-reports MFU" not in committed["comment"]:
        return

    def latency_rows(node, carried=False):
        if not isinstance(node, dict):
            return
        carried = carried or "carried_from" in node
        if "ms_per_image" in node or "ms_per_step" in node:
            yield node, carried
        for v in node.values():
            yield from latency_rows(v, carried)

    fresh = [r for sec in committed.values()
             for r, carried in latency_rows(sec) if not carried]
    assert fresh, "MFU claim with no fresh latency rows"
    missing = [r for r in fresh if r.get("tflops_per_sec") is None]
    assert not missing, f"{len(missing)} fresh rows lack MFU fields"


def test_dominance_useful_region_stats():
    """Unit check of the useful-region cut (scripts/bench_search_quality):
    near-identity points above the MACs cut are excluded; dominance is
    strict on at least one axis."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bsq", ROOT / "scripts" / "bench_search_quality.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    evolved = [{"fidelity_db": 30.0, "macs_T": 50.0}]
    others = [
        # dominated: worse fidelity at higher MACs
        {"name": "a", "family": "f", "fidelity_db": 25.0, "macs_T": 60.0},
        # undominated but near-identity: above the 95% cut -> excluded
        {"name": "b", "family": "f", "fidelity_db": 45.0, "macs_T": 99.0},
        # undominated, inside the useful region -> counted
        {"name": "c", "family": "f", "fidelity_db": 35.0, "macs_T": 80.0},
    ]
    u = mod.dominance_in_useful_region(evolved, others, uncached_T=100.0)
    assert u["n_excluded_near_identity"] == 1
    assert u["per_family"]["f"]["n"] == 2
    assert u["per_family"]["f"]["dominated"] == 1
    assert u["overall_dominated_pct"] == 50.0
    # equal point does NOT strictly dominate itself
    eq = mod.dominance_stats(
        evolved,
        [{"name": "e", "family": "f", "fidelity_db": 30.0, "macs_T": 50.0}],
    )
    assert eq["f"]["dominated"] == 0


def test_no_untagged_carried_rows():
    """The inverse direction (ADVICE r4): a section byte-identical to its
    r04 counterpart must CARRY the tag — a copied row without
    `carried_from` would silently masquerade as a fresh measurement."""
    committed = json.loads((ROOT / "BENCH_LADDER_r05.json").read_text())
    r04 = json.loads((ROOT / "BENCH_LADDER_r04.json").read_text())
    # sections the assembler re-reads from a committed standalone
    # artifact on every run (not carried; identical when the artifact
    # didn't change between rounds)
    from_standalone_artifact = {"flux_full_width_1024_executed"}
    for key, row in committed.items():
        if (not isinstance(row, dict) or "carried_from" in row
                or key in from_standalone_artifact):
            continue
        stripped = {k: v for k, v in row.items() if k != "carried_from"}
        src = {k: v for k, v in r04.get(key, {}).items()
               if k != "carried_from"} if isinstance(r04.get(key), dict) \
            else None
        assert stripped != src, (
            f"section {key} is identical to its r04 counterpart but has "
            "no carried_from tag"
        )

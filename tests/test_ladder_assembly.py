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

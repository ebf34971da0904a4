"""The committed bench ladder regenerates bit-exact from committed evidence.

VERDICT r3 #9 asked for one-invocation regeneration of the ladder
artifact; `scripts/assemble_ladder.py` maps each BENCH_LADDER_r04.json
section to exactly one evidence log under `.r4_evidence/` (plus the
standalone artifacts FLUX1024_FULLDEPTH.json / search_quality.json and
rows carried from BENCH_LADDER_r03.json, tagged `carried_from`). This
test pins that invariant in CI: if an evidence log changes, the assembler
must be re-run so the committed ladder never drifts from its sources.

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


def test_ladder_regenerates_bit_exact(tmp_path):
    mod = _load_assembler()
    dest = tmp_path / "ladder.json"
    mod.main(dest)
    regenerated = json.loads(dest.read_text())
    committed = json.loads((ROOT / "BENCH_LADDER_r04.json").read_text())
    assert regenerated == committed


def test_every_carried_row_is_tagged():
    committed = json.loads((ROOT / "BENCH_LADDER_r04.json").read_text())
    r03 = json.loads((ROOT / "BENCH_LADDER_r03.json").read_text())
    for key, row in committed.items():
        if not isinstance(row, dict):
            continue
        tag = row.get("carried_from")
        if tag and tag.startswith("r03"):
            # "r03" = same key; "r03:<key>" records a section rename
            src = tag.split(":", 1)[1] if ":" in tag else key
            assert src in r03, f"carried row {key} missing from r03 ladder"

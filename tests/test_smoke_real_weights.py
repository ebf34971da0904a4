"""scripts/smoke_real_weights.py — executable real-checkpoint smoke.

Two modes (VERDICT r2 item 5):
* tiny path (always runs): --random-weights drives the script's full
  convert→generate→score plumbing with tiny generators + mock scorer.
* real path (skipif no weights): the environment variables
  ECAD_WEIGHTS_ROOT / ECAD_IMAGE_REWARD_DIR point at a local HF-layout
  tree; the test then runs every converter and asserts in-family scores —
  the first hour with real checkpoints needs zero improvisation.
"""

import importlib.util
import json
import os
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
SCRIPT = REPO / "scripts" / "smoke_real_weights.py"


def _load():
    spec = importlib.util.spec_from_file_location("smoke_real_weights", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_smoke_tiny_path(tmp_path, capsys):
    mod = _load()
    rc = mod.main(["--random-weights", "--output-dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0, out
    summary = json.loads(
        [l for l in out.splitlines() if l.startswith("{")][-1]
    )
    assert summary["value"] == 1
    stages = {(r["stage"], r["status"]) for r in summary["detail"]["rows"]}
    assert ("generate", "PASS") in stages
    assert ("score", "PASS") in stages
    # both families produced a PNG
    pngs = list(tmp_path.rglob("*.png"))
    assert len(pngs) >= 2, pngs


@pytest.mark.skipif(
    not os.environ.get("ECAD_WEIGHTS_ROOT"),
    reason="no real checkpoints (set ECAD_WEIGHTS_ROOT / "
    "ECAD_IMAGE_REWARD_DIR to run)",
)
def test_smoke_real_weights(tmp_path):
    mod = _load()
    argv = [
        "--weights-root", os.environ["ECAD_WEIGHTS_ROOT"],
        "--output-dir", str(tmp_path),
    ]
    if os.environ.get("ECAD_IMAGE_REWARD_DIR"):
        argv += ["--image-reward-dir", os.environ["ECAD_IMAGE_REWARD_DIR"]]
    assert mod.main(argv) == 0

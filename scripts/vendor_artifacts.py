"""Vendor the interchange data artifacts from the upstream checkout.

The schedule JSONs and prompt datasets are *data*, not code: they are the
published ECAD paper results (metrics = the baseline numbers in
BASELINE.md), the heuristic baseline schedules, the NSGA-II seed
populations, and the public prompt benchmarks (ImageReward-100,
DrawBench200, PartiPrompts, COCO captions). The JSON format is the
interchange contract between this framework and the reference
(golden-tested in tests/test_schedules.py), so the files are copied
verbatim — every schedule is additionally verified to round-trip through
our own parser before being accepted.

Usage:  python scripts/vendor_artifacts.py [--reference /root/reference]

Re-run whenever the vendored set should be refreshed; the repo copies under
schedules/ and prompts/ are committed so the framework is self-contained
(bench + tests run with the reference unmounted).
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Schedule directories to vendor (relative to <reference>/schedules).
SCHEDULE_DIRS = [
    "schedules_in_paper",
    "alpha_cache_schedules/gen_default",
    "alpha_cache_schedules/gen_default_1024x1024",
    "alpha_cache_schedules/gen_tgate",
    "alpha_cache_schedules/gen_tgate_1024",
    "sigma_cache_schedules/gen_default",
    "flux_cache_schedules/gen_default",
    "flux_cache_schedules/gen_default_varied_guidance_256",
    "population_initialization",
]


def vendor_schedules(reference: Path) -> tuple[int, int]:
    from ecad_tpu.benchmark.compute_macs import load_any_schedule

    n_files = n_verified = 0
    for rel in SCHEDULE_DIRS:
        src_dir = reference / "schedules" / rel
        if not src_dir.exists():
            print(f"SKIP (missing upstream): {src_dir}")
            continue
        dst_dir = REPO / "schedules" / rel
        for src in sorted(src_dir.rglob("*")):
            if src.is_dir():
                continue
            dst = dst_dir / src.relative_to(src_dir)
            dst.parent.mkdir(parents=True, exist_ok=True)
            if src.suffix == ".json":
                # verify interchange compatibility before accepting
                sched = load_any_schedule(src)
                rt = type(sched).from_dict(sched.to_dict())
                assert rt == sched, f"round-trip mismatch: {src}"
                n_verified += 1
            shutil.copyfile(src, dst)
            n_files += 1
    return n_files, n_verified


def vendor_prompts(reference: Path) -> int:
    src_dir = reference / "prompts"
    n = 0
    for src in sorted(src_dir.glob("*")):
        if src.is_dir():
            continue
        shutil.copyfile(src, REPO / "prompts" / src.name)
        n += 1
    return n


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", type=Path, default=Path("/root/reference"))
    args = ap.parse_args()
    if not args.reference.exists():
        sys.exit(f"reference checkout not found at {args.reference}")

    n_files, n_verified = vendor_schedules(args.reference)
    n_prompts = vendor_prompts(args.reference)
    print(
        f"vendored {n_files} schedule files ({n_verified} JSON round-trip "
        f"verified) + {n_prompts} prompt files"
    )


if __name__ == "__main__":
    main()

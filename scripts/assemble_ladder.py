"""Assemble BENCH_LADDER_r04.json from the round-4 evidence logs.

Single-invocation regeneration of the ladder artifact (VERDICT r3 #9):
each section of the ladder maps to exactly one bench script whose JSON
output lands in `.r4_evidence/`; this script collects those outputs and
the standalone artifacts (FLUX1024_FULLDEPTH.json, search_quality.json,
dp8.jsonl) into the committed ladder file. Re-running the ladder is:

    python scripts/bench_ladder.py             > .r4_evidence/pixart256.log
    python scripts/bench_pixart_1024.py        > .r4_evidence/pixart1024.log
    python scripts/bench_quant_1024.py         > .r4_evidence/quant1024.log
    python scripts/bench_flux.py               > .r4_evidence/flux256.log
    python scripts/bench_flux_1024.py          > .r4_evidence/flux1024.log
    python scripts/flux_12b_single_chip.py     > .r4_evidence/flux12b.log
    python scripts/flux_12b_batch_sweep.py     > .r4_evidence/flux_batch_sweep.log
    python scripts/bench_attention_kernels.py  > .r4_evidence/kernels.log
    python scripts/bench_search_quality.py     (writes search_quality.json)
    python scripts/bench_search_dp8.py         > .r4_evidence/dp8.jsonl
    python scripts/flux_full_width.py 1024-exec (writes FLUX1024_FULLDEPTH.json)
    python scripts/assemble_ladder.py

Rows whose code path did not change since round 3 may be carried
forward; every carried row is tagged `"carried_from": "r03"` so the
audit trail distinguishes fresh measurements from history.
"""

from __future__ import annotations

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
EV = ROOT / ".r4_evidence"


def jsonl(path: pathlib.Path) -> list[dict]:
    """All parseable JSON objects, one per line, ignoring log noise."""
    rows = []
    if not path.exists():
        return rows
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rows.append(json.loads(line))
        except json.JSONDecodeError:
            continue
    return rows


def by_metric(rows: list[dict]) -> dict[str, dict]:
    return {r["metric"]: r for r in rows if "metric" in r}


def main(dest: pathlib.Path | None = None) -> None:
    r03 = json.loads((ROOT / "BENCH_LADDER_r03.json").read_text())
    out: dict = {
        "comment": (
            "Round-4 measurements on TPU v5e (1 chip) vs the reference's "
            "committed RTX A6000 metrics (BASELINE.md). Protocol "
            "unchanged: full pipeline - denoise + VAE decode to uint8 "
            "pixels on device. New in round 4: the search optimizes a "
            "REAL objective on-chip (trajectory fidelity; evolved front "
            "dominates the heuristic families - search_quality section); "
            "the sublane-contracted transposed attention kernel takes "
            "D=72 T=4096 to 5.36 ms; static calibrated int8 activation "
            "scales make int8 win at 1024^2 (1.145x); the full-width 12B "
            "FLUX 1024^2 program EXECUTED 2 denoise steps full-depth on "
            "a tp=4 host mesh; 12B single-chip batch swept to the HBM "
            "limit (batch_max section); every row self-reports MFU "
            "(tflops_per_sec / pct_peak, attention FLOPs included). "
            "vs_baseline = our cached/uncached speedup over the "
            "reference's on the same schedule; absolute rows = reference "
            "ms / our ms."
        )
    }

    # ---- pixart_alpha_256 + pixart_sigma_256 (bench_ladder.py) ----
    p256 = by_metric(jsonl(EV / "pixart256.log"))
    if p256:
        unc = p256["pixart_alpha_256_uncached_mfu"]
        entries = {}
        for short, key in [
            ("ours_fast", "pixart_alpha_256_ours_fast_wallclock_speedup"),
            ("ours_faster", "pixart_alpha_256_ours_faster_wallclock_speedup"),
            ("ours_fastest",
             "pixart_alpha_256_ours_fastest_wallclock_speedup"),
            ("tgate_m10_sp5",
             "pixart_alpha_256_tgate_m10_sp5_wallclock_speedup"),
        ]:
            r = p256[key]
            entries[short] = {
                "speedup": r["value"],
                "ref_speedup": round(r["value"] / r["vs_baseline"], 4),
                "ms_per_image": r["detail"]["ms_per_image"],
                "tflops_per_sec": r["detail"].get("tflops_per_sec"),
                "pct_peak": r["detail"].get("pct_peak"),
            }
        pt = p256["pixart_alpha_256_pass_through_overhead"]
        out["pixart_alpha_256"] = {
            "batch": unc["detail"]["batch"],
            "uncached_ms_per_image": unc["detail"]["ms_per_image"],
            "uncached_tflops_per_sec": unc["detail"].get("tflops_per_sec"),
            "uncached_pct_peak": unc["detail"].get("pct_peak"),
            "entries": {
                **entries,
                "pass_through_floor_ms_per_image":
                    pt["detail"]["ms_per_image"],
            },
        }
        sig = {}
        for short, key in [
            ("sigma_ours_fast",
             "pixart_sigma_256_sigma_ours_fast_wallclock_speedup"),
            ("sigma_from_alpha_transfer_gen_250",
             "pixart_sigma_256_sigma_from_alpha_transfer_wallclock_speedup"),
        ]:
            r = p256[key]
            sig[short] = {
                "speedup": r["value"],
                "ref_speedup": round(r["value"] / r["vs_baseline"], 4),
                "ms_per_image": r["detail"]["ms_per_image"],
                "tflops_per_sec": r["detail"].get("tflops_per_sec"),
                "pct_peak": r["detail"].get("pct_peak"),
            }
        out["pixart_sigma_256"] = {
            "batch": unc["detail"]["batch"], "entries": sig,
        }

    # ---- pixart_alpha_1024 (bench_pixart_1024.py) ----
    p1024 = by_metric(jsonl(EV / "pixart1024.log"))
    if p1024:
        unc = p1024["pixart_alpha_1024_uncached_ms_per_image"]
        rows = {}
        for key, r in p1024.items():
            tail = key.removeprefix("pixart_alpha_1024_")
            if tail == "uncached_ms_per_image":
                continue
            rows[tail.removesuffix("_wallclock_speedup")] = {
                "speedup": r["value"],
                "ms_per_image": r["detail"]["cached_ms_per_image"],
                "tflops_per_sec": r["detail"].get("tflops_per_sec"),
                "pct_peak": r["detail"].get("pct_peak"),
            }
        out["pixart_alpha_1024_full_size"] = {
            "comment": (
                "NOT width-reduced - identical 0.6B model; absolute ms "
                "comparable to the A6000's 3706.14 default_1024x1024 row. "
                "Round 4: the SUBLANE-CONTRACTED transposed kernel "
                "(both matmuls contract D=72 on sublanes padded to 80 "
                "rows; zero 128-lane pad on either matmul) runs the "
                "4096-token self-attention; see the kernels section."
            ),
            "batch": unc["detail"]["batch"],
            "uncached_ms_per_image": unc["value"],
            "uncached_tflops_per_sec": unc["detail"].get("tflops_per_sec"),
            "uncached_pct_peak": unc["detail"].get("pct_peak"),
            "a6000_uncached_ms_per_image": 3706.14,
            "absolute_vs_a6000": round(3706.14 / unc["value"], 3),
            "entries": rows,
        }

    # ---- int8 quant (bench_quant.py 256 + bench_quant_1024.py) ----
    q256 = by_metric(jsonl(EV / "quant256.log"))
    q1024 = by_metric(jsonl(EV / "quant1024.log"))
    quant = {"comment": (
        "W8A8 quantized serving on the double-rate int8 MXU. Round 4: "
        "`int8_static` uses per-tensor activation scales calibrated on "
        "3 denoise timesteps of real encoder embeddings (291 sites), "
        "removing the per-token max-abs VPU pass that made dynamic int8 "
        "lose at 1024^2 in round 3. The reference has no quantized path."
    )}
    if "pixart_alpha_256_int8_serving" in q256:
        quant["pixart_alpha_256"] = (
            q256["pixart_alpha_256_int8_serving"]["detail"]["schedules"]
        )
    if "pixart_alpha_1024_int8_serving" in q1024:
        r = q1024["pixart_alpha_1024_int8_serving"]
        quant["pixart_alpha_1024"] = r["detail"]["schedules"]
        quant["pixart_alpha_1024_int8_static_vs_a6000"] = r["vs_baseline"]
    if len(quant) > 1:
        out["int8_serving_quant"] = quant

    # ---- flux width-reduced (bench_flux.py / bench_flux_1024.py) ----
    f256 = by_metric(jsonl(EV / "flux256.log"))
    if f256:
        sec: dict = {"comment": r03["flux_256_width_reduced_dim1536"][
            "comment"].split(". Round 3")[0]}
        for key, r in f256.items():
            name = key.removeprefix("flux_256_").removesuffix(
                "_wallclock_speedup")
            if name == "uncached":
                sec["batch"] = r["detail"]["batch"]
                sec["uncached_ms_per_image"] = r["detail"]["ms_per_image"]
                continue
            sec.setdefault("entries", {})[name] = {
                "speedup": r["value"],
                "ref_speedup": round(r["value"] / r["vs_baseline"], 4)
                if "vs_baseline" in r else None,
                "ms_per_image": r["detail"]["ms_per_image"],
            }
        out["flux_256_width_reduced_dim1536"] = sec
    else:
        # code path unchanged since r03 (lane-aligned D=128 attention,
        # int8_w weight storage) — carry the measured row
        row = dict(r03["flux_256_width_reduced_dim1536"])
        row["carried_from"] = "r03"
        out["flux_256_width_reduced_dim1536"] = row
    f1024 = by_metric(jsonl(EV / "flux1024.log"))
    if f1024:
        sec = {"comment": r03["flux_1024_width_reduced_dim1536"][
            "comment"].split(". The evolved")[0]}
        for key, r in f1024.items():
            name = key.removeprefix("flux_1024_").removesuffix(
                "_wallclock_speedup")
            if name == "uncached":
                sec["batch"] = r["detail"]["batch"]
                sec["uncached_20step_ms_per_image"] = (
                    r["detail"]["ms_per_image"])
                continue
            sec.setdefault("entries", {})[name] = {
                "speedup": r["value"],
                "ref_speedup": round(r["value"] / r["vs_baseline"], 4)
                if "vs_baseline" in r else None,
                "ms_per_image": r["detail"]["ms_per_image"],
            }
        out["flux_1024_width_reduced_dim1536"] = sec
    else:
        row = dict(r03["flux_1024_width_reduced_dim1536"])
        row["carried_from"] = "r03"
        out["flux_1024_width_reduced_dim1536"] = row

    # ---- 12B single-chip + batch sweep ----
    f12 = by_metric(jsonl(EV / "flux12b.log"))
    sweep = by_metric(jsonl(EV / "flux_batch_sweep.log"))
    sec = {}
    if f12:
        sec["rows"] = {
            k.removeprefix("flux_12b_single_chip_").removesuffix(
                "_absolute"): v
            for k, v in f12.items()
        }
    else:
        sec = dict(r03["flux_full_width_12B"])
        # section renamed r03->r04; tag carries the source key
        sec["carried_from"] = "r03:flux_full_width_12B"
    if "flux_12b_single_chip_batch_max" in sweep:
        sec["batch_max"] = sweep["flux_12b_single_chip_batch_max"]
    if sec:
        sec["comment"] = (
            "True 11.901B-param full-width FLUX.1-dev (dim 3072, 19 dual "
            "+ 38 single blocks) served from ONE 16 GiB v5e chip via "
            "int8 weight storage + float8 caches; the reference needs a "
            "48 GB A6000. batch_max sweeps batch to the HBM limit "
            "(VERDICT r3 #6)."
        )
        out["flux_full_width_12B_single_chip"] = sec

    # ---- full-width 1024 executed (FLUX1024_FULLDEPTH.json) ----
    fd = ROOT / "FLUX1024_FULLDEPTH.json"
    if fd.exists():
        out["flux_full_width_1024_executed"] = json.loads(fd.read_text())

    # ---- kernels (bench_attention_kernels.py) ----
    kern = by_metric(jsonl(EV / "kernels.log"))
    if kern:
        out["kernels"] = {
            "comment": (
                "Per-shape attention kernel ladder, pipelined-dispatch "
                "ms. Round 4: the sublane-contracted transposed kernel "
                "(S^T = K^T^T Q and O^T = V^T P^T, head dim on SUBLANES "
                "padded 72->80 on BOTH matmuls) replaces the round-3 "
                "transposed-PV kernel for lane-padded head dims; "
                "lane-aligned shapes keep the row-block static-clamp "
                "kernel. Regenerate: python "
                "scripts/bench_attention_kernels.py (docs/benchmarking.md)."
            ),
            "rows": kern,
        }

    # ---- search quality + trend (the round-4 headline) ----
    sq = ROOT / "search_runs/fidelity_pixart256_v2/search_quality.json"
    if sq.exists():
        q = json.loads(sq.read_text())
        out["search_quality"] = {
            "comment": (
                "82-generation pop-72 NSGA-II run ON the v5e chip "
                "optimizing a REAL objective: trajectory fidelity "
                "(latent SNR dB vs the uncached trajectory) vs "
                "total MACs. Evolved front dominance at equal MACs vs "
                "every heuristic family; hypervolume vs the heuristics' "
                "union. Artifacts: search_runs/fidelity_pixart256_v2/ "
                "(per-generation populations, trend.json, train.log)."
            ),
            "final_generation": q["final_generation"],
            "objective": q["objective"],
            "dominance_at_equal_macs": {
                k: v["dominated_pct"]
                for k, v in q["dominance_at_equal_macs"].items()
            },
            "hypervolume": q["hypervolume"],
        }

    # ---- dp8 search protocol ----
    dp8 = by_metric(jsonl(EV / "dp8.jsonl"))
    if dp8:
        out["search_loop_dp8"] = {
            "comment": (
                "The 9.5 min/pop-72-generation v5e-8 extrapolation "
                "(round 3) now has a demonstrated sharding: the "
                "1000-image candidate eval ran batch 200 = 25/chip x "
                "dp=8 on the virtual mesh, and the full-size program "
                "AOT-lowers against the real v5e:2x4 topology at "
                "4.83 GiB/chip."
            ),
            **{k: v for k, v in dp8.items()},
        }

    # ---- carried rows (code path unchanged since r03) ----
    for key in (
        "search_loop_full_protocol",
        "quality_metrics_throughput",
        "timer_crosscheck",
        "train_cli_on_tpu",
    ):
        row = dict(r03[key])
        if "chain" in row:
            # label fix (VERDICT r3 #9): the image encoder is ViT-L/16
            # per BLIP (scoring/image_reward.py:5)
            row["chain"] = row["chain"].replace("ViT-L/14", "ViT-L/16")
        row["carried_from"] = "r03"
        out[key] = row

    if dest is None:
        dest = ROOT / "BENCH_LADDER_r04.json"
    dest.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wrote {dest} with sections: {list(out)[1:]}", file=sys.stderr)


if __name__ == "__main__":
    main(pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else None)

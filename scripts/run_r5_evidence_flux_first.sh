#!/usr/bin/env bash
# Remainder of the r5 evidence suite, FLUX-critical rows first
# (VERDICT r4 #2/#3/#4/#5), cheap protocol rows last. pixart256 +
# pixart1024 already ran via run_r5_evidence.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p .r5_evidence
run() { local log=".r5_evidence/$1"; shift
  echo "=== $* > $log ($(date +%H:%M:%S))"; "$@" >"$log" 2>&1
  echo "    rc=$? ($(date +%H:%M:%S))"; }

run flux256.log            python scripts/bench_flux.py
run flux1024.log           python scripts/bench_flux_1024.py
run flux12b.log            python scripts/flux_12b_single_chip.py
run flux12b_static.log     python scripts/flux_12b_single_chip.py --quant=int8_w_static
run flux12b_1024.log       python scripts/flux_12b_1024_single_chip.py
run flux12b_1024_static.log python scripts/flux_12b_1024_single_chip.py \
    --quant=int8_w_static 1 fast_256_to_1024
run flux_batch_sweep.log   python scripts/flux_12b_batch_sweep.py
run breakdown.log          python scripts/bench_profile_breakdown.py
run quant256.log           python scripts/bench_quant.py
run quant1024.log          python scripts/bench_quant_1024.py
run kernels.log            python scripts/bench_attention_kernels.py
run search_protocol.log    python scripts/bench_search_protocol.py
run quality_metrics.log    python scripts/bench_quality_metrics.py
run crosscheck.log         python scripts/bench_profile_crosscheck.py
run dp8.jsonl              python scripts/bench_search_dp8.py
echo "=== all evidence logs written ($(date +%H:%M:%S))"

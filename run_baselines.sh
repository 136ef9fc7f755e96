#!/bin/bash
# Three-way baseline roster (reference dgl_baseline/pyg_baseline analog).
# Resumable: per-config logs land in logs/baseline_runs/, finished configs
# are skipped, then logs/baselines.csv + logs/speedups.csv are assembled
# (join against logs/roster.csv from ./run_bench.sh).
# Usage: ./run_baselines.sh [--quick] [--only torch|naive]
set -e
python -m gnnadvisor_osdi21_tpu.bench.baseline_campaign "$@"

#!/bin/bash
# Full benchmark fan-out (reference 0_run_gcn.sh / 0_run_gin.sh analog).
# Resumable: per-config logs land in logs/runs/, finished configs are
# skipped, then logs/gcn.{log,csv} logs/gin.{log,csv} logs/roster.csv are
# assembled.  Usage: ./run_bench.sh [--quick] [--smoke]
set -e
python -m gnnadvisor_osdi21_tpu.bench.campaign --only roster "$@"

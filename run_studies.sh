#!/bin/bash
# Parameter studies fan-out (reference 2_run_study.sh analog).
# Resumable: per-config logs land in logs/runs/, finished configs are
# skipped, then logs/study_*.{log,csv} are assembled.
# Usage: ./run_studies.sh [--quick] [--smoke]
set -e
python -m gnnadvisor_osdi21_tpu.bench.campaign --only studies "$@"

#!/bin/bash
# Parameter studies fan-out (reference 2_run_study.sh analog).
# Usage: ./run_studies.sh [--quick]
set -e
mkdir -p logs
for study in partsize dimtile reorder hidden; do
  python -m gnnadvisor_osdi21_tpu.bench.studies $study "$@" | tee logs/study_$study.log
  python -m gnnadvisor_osdi21_tpu.bench.study2csv logs/study_$study.log
done

#!/bin/bash
# Full benchmark fan-out (reference 0_run_gcn.sh / 0_run_gin.sh analog).
# Usage: ./run_bench.sh [--quick]
set -e
mkdir -p logs
python -m gnnadvisor_osdi21_tpu.bench.bench_models gcn "$@" | tee logs/gcn.log
python -m gnnadvisor_osdi21_tpu.bench.log2csv logs/gcn.log
python -m gnnadvisor_osdi21_tpu.bench.bench_models gin "$@" | tee logs/gin.log
python -m gnnadvisor_osdi21_tpu.bench.log2csv logs/gin.log

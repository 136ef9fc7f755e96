#!/usr/bin/env bash
# One-command environment bring-up: build the native library, install the
# package (editable), and run the smoke suite.  The analog of the
# reference's install_pkg_sm86.sh + clean_build.sh (its Docker/conda env is
# replaced here by the baked-in JAX/TPU image — no downloads required).
#
# Usage:   ./setup.sh           # build + install + smoke-test
#          ./setup.sh --clean   # remove build artifacts first
set -euo pipefail
cd "$(dirname "$0")"

if [[ "${1:-}" == "--clean" ]]; then
  echo "== cleaning build artifacts"
  rm -f gnnadvisor_osdi21_tpu/native/libgraphtools.so
  find . -name __pycache__ -type d -prune -exec rm -rf {} + 2>/dev/null || true
  shift || true
fi

echo "== building native graphtools library (g++/OpenMP, ctypes C ABI)"
python - <<'EOF'
from gnnadvisor_osdi21_tpu.native import graphtools
try:
    graphtools.get_lib()
    print("native backend: C++ (libgraphtools.so)")
except Exception as e:  # toolchain missing: the package falls back to NumPy
    print(f"native backend: NumPy fallback ({e})")
EOF

echo "== installing package (editable, no network)"
pip install -e . --no-deps --no-build-isolation -q

echo "== smoke suite (CPU mesh; full suite: python -m pytest tests/ -q)"
python -m pytest tests/test_ops.py tests/test_native.py tests/test_loader.py -q

echo "== done.  Try:"
echo "   python -m gnnadvisor_osdi21_tpu.cli --dataset citeseer --synthetic 3327,9104 --num_epoches 10"
echo "   python bench.py"

#!/usr/bin/env bash
# Host bring-up on a fresh Cloud TPU VM (or any Linux box) — the
# container-free twin of bootstrap/Dockerfile and the analog of the
# reference's install_pkg_sm86.sh.  Idempotent; safe to re-run.
#
# Usage: ./bootstrap/bootstrap.sh            # install deps + build + smoke
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== python deps (pinned to the measured versions)"
python -m pip install --upgrade pip -q
# On a TPU VM jax[tpu] selects the matching libtpu wheel; elsewhere the
# plain CPU jaxlib is installed and the CPU-mesh paths apply.
python - <<'EOF' && EXTRA="jax[tpu]==0.9.0" || EXTRA="jax==0.9.0 jaxlib==0.9.0"
import glob, sys
sys.exit(0 if glob.glob("/dev/accel*") or glob.glob("/dev/vfio/*") else 1)
EOF
python -m pip install -q $EXTRA \
    flax==0.12.3 optax==0.2.6 chex==0.1.91 einops==0.8.2 \
    "numpy==2.0.2" pytest

echo "== native toolchain check (g++ for the graph-tools library)"
command -v g++ >/dev/null || {
    echo "g++ missing: apt-get install -y g++ make  (or let the package"
    echo "fall back to its NumPy graph-tools implementation)"; }

echo "== repo build + smoke (setup.sh)"
./setup.sh

echo "== environment ready.  python bench.py  /  python -m pytest tests/ -q"

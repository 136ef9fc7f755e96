"""Bucket-step tables for rectangularizing ragged graph structures.

CSR is ragged; TPUs want static shapes.  The hybrid layout
(``graphs/hybrid.py``) bucket-sorts units (nodes or node-packs) by their
padded block count so each bucket is a dense rectangle and every reduction
is dense (zero scatters).  This module owns the allowed bucket widths and
the rounding helper it uses; the step tables trade in-bucket padding
against bucket count (one fused gather+reduce per bucket in the compiled
program).

This replaces the role of the reference's ``build_part`` neighbor grouping
(GNNAdvisor.cpp:219-249) at the *layout* level: instead of emitting
ragged partPtr/part2Node arrays for warps to chase, the degree structure is
baked into a handful of dense rectangles at build time.
"""

from __future__ import annotations

import numpy as np

# Allowed parts-per-node bucket sizes: denser than powers of two (~1.33x
# geometric growth), so padding waste stays ~12% instead of ~50% on skewed
# degree distributions, while keeping the bucket count (≈ one fused
# gather+reduce per bucket) bounded at ~40.
_BUCKET_STEPS = np.array(
    [1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96, 128,
     160, 192, 256, 320, 384, 512, 640, 768, 1024, 1280, 1536, 2048, 2560,
     3072, 4096, 5120, 6144, 8192, 10240, 12288, 16384, 20480, 24576, 32768,
     40960, 49152, 65536],
    dtype=np.int64,
)


_BUCKET_STEPS_COARSE = np.array(
    [1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384,
     32768, 65536],
    dtype=np.int64,
)


def _bucket_parts(parts: np.ndarray, steps: np.ndarray | None = None) -> np.ndarray:
    """Round parts-per-node up to the nearest allowed bucket step.

    ``steps=None`` uses the fine (~1.33x growth) table: ~10% padding, ~40
    buckets max.  ``_BUCKET_STEPS_COARSE`` (powers of two) halves the
    bucket count — smaller compiled programs — for ~25% worst-case
    in-bucket padding.
    """
    if steps is None:
        steps = _BUCKET_STEPS
    idx = np.searchsorted(steps, parts)
    idx = np.minimum(idx, len(steps) - 1)
    out = steps[idx]
    # beyond the table: round up to multiple of the largest step
    big = parts > steps[-1]
    if big.any():
        step = steps[-1]
        out[big] = -(-parts[big] // step) * step
    return out

"""Degree-bucketed, scatter-free graph layout — the TPU-shaped fast path.

The core tension (SURVEY.md §7 "hard parts"): CSR is ragged, TPUs want
static shapes, and the obvious fix — padded neighbor groups + a segment-sum
— still ends in an XLA scatter-add, which TPUs serialize.  This layout
removes *every* irregular write:

1. compute ``parts_per_node = ceil(deg / partSize)`` and round it up to a
   power of two (the node's **bucket**);
2. **relabel nodes** so buckets are contiguous (stable sort by bucket, so
   any prior rabbit-reordering locality survives within a bucket);
3. per bucket of width ``w = k·partSize``: neighbor ids form a dense
   rectangle ``[n_bucket, w]`` (right-padded), so aggregation is
   ``gather → mask/weight → sum over w`` — all dense — and the bucket
   outputs **concatenate** into the output in node order.

The only irregular op left is the feature-row gather, which is the
information-theoretic minimum (you must read each neighbor's row).  This is
the input-adaptive neighbor-grouping idea of the reference
(GNNAdvisor_kernel.cu:324-415) pushed one step further: instead of adapting
kernel launch geometry to the degree distribution, we adapt the *memory
layout* so the XLA/Mosaic compiler sees only dense, static-shape ops.

Node addressing: every tensor (features, labels, degrees, outputs) lives in
the **padded row space** of size ``num_rows = Σ padded bucket sizes``; node
``i`` of the permuted graph sits at row ``pad_pos[i]``.  Neighbor ids in
the rectangles are already remapped to padded rows at build time, so layers
compose without any translation.  Like rabbit reordering, this is a
one-time host-side preprocessing permutation.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR


def _next_pow2(x: np.ndarray) -> np.ndarray:
    x = np.maximum(x, 1)
    return np.power(2, np.ceil(np.log2(x)).astype(np.int64))


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


@dataclasses.dataclass
class Bucket:
    """One degree bucket occupying padded rows
    [row_start, row_start + num_rows)."""

    row_start: int
    num_rows: int  # padded to `pad_nodes_to`
    real_nodes: int
    width: int  # neighbor slots per node (k * part_size)
    cols: np.ndarray  # [num_rows, width] int32 — PADDED-row ids, 0-padded
    deg: np.ndarray  # [num_rows] int32 true degree (mask = iota < deg)


@dataclasses.dataclass
class BucketedGraph:
    """Bucket layout + the relabeling permutation that produced it.

    ``perm``: old node id → permuted id.  ``pad_pos``: permuted id → padded
    row.  Use ``pad_array`` / ``unpad_array`` to move node-indexed data in
    and out of the padded row space.
    """

    buckets: List[Bucket]
    perm: np.ndarray
    pad_pos: np.ndarray  # [N] permuted id -> padded row
    num_rows: int  # padded total
    real_nodes: int
    part_size: int
    degrees: np.ndarray  # [num_rows] f32 sqrt-degrees (1.0 on padding rows)
    row_mask: np.ndarray  # [num_rows] f32 — 1 for real nodes

    @property
    def padding_waste(self) -> float:
        total = sum(b.cols.size for b in self.buckets)
        valid = sum(int(b.deg.sum()) for b in self.buckets)
        return 1.0 - valid / max(total, 1)

    def pad_array(self, a: np.ndarray, permute: bool = True) -> np.ndarray:
        """Node-indexed array (original ids) → padded row space."""
        a = np.asarray(a)
        out = np.zeros((self.num_rows,) + a.shape[1:], dtype=a.dtype)
        pos = self.pad_pos[self.perm] if permute else self.pad_pos
        out[pos] = a
        return out

    def unpad_array(self, a: np.ndarray, permute: bool = True) -> np.ndarray:
        """Padded row space → node-indexed array (original ids)."""
        a = np.asarray(a)
        pos = self.pad_pos[self.perm] if permute else self.pad_pos
        return a[pos]


def bucket_permutation(row_pointers: np.ndarray, part_size: int) -> np.ndarray:
    """Stable bucket-sort permutation (old id → new id)."""
    deg = np.diff(np.asarray(row_pointers, dtype=np.int64))
    bucket = _bucket_parts(-(-np.maximum(deg, 1) // part_size))
    order = np.argsort(bucket, kind="stable")  # new position -> old id
    perm = np.empty_like(order)
    perm[order] = np.arange(len(order))
    return perm


def build_buckets(
    graph: GraphCSR, part_size: int, pad_nodes_to: int = 8
) -> tuple[GraphCSR, BucketedGraph]:
    """Relabel ``graph`` by bucket and build the dense per-bucket rectangles.

    Returns (permuted graph, bucket layout).  Hub rows are not capped: a
    power-of-two bucket for the few giant rows costs little because each
    bucket is dense over its own node set only.
    """
    perm = bucket_permutation(graph.row_pointers, part_size)
    g2 = graph.apply_permutation(perm)

    rp = np.asarray(g2.row_pointers, dtype=np.int64)
    ci = np.asarray(g2.column_index, dtype=np.int64)
    n = g2.num_nodes
    deg = np.diff(rp)
    width_of = _bucket_parts(-(-np.maximum(deg, 1) // part_size)) * part_size

    # First pass: bucket extents and the permuted-id -> padded-row map.
    extents = []  # (start, end, width, row_start, num_rows)
    pad_pos = np.empty(n, dtype=np.int64)
    start, row_start = 0, 0
    while start < n:
        w = int(width_of[start])
        end = int(np.searchsorted(width_of, w, side="right"))
        nb_real = end - start
        nb = -(-nb_real // pad_nodes_to) * pad_nodes_to
        pad_pos[start:end] = row_start + np.arange(nb_real)
        extents.append((start, end, w, row_start, nb))
        row_start += nb
        start = end
    num_rows = row_start

    # Second pass: rectangles with neighbor ids remapped to padded rows.
    buckets: List[Bucket] = []
    ci_pad = pad_pos[ci]  # every neighbor id -> padded row
    for start, end, w, row_start, nb in extents:
        nb_real = end - start
        cols = np.zeros((nb, w), dtype=np.int32)
        dg = np.zeros(nb, dtype=np.int32)
        dg[:nb_real] = deg[start:end]
        slots = rp[start:end, None] + np.arange(w)[None, :]
        valid = slots < rp[start + 1 : end + 1, None]
        cols[:nb_real] = np.where(
            valid, ci_pad[np.minimum(slots, len(ci_pad) - 1)], 0
        ).astype(np.int32)
        buckets.append(
            Bucket(
                row_start=row_start,
                num_rows=nb,
                real_nodes=nb_real,
                width=w,
                cols=cols,
                deg=dg,
            )
        )

    degrees = np.ones(num_rows, dtype=np.float32)
    degrees[pad_pos] = g2.degrees
    row_mask = np.zeros(num_rows, dtype=np.float32)
    row_mask[pad_pos] = 1.0

    bg = BucketedGraph(
        buckets=buckets,
        perm=perm,
        pad_pos=pad_pos,
        num_rows=num_rows,
        real_nodes=n,
        part_size=part_size,
        degrees=degrees,
        row_mask=row_mask,
    )
    return g2, bg

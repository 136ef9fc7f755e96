"""Hybrid hot/cold graph layout — the tuned single-chip SpMM format.

Measured TPU reality (v5e, this repo's microbenchmarks): XLA row gathers run
at a roughly *constant ~120-150M rows/s regardless of row width* (64B-1KB),
scatters are ~10x worse, and big dense matmuls stream near memory speed.
So the aggregation layout must (a) never scatter, (b) gather as few,
as-wide rows as possible, and (c) push whatever structure exists onto the
MXU.  This module does all three, input-adaptively (the GNNAdvisor thesis —
derive the execution shape from graph stats — applied to TPU):

**Hot path** (degree skew): the top-K most-referenced destination nodes
become a *bitpacked dense adjacency slab* ``hot_bits[R, K/32]`` (one bit
per (node-row, hot-column) pair) and a small gathered feature table
``x_hot = x[hot_ids]``.  ``out_hot = unpack(hot_bits) @ x_hot`` — an MXU
matmul (Pallas kernel, ops/spmm_pallas.py) whose HBM cost is K/8 bytes per
node.  Measured ~1.7ns/edge vs ~7ns/edge for gathers at ~50% coverage.

**Cold path** (the tail): nodes are packed ``pack_c`` per row-group and the
cold adjacency is stored as **c×c bit blocks**: one gathered feature row
(the destination pack, width ``c·D``) serves every cold edge between 8
source nodes and 8 destination nodes, with a c×c-bit membership mask.
This deduplicates across *both* endpoints: hub destinations get an
automatic ≥c× reduction (every src in a pack shares the row), and
community-reordered tails share packs among neighboring sources.  Per
bucket of equal block-count the structure is a dense rectangle, so
aggregation is ``gather packs → unpack mask → tiny batched matmul`` and
bucket outputs concatenate — **zero scatters**.

Pack *order* is bucket-sorted by block count (packs move as units, so
rabbit locality inside packs survives); K is chosen from the coverage
curve with a measured-cost model.

GCN's ``deg[s]·deg[d]`` weighting folds into a dense pre-scale of x rows
and post-scale of output rows, so neither path needs per-edge weights.
Reference kernels being replaced: GNNAdvisor_kernel.cu:324-415 (and the
SAG/GIN variants :186-259, :620-689).
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.buckets import _bucket_parts, _BUCKET_STEPS_COARSE
from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR


@dataclasses.dataclass
class ColdBucket:
    """Source packs with the same padded block-count ``width``; pack rows
    [pack_start, pack_start + num_packs)."""

    pack_start: int
    num_packs: int
    real_packs: int
    width: int  # block slots per source pack
    block_dst: np.ndarray  # [num_packs, width] int32 — dst pack id, 0-padded
    block_mask: np.ndarray  # [num_packs, width, c] uint32 — bits over dst offset


@dataclasses.dataclass
class HybridGraph:
    """Hot bitmask slab + cold block buckets + the relabeling."""

    perm: np.ndarray  # old id -> permuted id (identity here; kept for API)
    pad_pos: np.ndarray  # permuted id -> padded row
    num_rows: int  # padded row count (multiple of pack_c and 512)
    real_nodes: int
    pack_c: int
    cold_mode: str
    degrees: np.ndarray  # [num_rows] f32 sqrt-degrees
    row_mask: np.ndarray  # [num_rows] f32
    # hot path
    hot_k: int  # 0 = disabled
    hot_ids: np.ndarray  # [K] padded-row ids of hot nodes
    hot_bits: np.ndarray  # [num_rows, K/32] uint32 (bit-major layout)
    # cold path
    buckets: List[ColdBucket]
    # stats
    num_hot_edges: int
    num_cold_edges: int
    cold_gather_rows: int  # total valid block slots (the gather row count)

    def pad_array(self, a: np.ndarray, permute: bool = True) -> np.ndarray:
        a = np.asarray(a)
        out = np.zeros((self.num_rows,) + a.shape[1:], dtype=a.dtype)
        pos = self.pad_pos[self.perm] if permute else self.pad_pos
        out[pos] = a
        return out

    def unpad_array(self, a: np.ndarray, permute: bool = True) -> np.ndarray:
        a = np.asarray(a)
        pos = self.pad_pos[self.perm] if permute else self.pad_pos
        return a[pos]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _estimate_slots(
    unit_metric: np.ndarray, align: int, steps: np.ndarray | None = None
) -> int:
    """Padded slot count if units are bucket-sorted by ``unit_metric``
    (rectangle rows x widths, before exact-census correction)."""
    key = _bucket_parts(np.maximum(unit_metric, 1), steps)
    ks, counts = np.unique(key, return_counts=True)
    padded = (-(-counts // align)) * align
    return int((padded * ks).sum())


def choose_hot_k(
    column_index: np.ndarray,
    num_nodes: int,
    num_edges: int,
    max_k: int = 4096,
    gather_ns: float = 7.5,
    slab_ns_per_col: float = 0.0027,
) -> int:
    """Pick the hot-set size from the coverage curve with a measured cost
    model: each 512 hot columns cost ~``N·512·slab_ns_per_col`` ns of
    unpack+matmul per SpMM (VPU-bound, measured ~2.7ms at N=410k, K=1024)
    and save ``covered_edges · gather_ns``.  (The param.py:51 decider analog
    for the hybrid layout.)"""
    counts = np.bincount(column_index, minlength=num_nodes)
    order = np.argsort(counts)[::-1]
    csum = np.cumsum(counts[order])
    best_k, best_cost = 0, num_edges * gather_ns
    for k in (512, 1024, 2048, 4096):
        if k > max_k:
            break
        if k > num_nodes:
            break
        covered = int(csum[k - 1])
        slab_ns = num_nodes * k * slab_ns_per_col
        cost = slab_ns + (num_edges - covered) * gather_ns
        if cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _build_hybrid_once(
    graph: GraphCSR,
    pack_c: int | None = None,
    hot_k: int | None = None,
    feature_dim: int | None = None,
    pad_packs_to: int = 8,
    row_align: int = 512,
    cold_mode: str = "auto",
    coarse_buckets: bool = True,
) -> HybridGraph:
    """Build the hybrid layout.  ``pack_c`` defaults to ``128 // D`` capped
    to [1, 32] (one pack row ≈ one 128-lane vector row); the cold mask
    blocks are ``pack_c × pack_c`` bits (≤ 32 so a mask row fits uint32).

    ``cold_mode``:

    - ``"node"`` — one row of block slots per *node* (c×1 blocks): each
      gathered pack row is masked by a single c-bit word broadcast over
      lane groups — ~1 native VPU op per row.  Mask math is ~c× cheaper
      than "pack" mode; dedup only across one endpoint.
    - ``"pack"`` — one row of block slots per *source pack* (c×c blocks):
      maximal dedup (hubs get ≥c× automatically) but the c×c mask
      application costs ~c× more VPU work.  Best when dedup ≥ ~2.
    """
    n = graph.num_nodes
    d = feature_dim if feature_dim is not None else graph.num_features
    if pack_c is None:
        pack_c = int(np.clip(128 // max(d, 1), 1, 32))
    c = pack_c
    assert c <= 32, "pack_c must fit a uint32 mask row"
    if hot_k is None:
        hot_k = choose_hot_k(graph.column_index, n, graph.nnz)
    hot_k = max(min(hot_k, (n // 512) * 512), 0)

    counts = np.bincount(graph.column_index, minlength=n)
    hot_old = np.argsort(counts)[::-1][:hot_k] if hot_k else np.empty(0, np.int64)
    is_hot = np.zeros(n, dtype=bool)
    is_hot[hot_old] = True

    # --- split edges (original id space) --------------------------------
    rp = np.asarray(graph.row_pointers, dtype=np.int64)
    ci = np.asarray(graph.column_index, dtype=np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))
    hot_sel = is_hot[ci]
    cold_src, cold_dst = src[~hot_sel], ci[~hot_sel]
    hot_src, hot_dst = src[hot_sel], ci[hot_sel]

    # --- provisional census (natural order) -----------------------------
    n_pack0 = -(-n // c)
    dp0 = cold_dst // c
    if cold_mode == "pack":
        sp0 = cold_src // c
        uniq0 = np.unique(sp0 * np.int64(n_pack0) + dp0)
        u_sp0 = (uniq0 // n_pack0).astype(np.int64)
        unit_metric = np.bincount(u_sp0, minlength=n_pack0)
        n_units, unit = n_pack0, c  # sort unit = one pack (c rows)
    elif cold_mode == "node":
        uniq0 = np.unique(cold_src * np.int64(n_pack0) + dp0)
        u_node0 = (uniq0 // n_pack0).astype(np.int64)
        unit_metric = np.bincount(u_node0, minlength=n)
        n_units, unit = n, 1  # sort unit = one node
    elif cold_mode != "auto":
        raise ValueError(f"unknown cold_mode: {cold_mode}")

    if cold_mode == "auto":
        # Input-adaptive mode selection from the measured cost model:
        # node-mode slots cost ~4.5ns (single native mask op), pack-mode
        # slots ~11ns (cxc einsum) but dedup across both endpoints.
        sp0 = cold_src // c
        uniq_p = np.unique(sp0 * np.int64(n_pack0) + dp0)
        m_pack = np.bincount(
            (uniq_p // n_pack0).astype(np.int64), minlength=n_pack0
        )
        uniq_n = np.unique(cold_src * np.int64(n_pack0) + dp0)
        m_node = np.bincount(
            (uniq_n // n_pack0).astype(np.int64), minlength=n
        )
        est_steps = _BUCKET_STEPS_COARSE if coarse_buckets else None
        cost_pack = _estimate_slots(m_pack, pad_packs_to, est_steps) * 11.0
        cost_node = _estimate_slots(m_node, pad_packs_to * c, est_steps) * 4.5
        if cost_pack < cost_node:
            cold_mode, unit_metric, n_units, unit = "pack", m_pack, n_pack0, c
        else:
            cold_mode, unit_metric, n_units, unit = "node", m_node, n, 1

    # --- permutation: bucket-sort units by block count -------------------
    # Units move whole (in pack mode a pack's rows travel together, so any
    # upstream rabbit locality inside it survives); bucket starts stay
    # aligned to pack_c so destination packs never straddle buckets.
    steps = _BUCKET_STEPS_COARSE if coarse_buckets else None
    bucket_key = _bucket_parts(np.maximum(unit_metric, 1), steps)
    unit_order = np.argsort(bucket_key, kind="stable")  # new pos -> old unit
    align_units = max(_round_up(np.lcm(pad_packs_to, c), unit) // unit, 1)

    key_sorted = bucket_key[unit_order]
    extents = []  # (sorted_start, sorted_end, unit_start, num_units, key)
    start, unit_start = 0, 0
    while start < n_units:
        k = key_sorted[start]
        end = int(np.searchsorted(key_sorted, k, side="right"))
        nb = _round_up(end - start, align_units)
        extents.append((start, end, unit_start, nb, int(k)))
        unit_start += nb
        start = end
    total_units = _round_up(unit_start, _round_up(row_align, unit * c) // unit)
    num_rows = total_units * unit
    num_rows = _round_up(num_rows, row_align)
    total_packs = num_rows // c

    unit_pad_pos = np.full(n_units, -1, dtype=np.int64)
    for s, e, us, nb, _k in extents:
        unit_pad_pos[unit_order[s:e]] = us + np.arange(e - s)

    # node -> padded row
    if cold_mode == "pack":
        old2row = unit_pad_pos[np.arange(n) // c] * c + (np.arange(n) % c)
    else:
        old2row = unit_pad_pos[np.arange(n)]
    perm = np.arange(n, dtype=np.int64)  # identity: pad_pos does the moving
    pad_pos = old2row
    pack_pad_pos = unit_pad_pos if cold_mode == "pack" else None

    # --- hot slab (final row space, rows padded to num_rows) ------------
    if hot_k:
        from gnnadvisor_osdi21_tpu.ops.spmm_pallas import pack_slab_bits

        hot_col = np.empty(n, dtype=np.int64)
        hot_col[hot_old] = np.arange(hot_k)
        hot_bits = pack_slab_bits(
            old2row[hot_src], hot_col[hot_dst], num_rows, hot_k
        )
        hot_ids_rows = old2row[hot_old].astype(np.int32)
    else:
        hot_bits = np.zeros((num_rows, 0), dtype=np.uint32)
        hot_ids_rows = np.zeros(0, dtype=np.int32)

    # --- cold block rectangles (final space, exact census) --------------
    dp = old2row[cold_dst] // c  # final dst pack of every cold edge
    do = (old2row[cold_dst] % c).astype(np.uint32)  # lane group in final pack
    buckets: List[ColdBucket] = []
    if cold_mode == "pack":
        sp = old2row[cold_src] // c
        so = (old2row[cold_src] % c).astype(np.int64)
        keys = (sp * np.int64(total_packs) + dp) * np.int64(c) + so
        uniq = np.unique(keys)
        inv = np.searchsorted(uniq, keys)
        words = np.zeros(len(uniq), dtype=np.uint32)
        np.bitwise_or.at(words, inv, np.uint32(1) << do)
        u_blk = uniq // c
        u_so = (uniq % c).astype(np.int64)
        blk_uniq = np.unique(u_blk)
        u_dp = (blk_uniq % total_packs).astype(np.int32)
        u_sp = (blk_uniq // total_packs).astype(np.int64)
        blocks_per_sr = np.bincount(u_sp, minlength=total_packs)
        blk_start = np.concatenate(([0], np.cumsum(blocks_per_sr)))
        n_blocks = len(blk_uniq)
        blk_of_word = np.searchsorted(blk_uniq, u_blk)
        mask_rows = np.zeros((n_blocks, c), dtype=np.uint32)
        mask_rows[blk_of_word, u_so] = words
        gather_rows = int(n_blocks)
        for s, e, ps, nb, _k in extents:
            real = e - s
            packs = np.arange(ps, ps + real)
            width = max(int(blocks_per_sr[packs].max()) if real else 1, 1)
            bd = np.zeros((nb, width), dtype=np.int32)
            bm = np.zeros((nb, width, c), dtype=np.uint32)
            slots = blk_start[packs][:, None] + np.arange(width)[None, :]
            valid = slots < blk_start[packs + 1][:, None]
            safe = np.minimum(slots, max(n_blocks - 1, 0))
            if n_blocks:
                bd[:real] = np.where(valid, u_dp[safe], 0)
                bm[:real] = np.where(valid[:, :, None], mask_rows[safe], 0)
            buckets.append(ColdBucket(ps, nb, real, width, bd, bm))
    else:  # node mode: one slot row per node, single c-bit mask per slot
        sr = old2row[cold_src]
        keys = sr * np.int64(total_packs) + dp
        uniq = np.unique(keys)
        inv = np.searchsorted(uniq, keys)
        words = np.zeros(len(uniq), dtype=np.uint32)
        np.bitwise_or.at(words, inv, np.uint32(1) << do)
        u_row = (uniq // total_packs).astype(np.int64)
        u_dp = (uniq % total_packs).astype(np.int32)
        blocks_per_sr = np.bincount(u_row, minlength=num_rows)
        blk_start = np.concatenate(([0], np.cumsum(blocks_per_sr)))
        n_blocks = len(uniq)
        gather_rows = int(n_blocks)
        for s, e, us, nb, _k in extents:
            real = e - s  # units are nodes here; bucket rows [us, us+nb)
            rows = np.arange(us, us + real)
            width = max(int(blocks_per_sr[rows].max()) if real else 1, 1)
            # rectangle granularity stays per-pack for the kernel ([np, c, w])
            nb_r = _round_up(nb, c)
            bd = np.zeros((nb_r, width), dtype=np.int32)
            bm = np.zeros((nb_r, width), dtype=np.uint32)
            slots = blk_start[rows][:, None] + np.arange(width)[None, :]
            valid = slots < blk_start[rows + 1][:, None]
            safe = np.minimum(slots, max(n_blocks - 1, 0))
            if n_blocks:
                bd[:real] = np.where(valid, u_dp[safe], 0)
                bm[:real] = np.where(valid, words[safe], 0)
            buckets.append(
                ColdBucket(
                    us // c,
                    nb_r // c,
                    real,
                    width,
                    bd.reshape(nb_r // c, c, width),
                    bm.reshape(nb_r // c, c, width),
                )
            )
    # trailing alignment packs (row_align rounding) go in a zero bucket
    covered = sum(b.num_packs for b in buckets)
    if covered < total_packs:
        nb = total_packs - covered
        buckets.append(
            ColdBucket(
                pack_start=covered,
                num_packs=nb,
                real_packs=0,
                width=1,
                block_dst=np.zeros(
                    (nb, 1) if cold_mode == "pack" else (nb, c, 1), np.int32
                ),
                block_mask=np.zeros(
                    (nb, 1, c) if cold_mode == "pack" else (nb, c, 1), np.uint32
                ),
            )
        )

    degrees = np.ones(num_rows, dtype=np.float32)
    degrees[old2row] = graph.degrees
    row_mask = np.zeros(num_rows, dtype=np.float32)
    row_mask[old2row] = 1.0

    return HybridGraph(
        perm=perm,
        pad_pos=pad_pos,
        num_rows=num_rows,
        real_nodes=n,
        pack_c=c,
        cold_mode=cold_mode,
        degrees=degrees,
        row_mask=row_mask,
        hot_k=hot_k,
        hot_ids=hot_ids_rows,
        hot_bits=hot_bits,
        buckets=buckets,
        num_hot_edges=int(hot_sel.sum()),
        num_cold_edges=int((~hot_sel).sum()),
        cold_gather_rows=gather_rows,
    )


def build_hybrid(
    graph: GraphCSR,
    pack_c: int | None = None,
    hot_k: int | None = None,
    feature_dim: int | None = None,
    pad_packs_to: int = 8,
    row_align: int = 512,
    cold_mode: str = "auto",
    two_pass: bool = True,
    coarse_buckets: bool = True,
) -> HybridGraph:
    """Two-pass build: the first pass's bucket sort changes destination-pack
    boundaries, which makes the width census approximate (and the exact-max
    correction pads heavily on skewed graphs).  Relabeling by the first
    pass's node order and rebuilding makes the second census near-exact, so
    rectangle padding collapses to the bucket-step slack (~10-25%)."""
    kwargs = dict(
        pack_c=pack_c, hot_k=hot_k, feature_dim=feature_dim,
        pad_packs_to=pad_packs_to, row_align=row_align, cold_mode=cold_mode,
        coarse_buckets=coarse_buckets,
    )
    hg1 = _build_hybrid_once(graph, **kwargs)
    if not two_pass:
        return hg1
    # node order induced by pass 1 (old id -> new id, gaps removed)
    rows1 = hg1.pad_pos[hg1.perm]
    order_perm = np.empty(graph.num_nodes, dtype=np.int64)
    order_perm[np.argsort(rows1, kind="stable")] = np.arange(graph.num_nodes)
    g2 = graph.apply_permutation(order_perm)
    kwargs["cold_mode"] = hg1.cold_mode  # keep pass-1's mode decision
    hg2 = _build_hybrid_once(g2, **kwargs)
    # compose: callers address nodes by ORIGINAL ids through hg2.perm
    return dataclasses.replace(hg2, perm=order_perm[hg2.perm])

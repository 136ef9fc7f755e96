"""Hybrid hot/diagonal/residual graph layout — the tuned single-chip format.

Measured TPU reality (v5e, bench/fmtprobe.py + bench/breakdown.py):

- XLA row gathers cost ~5 ns/row at 300-600k rows, *independent of row
  width* (row-count-bound); sorted indices don't help; scatters are ~10x
  worse than gathers.
- A Pallas bit-slab matmul (unpack 1 bit/slot -> MXU dot) processes slab
  area at ~2.0 ps/slot regardless of number format (int8 dense reads are
  HBM-bound at the same cost; f32 vs bf16 dot is irrelevant — the VPU
  unpack dominates).
- Pallas streams HBM at ~690 GB/s (84% of the 819 GB/s spec).

So aggregation out[s] = Σ_{d∈N(s)} x[d] is split into three tiers, each
scatter-free and chosen input-adaptively by a measured cost model (the
GNNAdvisor thesis — derive execution shape from graph stats, param.py:51 —
re-derived for TPU economics):

1. **Diagonal tier**: rows keep their (rabbit-reordered) order; edges whose
   endpoints share a ``diag_b``-row block land in a per-block bit slab
   ``diag_bits[R, B/32]``.  One Pallas matmul per row-block against the
   block's own contiguous x slice — zero gathers.  Community reordering
   directly feeds this tier (67% of non-hub edges on an amazon0505-scale
   web graph), which is the TPU re-expression of the reference's locality
   thesis (rabbit_module/src/reorder.cpp:235-290).
2. **Hot tier**: the top-K in-degree destinations among off-block edges
   become a global bit slab ``hot_bits[R, K/32]`` against the gathered
   ``x[hot_ids]`` table (K rows, one tiny gather).
3. **Residual tier**: each remaining edge is one gather slot.  Slots are
   CSR-ordered (sorted by source row), grouped into ``res_ob``-row output
   blocks and ``res_tile``-slot tiles; the combine is a batched one-hot
   einsum (MXU) plus ONE fat-row ``segment_sum`` over tiles — scatter cost
   is per *row* and tile rows are ``res_ob·D`` wide, so the scatter is
   ~free.  Pad slots carry ``seg == res_ob`` which one-hot-matches nothing.

The reference kernels replaced: GNNAdvisor_kernel.cu:324-415 (GCN fwd),
:186-259 (SAG), :620-689 (GIN) — their warp/atomic decomposition has no
TPU analog; the tiers above are the MXU/VPU-native re-design.

GCN's multiplicative ``deg[s]·deg[d]`` weighting (dataset.py:122,
GNNAdvisor_kernel.cu:389) folds into a dense pre-scale of x and post-scale
of out, so no tier touches per-edge weights.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR

# Measured cost-model constants (v5e, bench/fmtprobe.py 2026-08-17).
SLAB_NS_PER_SLOT = 0.0020  # bit-slab unpack+dot, per (row, column) slot
GATHER_NS_PER_ROW = 5.0  # XLA take, 300-600k rows
RESID_COMBINE_NS = 2.0  # one-hot einsum + fat segment_sum, per slot

DIAG_CANDIDATES = (0, 512, 1024, 2048, 4096)
HOT_CANDIDATES = (0, 512, 1024, 2048, 4096)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class HybridGraph:
    """Three-tier layout.  Rows = original (possibly rabbit-reordered) node
    order, zero-padded at the end to ``num_rows`` — no relabeling, so the
    layout composes with any upstream permutation and across layers."""

    num_rows: int  # multiple of max(diag_b, res_ob, 512)
    real_nodes: int
    degrees: np.ndarray  # [R] f32 sqrt-degrees (1.0 on pad rows)
    row_mask: np.ndarray  # [R] f32, 1 on real rows
    # hot tier (0 = disabled)
    hot_k: int
    hot_ids: np.ndarray  # [K] int32 row ids of hot destinations
    hot_bits: np.ndarray  # [R, K/32] uint32, bit-major layout
    # diagonal tier (0 = disabled)
    diag_b: int
    diag_bits: np.ndarray  # [R, B/32] uint32, bit-major, cols local to block
    # residual tier (res_dst.size == 0 = disabled)
    res_dst: np.ndarray  # [M_pad] int32 destination row per slot
    res_seg: np.ndarray  # [M_pad] int32 src offset in out-block; OB = pad
    res_t2b: np.ndarray  # [T] int32 out-block of each tile
    res_tile: int
    res_ob: int
    # stats
    num_hot_edges: int = 0
    num_diag_edges: int = 0
    num_res_edges: int = 0
    num_res_slots: int = 0  # including padding

    # identity maps kept for API parity with relabeling layouts
    @property
    def perm(self) -> np.ndarray:
        return np.arange(self.real_nodes, dtype=np.int64)

    @property
    def pad_pos(self) -> np.ndarray:
        return np.arange(self.real_nodes, dtype=np.int64)

    def pad_array(self, a: np.ndarray, permute: bool = True) -> np.ndarray:
        """Node-indexed array -> kernel row space (zero-pad the tail)."""
        a = np.asarray(a)
        out = np.zeros((self.num_rows,) + a.shape[1:], dtype=a.dtype)
        out[: self.real_nodes] = a
        return out

    def unpad_array(self, a: np.ndarray, permute: bool = True) -> np.ndarray:
        return np.asarray(a)[: self.real_nodes]


def choose_hot_k(
    column_index: np.ndarray,
    num_nodes: int,
    num_edges: int,
    max_k: int = 4096,
    gather_ns: float = GATHER_NS_PER_ROW + RESID_COMBINE_NS,
    slab_ns_per_col: float | None = None,
) -> int:
    """Hot-set size from the coverage curve + measured cost model: K slab
    columns cost ``R·K·SLAB_NS_PER_SLOT`` per SpMM and save
    ``covered · gather_ns``.  (The param.py:51 decider analog.)"""
    if num_edges == 0 or num_nodes == 0:
        return 0
    per_col = (
        slab_ns_per_col
        if slab_ns_per_col is not None
        else SLAB_NS_PER_SLOT * num_nodes
    )
    counts = np.bincount(column_index, minlength=num_nodes)
    csum = np.cumsum(np.sort(counts)[::-1])
    best_k, best_cost = 0, float(num_edges) * gather_ns
    for k in HOT_CANDIDATES:
        if k == 0 or k > num_nodes or k > max_k:
            continue
        cost = k * per_col + (num_edges - int(csum[k - 1])) * gather_ns
        if cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def choose_tiers(
    src: np.ndarray,
    dst: np.ndarray,
    num_nodes: int,
    hot_k: int | None = None,
    diag_b: int | None = None,
) -> tuple[int, int]:
    """Jointly pick (diag_b, hot_k) minimizing the measured cost
    ``SLAB·R·(B+K) + (GATHER+COMBINE)·residual(B,K)``.

    Fixing either parameter (manual mode) restricts the search to the
    other.  Returns (diag_b, hot_k)."""
    e = len(src)
    if e == 0:
        return (diag_b or 0, hot_k or 0)
    if diag_b is not None and hot_k is not None:
        return diag_b, hot_k  # fully manual: pass through (param.py:58-70)
    res_ns = GATHER_NS_PER_ROW + RESID_COMBINE_NS
    b_cands = DIAG_CANDIDATES if diag_b is None else (diag_b,)
    best = None
    for b in b_cands:
        if b and b > _round_up(num_nodes, 512):
            continue
        if b:
            off = src // b != dst // b
            n_diag = int(e - off.sum())
            od = dst[off]
        else:
            n_diag = 0
            od = dst
        rows = _round_up(max(num_nodes, 1), max(b, 512))
        # hot curve on off-diagonal edges only: hubs that are mostly local
        # do not earn a hot column
        counts = np.bincount(od, minlength=num_nodes)
        csum = np.cumsum(np.sort(counts)[::-1])
        k_cands = HOT_CANDIDATES if hot_k is None else (hot_k,)
        for k in k_cands:
            if k > num_nodes and k != (hot_k or 0):
                continue
            covered = int(csum[min(k, len(csum)) - 1]) if k else 0
            resid = e - n_diag - covered
            cost = SLAB_NS_PER_SLOT * rows * (b + k) + res_ns * resid
            if best is None or cost < best[2]:
                best = (b, k, cost)
    assert best is not None
    return best[0], best[1]


def build_hybrid(
    graph: GraphCSR,
    hot_k: int | None = None,
    diag_b: int | None = None,
    res_tile: int = 128,
    res_ob: int = 256,
    feature_dim: int | None = None,  # kept for API compat; layout is D-free
    row_align: int = 512,
) -> HybridGraph:
    """Build the three-tier layout.  ``hot_k``/``diag_b`` default to the
    measured-cost-model choice (``choose_tiers``); pass explicit values
    (including 0 to disable a tier) for manual mode / studies."""
    n = graph.num_nodes
    rp = np.asarray(graph.row_pointers, dtype=np.int64)
    ci = np.asarray(graph.column_index, dtype=np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))

    diag_b, hot_k = choose_tiers(src, ci, n, hot_k=hot_k, diag_b=diag_b)
    assert diag_b % 512 == 0, f"diag_b {diag_b} must be a multiple of 512"

    num_rows = _round_up(max(n, 1), max(diag_b, res_ob, row_align))

    # --- classify edges: diag > hot > residual --------------------------
    if diag_b:
        in_diag = (src // diag_b) == (ci // diag_b)
    else:
        in_diag = np.zeros(len(src), dtype=bool)

    if hot_k:
        assert hot_k % 32 == 0, f"hot_k {hot_k} must be a multiple of 32"
        counts = np.bincount(ci[~in_diag], minlength=n)
        top = np.argsort(counts)[::-1][:hot_k].astype(np.int32)
        # hot_k > n: pad the id table with row 0 — those columns never set
        # a bit, so the padded gathers contribute nothing
        hot_ids = np.zeros(hot_k, dtype=np.int32)
        hot_ids[: len(top)] = top
        hot_col = np.full(n, -1, dtype=np.int64)
        hot_col[top] = np.arange(len(top))
        in_hot = (~in_diag) & (hot_col[ci] >= 0)
    else:
        hot_ids = np.zeros(0, dtype=np.int32)
        in_hot = np.zeros(len(src), dtype=bool)

    in_res = ~(in_diag | in_hot)

    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import pack_slab_bits

    # --- bit slabs ------------------------------------------------------
    if hot_k:
        hot_bits = pack_slab_bits(
            src[in_hot], hot_col[ci[in_hot]], num_rows, hot_k
        )
    else:
        hot_bits = np.zeros((num_rows, 0), dtype=np.uint32)
    if diag_b:
        diag_bits = pack_slab_bits(
            src[in_diag], ci[in_diag] % diag_b, num_rows, diag_b
        )
    else:
        diag_bits = np.zeros((num_rows, 0), dtype=np.uint32)

    # --- residual slot stream -------------------------------------------
    rs, rd = src[in_res], ci[in_res]  # already sorted by rs (CSR order)
    n_blocks = num_rows // res_ob
    if len(rs):
        blk = rs // res_ob
        counts_b = np.bincount(blk, minlength=n_blocks)
        padded_b = _round_up_arr(counts_b, res_tile)
        starts = np.concatenate(([0], np.cumsum(padded_b)))
        m_pad = int(starts[-1])
        res_dst = np.zeros(m_pad, dtype=np.int32)
        res_seg = np.full(m_pad, res_ob, dtype=np.int32)  # pad: matches none
        # position of each slot: block start + within-block index
        within = np.arange(len(rs)) - np.concatenate(
            ([0], np.cumsum(counts_b))
        )[blk]
        pos = starts[blk] + within
        res_dst[pos] = rd
        res_seg[pos] = rs - blk * res_ob
        res_t2b = np.repeat(
            np.arange(n_blocks, dtype=np.int32), padded_b // res_tile
        )
    else:
        res_dst = np.zeros(0, dtype=np.int32)
        res_seg = np.zeros(0, dtype=np.int32)
        res_t2b = np.zeros(0, dtype=np.int32)

    degrees = np.ones(num_rows, dtype=np.float32)
    degrees[:n] = graph.degrees
    row_mask = np.zeros(num_rows, dtype=np.float32)
    row_mask[:n] = 1.0

    return HybridGraph(
        num_rows=num_rows,
        real_nodes=n,
        degrees=degrees,
        row_mask=row_mask,
        hot_k=hot_k,
        hot_ids=hot_ids,
        hot_bits=hot_bits,
        diag_b=diag_b,
        diag_bits=diag_bits,
        res_dst=res_dst,
        res_seg=res_seg,
        res_t2b=res_t2b,
        res_tile=res_tile,
        res_ob=res_ob,
        num_hot_edges=int(in_hot.sum()),
        num_diag_edges=int(in_diag.sum()),
        num_res_edges=int(in_res.sum()),
        num_res_slots=len(res_dst),
    )


def _round_up_arr(x: np.ndarray, m: int) -> np.ndarray:
    return -(-x // m) * m

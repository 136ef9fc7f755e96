"""Multi-chip hybrid layout: the tuned three-tier kernel, edge-partitioned.

Round-1 limitation fixed here (SURVEY.md §2.3 mandate (b) follow-up): the
distributed path used to reduce only via padded ELL parts, losing the
single-chip tuned layout.  This module builds ONE hybrid layout per device
block so multi-chip training runs the same diagonal/hot/residual kernels:

- destination rows are sharded in contiguous blocks of ``B`` (a multiple of
  ``diag_b``, so global diagonal blocks never straddle devices),
- each device's gather space is its static halo table ``[x_local ; recv]``
  (same all_to_all plan as ``partition.shard_graph``),
- the **diagonal tier reads only x_local** — by construction its columns are
  block-local — so it carries no data dependency on the halo exchange and
  XLA overlaps the Pallas slab matmul with the all_to_all (the
  interior/boundary overlap of dist_ops, now on the tuned kernel),
- hot + residual tiers index the halo table and run once the exchange lands.

All per-device arrays are padded to fleet-wide maxima and stacked on a
leading ``[ndev]`` axis, ready for ``shard_map`` (parallel/dist_hybrid.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.hybrid import (
    build_residual_stream,
    choose_tiers,
)
from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass
class HybridShardedGraph:
    """Stacked per-device hybrid layouts + the halo exchange plan."""

    num_devices: int
    block: int  # B: rows per device (multiple of max(diag_b, res_ob, 512))
    num_nodes: int  # original (unpadded) node count
    halo: int  # Hmax: rows exchanged per (src, dst) device pair
    diag_b: int
    hot_k: int
    res_tile: int
    res_ob: int
    # all arrays lead with [ndev]; bit arrays transposed ([words, rows])
    # to dodge the 128-lane minor-dim padding (spmm_pallas docstring)
    diag_bits: np.ndarray  # [ndev, diag_b/32, B] uint32 (cols local to block)
    hot_ids: np.ndarray  # [ndev, K] int32 — TABLE row ids
    hot_bits: np.ndarray  # [ndev, K/32, B] uint32
    res_gather: np.ndarray  # [ndev, Ug] int32 — TABLE row ids (stage 1)
    res_dst: np.ndarray  # [ndev, M] int32 into res_gather (stage 2)
    res_mask: np.ndarray  # [ndev, res_ob/32, M] uint32 multi-hot
    res_mask_s: np.ndarray  # [ndev, res_tile/32, T*res_ob] slot-major twin
    res_t2b: np.ndarray  # [ndev, T] int32 tile -> out-block (sorted)
    send_idx: np.ndarray  # [ndev, ndev, Hmax] int32 rows to ship
    degrees: np.ndarray  # [ndev, B] f32 sqrt-degrees
    node_mask: np.ndarray  # [ndev, B] f32, 1 on real rows

    @property
    def table_rows(self) -> int:
        return self.block + self.num_devices * self.halo


def shard_graph_hybrid(
    graph: GraphCSR,
    num_devices: int,
    diag_b: int | None = None,
    hot_k: int | None = None,
    res_tile: int = 256,
    res_ob: int = 256,
    pad_halo_to: int = 8,
) -> HybridShardedGraph:
    """Partition + per-device hybrid layout build.

    ``diag_b``/``hot_k`` default to the whole-graph measured cost model
    (graphs/hybrid.py:choose_tiers) so single- and multi-chip runs make the
    same tier decision; both are fleet-global (common static shapes).
    """
    n = graph.num_nodes
    rp = np.asarray(graph.row_pointers, dtype=np.int64)
    ci = np.asarray(graph.column_index, dtype=np.int64)
    src = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))

    diag_b, hot_k = choose_tiers(src, ci, n, hot_k=hot_k, diag_b=diag_b)
    align = max(diag_b, res_ob, 512)
    block = _round_up(_round_up(max(n, num_devices), num_devices) // num_devices, align)
    n_pad = block * num_devices

    src_dev = src // block
    dst_dev = ci // block

    # --- halo sets: unique remote ids device d needs from device e -------
    # (hot + residual columns; diagonal columns are local by construction)
    if diag_b:
        in_diag = (src // diag_b) == (ci // diag_b)
    else:
        in_diag = np.zeros(len(src), dtype=bool)
    remote = (~in_diag) & (src_dev != dst_dev)
    need: list[list[np.ndarray]] = []
    h_max = 1
    for d in range(num_devices):
        row: list[np.ndarray] = []
        for e in range(num_devices):
            if e == d:
                row.append(np.empty(0, dtype=np.int64))
                continue
            sel = remote & (src_dev == d) & (dst_dev == e)
            ids = np.unique(ci[sel])
            row.append(ids)
            h_max = max(h_max, len(ids))
        need.append(row)
    h_max = _round_up(h_max, pad_halo_to)
    table = block + num_devices * h_max

    send_idx = np.zeros((num_devices, num_devices, h_max), dtype=np.int32)
    for d in range(num_devices):
        for e in range(num_devices):
            ids = need[d][e]
            send_idx[e, d, : len(ids)] = (ids - e * block).astype(np.int32)

    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import (
        pack_slab_bits, transpose_slab,
    )

    # --- per-device layout build ------------------------------------------
    per = []
    ug_max = m_max = t_max = 1
    for d in range(num_devices):
        mine = src_dev == d
        s_l = src[mine] - d * block  # local output rows
        dst_g = ci[mine]
        dloc = in_diag[mine]

        # remap columns to the device's gather table
        col_t = np.empty_like(dst_g)
        local = dst_dev[mine] == d
        col_t[local] = dst_g[local] - d * block
        for e in range(num_devices):
            if e == d:
                continue
            sel = (~local) & (dst_dev[mine] == e)
            if not sel.any():
                continue
            pos = np.searchsorted(need[d][e], dst_g[sel])
            col_t[sel] = block + e * h_max + pos

        # diagonal tier: block-local columns (transposed storage)
        if diag_b:
            diag_bits = transpose_slab(pack_slab_bits(
                s_l[dloc], (dst_g[dloc] % diag_b), block, diag_b
            ))
        else:
            diag_bits = np.zeros((0, block), dtype=np.uint32)

        # hot tier: top-K table ids among off-diagonal edges
        od_cols = col_t[~dloc]
        od_rows = s_l[~dloc]
        if hot_k:
            counts = np.bincount(od_cols, minlength=table)
            top = np.argsort(counts)[::-1][:hot_k].astype(np.int32)
            top = top[counts[top] > 0]
            # pad columns never set a bit; id 0 (a real table row) is only
            # a duplicate gather of K-len(top) rows, there is no per-device
            # row guaranteed zero in the gather table (see graphs/hybrid.py
            # for the single-chip sentinel-zero-row variant)
            hot_ids = np.zeros(hot_k, dtype=np.int32)
            hot_ids[: len(top)] = top
            hot_col = np.full(table, -1, dtype=np.int64)
            hot_col[top] = np.arange(len(top))
            is_hot = hot_col[od_cols] >= 0
            hot_bits = transpose_slab(pack_slab_bits(
                od_rows[is_hot], hot_col[od_cols[is_hot]], block, hot_k
            ))
        else:
            hot_ids = np.zeros(0, dtype=np.int32)
            hot_bits = np.zeros((0, block), dtype=np.uint32)
            is_hot = np.zeros(len(od_cols), dtype=bool)

        # both mask orientations travel: out-row-major for the CPU-mesh
        # reference path, slot-major for the transposed TPU kernels
        rg, rd_, rm, rms, rt, _pairs = build_residual_stream(
            od_rows[~is_hot], od_cols[~is_hot], table, block, res_tile, res_ob
        )
        per.append((diag_bits, hot_ids, hot_bits, rg, rd_, rm, rms, rt))
        ug_max = max(ug_max, len(rg))
        m_max = max(m_max, len(rd_))
        t_max = max(t_max, len(rt))

    m_max = _round_up(m_max, res_tile)
    t_max = max(t_max, m_max // res_tile)
    words = res_ob // 32
    kw = hot_k // 32
    dw = diag_b // 32
    n_blocks = block // res_ob

    diag_bits = np.zeros((num_devices, dw, block), dtype=np.uint32)
    hot_ids = np.zeros((num_devices, hot_k), dtype=np.int32)
    hot_bits = np.zeros((num_devices, kw, block), dtype=np.uint32)
    res_gather = np.zeros((num_devices, ug_max), dtype=np.int32)
    res_dst = np.zeros((num_devices, m_max), dtype=np.int32)
    res_mask = np.zeros((num_devices, words, m_max), dtype=np.uint32)
    sw = res_tile // 32
    res_mask_s = np.zeros((num_devices, sw, t_max * res_ob), dtype=np.uint32)
    res_t2b = np.full((num_devices, t_max), n_blocks - 1, dtype=np.int32)
    for d, (db, hi, hb, rg, rd_, rm, rms, rt) in enumerate(per):
        diag_bits[d, :, :] = db
        hot_ids[d, : len(hi)] = hi
        hot_bits[d, :, :] = hb
        res_gather[d, : len(rg)] = rg
        res_dst[d, : len(rd_)] = rd_
        res_mask[d, :, : rm.shape[1]] = rm
        if rms.size:
            res_mask_s[d, :, : rms.shape[1]] = rms
        # padded tail tiles (initialized to n_blocks-1 ≥ any real t2b) keep
        # the per-device tile->block map sorted; their masks are all-zero
        res_t2b[d, : len(rt)] = rt

    deg_pad = np.ones(n_pad, dtype=np.float32)
    deg_pad[:n] = graph.degrees
    mask = np.zeros(n_pad, dtype=np.float32)
    mask[:n] = 1.0

    return HybridShardedGraph(
        num_devices=num_devices,
        block=block,
        num_nodes=n,
        halo=h_max,
        diag_b=diag_b,
        hot_k=hot_k,
        res_tile=res_tile,
        res_ob=res_ob,
        diag_bits=diag_bits,
        hot_ids=hot_ids,
        hot_bits=hot_bits,
        res_gather=res_gather,
        res_dst=res_dst,
        res_mask=res_mask,
        res_mask_s=res_mask_s,
        res_t2b=res_t2b,
        send_idx=send_idx,
        degrees=deg_pad.reshape(num_devices, block),
        node_mask=mask.reshape(num_devices, block),
    )

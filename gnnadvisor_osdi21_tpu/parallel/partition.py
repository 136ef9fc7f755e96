"""Multi-chip graph partitioning (host-side precompute).

The reference is strictly single-GPU (GNNA_main.py:53); this module is the
new first-class capability the TPU build adds (SURVEY.md §2.3): partition a
graph's *destination rows* across devices in contiguous blocks and
precompute a static, padded **halo exchange plan** so each device can fetch
the remote source-node features its local edges reference with one
``all_to_all`` per layer.

All outputs are rectangles (static shapes), stacked along a leading device
axis, ready to be sharded over a 1-D ``Mesh`` and consumed inside
``shard_map`` (parallel/dist_ops.py):

- ``x`` rows: device ``d`` owns global rows ``[d·B, (d+1)·B)`` (N padded
  to ``ndev·B`` with isolated degree-0 nodes),
- ``part_*``: each device's neighbor groups (owners are sorted, so a
  device's parts are one contiguous slice, padded to the max count),
- ``send_idx[e, d, k]``: local row on device ``e`` of the k-th feature row
  it ships to device ``d``; the receiver indexes the concatenated table
  ``[x_local ; recv]`` via ``part_cols`` remapped at build time.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR
from gnnadvisor_osdi21_tpu.graphs.partition import build_neighbor_groups


@dataclasses.dataclass
class ShardedGraph:
    """Per-device stacked graph tensors + the halo exchange plan."""

    num_devices: int
    block: int  # B: rows per device
    num_nodes: int  # original (unpadded) node count
    halo: int  # Hmax: padded rows exchanged per (src, dst) device pair
    part_size: int
    # All arrays have a leading [ndev] axis.  Parts are split at build time
    # into INTERIOR (every neighbor locally owned — reducible against
    # x_local while the halo all_to_all is in flight; the communication-
    # overlap design point of SURVEY.md §2.3) and BOUNDARY (needs the
    # exchanged table).  Owners stay sorted within each class, so both
    # reductions use the fast sorted segment-sum and their partials add
    # exactly.
    int_cols: np.ndarray  # [ndev, PImax, S] int32 — local row ids (< B)
    int_lens: np.ndarray  # [ndev, PImax] int32
    int2local: np.ndarray  # [ndev, PImax] int32
    bnd_cols: np.ndarray  # [ndev, PBmax, S] int32 — gather-table ids
    bnd_lens: np.ndarray  # [ndev, PBmax] int32
    bnd2local: np.ndarray  # [ndev, PBmax] int32
    send_idx: np.ndarray  # [ndev, ndev, Hmax] int32 — rows to ship
    degrees: np.ndarray  # [ndev, B] f32 sqrt-degrees of owned rows
    node_mask: np.ndarray  # [ndev, B] f32 — 1 for real nodes, 0 for padding
    # --- ragged exchange plan (same contract as HybridShardedGraph) ------
    # ``bnd_cols`` index the COMPACT table [x_local ; ragged recv] — each
    # receiver's halo packs contiguously in sender order instead of
    # striding every pair to the fleet-wide Hmax.  TPU ships exact bytes
    # via jax.lax.ragged_all_to_all; the CPU mesh emulates the same table
    # layout over a dense all_to_all + ``halo_repack`` gather.
    halo_sizes: np.ndarray | None = None  # [ndev(r), ndev(s)] int32
    recv_max: int = 0  # padded max Σ_s halo_sizes[r, s]
    send_flat: np.ndarray | None = None  # [ndev, Smax] sender gather list
    halo_in_off: np.ndarray | None = None  # [ndev(s), ndev(r)] send offsets
    halo_send_sizes: np.ndarray | None = None  # [ndev(s), ndev(r)]
    halo_out_off: np.ndarray | None = None  # [ndev(s), ndev(r)] recv offsets
    halo_repack: np.ndarray | None = None  # [ndev(r), recv_max] dense->ragged

    @property
    def table_rows(self) -> int:
        """Rows in each device's gather table: local block + received halo."""
        return self.block + self.recv_max

    def plan_bytes(self, backend: str = "tpu") -> int:
        """Per-device exchange-plan payload in bytes (dist_ops._graph_specs
        ships only the backend's own plan — see HybridShardedGraph twin)."""
        nd = self.num_devices
        if backend == "tpu":
            return 4 * (self.send_flat.shape[1] + 4 * nd)
        return 4 * (nd * self.halo + self.recv_max)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def shard_graph(
    graph: GraphCSR,
    num_devices: int,
    part_size: int | None = None,
    pad_parts_to: int = 8,
    pad_halo_to: int = 8,
) -> ShardedGraph:
    """Build the static halo-exchange plan for ``num_devices`` row blocks."""
    if part_size is None:
        part_size = max(2, min(int(graph.avg_degree), 64))
    n = graph.num_nodes
    block = _round_up(max(n, num_devices), num_devices) // num_devices
    n_pad = block * num_devices

    groups = build_neighbor_groups(
        graph.row_pointers, graph.column_index, part_size, pad_parts_to=1
    )
    owners = groups.part2node[: groups.num_real_parts].astype(np.int64)
    cols = groups.part_cols[: groups.num_real_parts]
    lens = groups.part_lens[: groups.num_real_parts]
    owner_dev = owners // block

    # Per-device contiguous part slices (owners sorted by construction).
    dev_part_start = np.searchsorted(owner_dev, np.arange(num_devices))
    dev_part_end = np.searchsorted(owner_dev, np.arange(num_devices), side="right")
    p_max = _round_up(max(int((dev_part_end - dev_part_start).max()), 1), pad_parts_to)

    col_dev = cols.astype(np.int64) // block  # owner device of each referenced id

    # Halo sets: unique remote ids device d needs from device e.
    need: list[list[np.ndarray]] = []
    h_max = 1
    for d in range(num_devices):
        s, e = dev_part_start[d], dev_part_end[d]
        dcols = cols[s:e]
        dlens = lens[s:e]
        valid = np.arange(part_size)[None, :] < dlens[:, None]
        row: list[np.ndarray] = []
        for src in range(num_devices):
            if src == d:
                row.append(np.empty(0, dtype=np.int64))
                continue
            sel = valid & (col_dev[s:e] == src)
            ids = np.unique(dcols[sel].astype(np.int64))
            row.append(ids)
            h_max = max(h_max, len(ids))
        need.append(row)
    h_max = _round_up(h_max, pad_halo_to)

    # --- exchange plans ---------------------------------------------------
    # halo_sizes[r, s] = unique rows receiver r needs from sender s; the
    # COMPACT table packs each receiver's halo in sender order (exclusive-
    # cumsum offsets), so the wire ships Σ_s sizes[r, s] rows per device
    # instead of the dense plan's ndev·Hmax (VERDICT r4 item 8: the ELL
    # path used to pad every pair to uniform Hmax).
    halo_sizes = np.array(
        [[len(need[d][s]) for s in range(num_devices)] for d in range(num_devices)],
        dtype=np.int32,
    )
    recv_off = np.zeros((num_devices, num_devices), dtype=np.int32)
    recv_off[:, 1:] = np.cumsum(halo_sizes, axis=1)[:, :-1]
    recv_max = _round_up(max(int(halo_sizes.sum(axis=1).max(initial=0)), 1),
                         pad_halo_to)
    send_per = halo_sizes.sum(axis=0)
    s_max = _round_up(max(int(send_per.max(initial=0)), 1), pad_halo_to)
    halo_send_sizes = np.ascontiguousarray(halo_sizes.T)  # [s, r]
    halo_in_off = np.zeros((num_devices, num_devices), dtype=np.int32)
    halo_in_off[:, 1:] = np.cumsum(halo_send_sizes, axis=1)[:, :-1]
    halo_out_off = np.ascontiguousarray(recv_off.T)  # [s, r] -> recv_off[r, s]

    send_idx = np.zeros((num_devices, num_devices, h_max), dtype=np.int32)
    send_flat = np.zeros((num_devices, s_max), dtype=np.int32)
    halo_repack = np.zeros((num_devices, recv_max), dtype=np.int32)
    for d in range(num_devices):
        for src in range(num_devices):
            ids = need[d][src]
            nh = len(ids)
            # device `src` ships rows ids - src*block to device d
            loc = (ids - src * block).astype(np.int32)
            send_idx[src, d, :nh] = loc
            send_flat[src, halo_in_off[src, d]: halo_in_off[src, d] + nh] = loc
            halo_repack[d, recv_off[d, src]: recv_off[d, src] + nh] = (
                src * h_max + np.arange(nh, dtype=np.int32)
            )

    # Remap part_cols to the receiver's COMPACT gather table
    # [x_local ; ragged recv]: the halo row of id k from sender `src` lands
    # at table row block + recv_off[d, src] + rank(k within need[d][src]).
    # Parts split interior/boundary.
    per_dev = []  # (int_(cols,lens,p2l), bnd_(cols,lens,p2l))
    pi_max = pb_max = 1
    for d in range(num_devices):
        s, e = dev_part_start[d], dev_part_end[d]
        dcols = cols[s:e].astype(np.int64)
        dlens = lens[s:e]
        downers = (owners[s:e] - d * block).astype(np.int32)
        remapped = np.empty_like(dcols, dtype=np.int64)
        local = col_dev[s:e] == d
        remapped[local] = dcols[local] - d * block
        for src in range(num_devices):
            if src == d:
                continue
            sel = col_dev[s:e] == src
            if not sel.any():
                continue
            pos = np.searchsorted(need[d][src], dcols[sel])
            remapped[sel] = block + recv_off[d, src] + pos
        valid_slots = np.arange(part_size)[None, :] < dlens[:, None]
        # padding slots (beyond each part's length) must stay in local
        # range: jnp.take's default OOB mode is fill-with-NaN, and NaN*0
        # is still NaN under the reduce mask.
        remapped[~valid_slots] = 0
        interior = ~np.any(valid_slots & (col_dev[s:e] != d), axis=1)
        per_dev.append(
            (
                (remapped[interior], dlens[interior], downers[interior]),
                (remapped[~interior], dlens[~interior], downers[~interior]),
            )
        )
        pi_max = max(pi_max, int(interior.sum()))
        pb_max = max(pb_max, int((~interior).sum()))
    pi_max = _round_up(pi_max, pad_parts_to)
    pb_max = _round_up(pb_max, pad_parts_to)

    def _stack(cap, idx):
        c = np.zeros((num_devices, cap, part_size), dtype=np.int32)
        l = np.zeros((num_devices, cap), dtype=np.int32)
        o = np.zeros((num_devices, cap), dtype=np.int32)
        for d in range(num_devices):
            rc, rl, ro = per_dev[d][idx]
            k = len(rl)
            c[d, :k] = rc.astype(np.int32)
            l[d, :k] = rl
            o[d, :k] = ro
            if k:  # keep owners sorted through the padding
                o[d, k:] = ro[-1]
        return c, l, o

    int_cols, int_lens, int2local = _stack(pi_max, 0)
    bnd_cols, bnd_lens, bnd2local = _stack(pb_max, 1)

    deg_pad = np.zeros(n_pad, dtype=np.float32)
    deg_pad[:n] = graph.degrees
    deg_pad[n:] = 1.0  # sqrt(max(0,1)) for padding nodes
    mask = np.zeros(n_pad, dtype=np.float32)
    mask[:n] = 1.0

    return ShardedGraph(
        num_devices=num_devices,
        block=block,
        num_nodes=n,
        halo=h_max,
        part_size=part_size,
        int_cols=int_cols,
        int_lens=int_lens,
        int2local=int2local,
        bnd_cols=bnd_cols,
        bnd_lens=bnd_lens,
        bnd2local=bnd2local,
        send_idx=send_idx,
        degrees=deg_pad.reshape(num_devices, block),
        node_mask=mask.reshape(num_devices, block),
        halo_sizes=halo_sizes,
        recv_max=recv_max,
        send_flat=send_flat,
        halo_in_off=halo_in_off,
        halo_send_sizes=halo_send_sizes,
        halo_out_off=halo_out_off,
        halo_repack=halo_repack,
    )

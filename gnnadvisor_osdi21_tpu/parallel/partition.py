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
    # all arrays have a leading [ndev] axis:
    part_cols: np.ndarray  # [ndev, Pmax, S] int32 — indices into local table
    part_lens: np.ndarray  # [ndev, Pmax] int32
    part2local: np.ndarray  # [ndev, Pmax] int32 — owner row within the block
    send_idx: np.ndarray  # [ndev, ndev, Hmax] int32 — rows to ship
    degrees: np.ndarray  # [ndev, B] f32 sqrt-degrees of owned rows
    node_mask: np.ndarray  # [ndev, B] f32 — 1 for real nodes, 0 for padding

    @property
    def table_rows(self) -> int:
        """Rows in each device's gather table: local block + received halo."""
        return self.block + self.num_devices * self.halo


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

    send_idx = np.zeros((num_devices, num_devices, h_max), dtype=np.int32)
    for d in range(num_devices):
        for src in range(num_devices):
            ids = need[d][src]
            # device `src` ships rows ids - src*block to device d
            send_idx[src, d, : len(ids)] = (ids - src * block).astype(np.int32)

    # Remap part_cols to the receiver's gather table [x_local ; recv].
    # recv layout after all_to_all: recv[src, k] = x_src[send_idx[src, d, k]],
    # flattened to rows block + src*h_max + k.
    part_cols_out = np.zeros((num_devices, p_max, part_size), dtype=np.int32)
    part_lens_out = np.zeros((num_devices, p_max), dtype=np.int32)
    part2local = np.zeros((num_devices, p_max), dtype=np.int32)
    for d in range(num_devices):
        s, e = dev_part_start[d], dev_part_end[d]
        cnt = e - s
        dcols = cols[s:e].astype(np.int64)
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
            remapped[sel] = block + src * h_max + pos
        part_cols_out[d, :cnt] = remapped.astype(np.int32)
        part_lens_out[d, :cnt] = lens[s:e]
        part2local[d, :cnt] = (owners[s:e] - d * block).astype(np.int32)
        # Padding parts keep owner = last real owner's local row (sorted,
        # zero-length ⇒ zero contribution), or 0 if the device has no parts.
        if cnt:
            part2local[d, cnt:] = part2local[d, cnt - 1]

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
        part_cols=part_cols_out,
        part_lens=part_lens_out,
        part2local=part2local,
        send_idx=send_idx,
        degrees=deg_pad.reshape(num_devices, block),
        node_mask=mask.reshape(num_devices, block),
    )

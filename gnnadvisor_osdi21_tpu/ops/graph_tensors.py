"""Device-side graph representation (a JAX pytree) + kernel-path selection.

The reference moves four CSR/partition tensors to the GPU before training
(GNNA_main.py:107-110).  The TPU analog is this pytree: whichever arrays the
selected aggregation path needs, in static shapes, living on device and
closed over by the jitted train step.

Paths (selected by the decider, tuner/decider.py):

- ``"ell"``    — padded neighbor-group gather + two-level sorted segment-sum.
                 The direct TPU re-expression of the reference's
                 warp-per-part kernel; good for large, skewed graphs.
- ``"dense"``  — materialized adjacency on the MXU (``A @ X`` as one
                 matmul).  Optimal for small graphs (N ≤ a few thousand)
                 where the whole adjacency fits comfortably in HBM; this
                 path has no CUDA analog — it exists because the MXU makes
                 it speed-of-light.
- ``"coo"``    — per-edge gather + sorted segment-sum (the Gunrock-style
                 naive baseline, cf. Gunrock/app/spmm/spmm_enactor.cuh:92-105,
                 minus the atomics).

(The tuned ``"hybrid"`` path, including its Pallas hot-slab kernel, has its
own pytree: ``ops/hybrid_agg.HybridTensors``.)
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR
from gnnadvisor_osdi21_tpu.graphs.partition import NeighborGroups, build_neighbor_groups
from gnnadvisor_osdi21_tpu.ops import reference


@dataclasses.dataclass(frozen=True)
class GraphTensors:
    """All device arrays an aggregation path may need.

    Unused optional fields are ``None`` (pytree leaves absent), so a jitted
    function closed over a ``GraphTensors`` only pays for what its path uses.
    """

    # --- data fields (pytree leaves) ---
    degrees: jax.Array  # [N] f32 sqrt(max(deg,1))
    part_cols: Optional[jax.Array] = None  # [P, S] i32
    part_lens: Optional[jax.Array] = None  # [P] i32
    part2node: Optional[jax.Array] = None  # [P] i32
    coo_src: Optional[jax.Array] = None  # [nnz] i32 (sorted)
    coo_dst: Optional[jax.Array] = None  # [nnz] i32
    dense_adj: Optional[jax.Array] = None  # [N, N]
    # --- static fields ---
    num_nodes: int = 0
    part_size: int = 0
    method: str = "ell"
    # model-stack GEMM compute dtype (ops.aggregate._gemm): "bfloat16"
    # halves the dense operand bytes with f32 accumulation — an opt-in
    # production lever beyond the reference's f32 contract
    gemm_dtype: str = "float32"

    def with_method(self, method: str) -> "GraphTensors":
        return dataclasses.replace(self, method=method)


jax.tree_util.register_dataclass(
    GraphTensors,
    data_fields=[
        "degrees",
        "part_cols",
        "part_lens",
        "part2node",
        "coo_src",
        "coo_dst",
        "dense_adj",
    ],
    meta_fields=["num_nodes", "part_size", "method", "gemm_dtype"],
)


def build_graph_tensors(
    graph: GraphCSR,
    method: str = "ell",
    part_size: Optional[int] = None,
    groups: Optional[NeighborGroups] = None,
    adj_dtype=jnp.float32,
    device=None,
    gemm_dtype: str = "float32",
) -> GraphTensors:
    """Assemble the arrays the chosen ``method`` needs and put them on device."""
    put = lambda a: jax.device_put(a, device)
    kwargs: dict = dict(
        degrees=put(jnp.asarray(graph.degrees)),
        num_nodes=graph.num_nodes,
        method=method,
        gemm_dtype=gemm_dtype,
    )
    if method == "ell":
        if groups is None:
            if part_size is None:
                part_size = max(int(graph.avg_degree), 1)
            groups = build_neighbor_groups(
                graph.row_pointers, graph.column_index, part_size
            )
        kwargs.update(
            part_cols=put(jnp.asarray(groups.part_cols)),
            part_lens=put(jnp.asarray(groups.part_lens)),
            part2node=put(jnp.asarray(groups.part2node)),
            part_size=groups.part_size,
        )
    elif method == "coo":
        coo_src = reference.csr_to_coo(graph.row_pointers, graph.column_index)
        kwargs.update(
            coo_src=put(jnp.asarray(coo_src)),
            coo_dst=put(jnp.asarray(graph.column_index)),
        )
    elif method == "dense":
        adj = reference.dense_adjacency(
            graph.row_pointers, graph.column_index, dtype=np.float32
        )
        kwargs.update(dense_adj=put(jnp.asarray(adj, dtype=adj_dtype)))
    elif method == "hybrid":
        raise ValueError(
            "method='hybrid' has its own builder: graphs.hybrid.build_hybrid"
            " + ops.hybrid_agg.build_hybrid_tensors (it relabels nodes, so"
            " features/labels must be moved to the padded row space)"
        )
    else:
        raise ValueError(f"unknown aggregation method: {method}")
    return GraphTensors(**kwargs)

"""GNNAdvisor-TPU: a TPU-native, input-adaptive GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
GNNAdvisor OSDI'21 artifact (YukeWang96/GNNAdvisor_OSDI21):

- input-adaptive neighbor-group aggregation (the CUDA warp-per-part 2D
  decomposition re-expressed as static-shape padded neighbor groups +
  deterministic segment reductions; reference GNNAdvisor_kernel.cu:324-415),
- a graph-stat-driven parameter decider (reference param.py:51-120) re-targeted
  at TPU tiles and kernel selection,
- community-based node reordering (reference rabbit_module/) as a native C++
  preprocessing pass,
- GCN / GIN model families with fused forward/backward aggregation ops
  (reference gnn_conv.py), and
- a new multi-chip runtime: edge-partitioned graphs over a
  ``jax.sharding.Mesh`` with boundary-feature exchange over ICI.
"""

__version__ = "0.1.0"

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR, load_graph, synthesize_graph
from gnnadvisor_osdi21_tpu.graphs.partition import NeighborGroups, build_neighbor_groups
from gnnadvisor_osdi21_tpu.tuner.decider import InputProperty

__all__ = [
    "GraphCSR",
    "load_graph",
    "synthesize_graph",
    "NeighborGroups",
    "build_neighbor_groups",
    "InputProperty",
]

from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR, load_graph, synthesize_graph
from gnnadvisor_osdi21_tpu.graphs.partition import NeighborGroups, build_neighbor_groups

__all__ = [
    "GraphCSR",
    "load_graph",
    "synthesize_graph",
    "NeighborGroups",
    "build_neighbor_groups",
]

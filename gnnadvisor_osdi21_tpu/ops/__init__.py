from gnnadvisor_osdi21_tpu.ops.graph_tensors import GraphTensors
from gnnadvisor_osdi21_tpu.ops.aggregate import aggregate, sag, gcn_conv, gin_conv
from gnnadvisor_osdi21_tpu.ops import reference

__all__ = ["GraphTensors", "aggregate", "sag", "gcn_conv", "gin_conv", "reference"]

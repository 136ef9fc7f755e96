from gnnadvisor_osdi21_tpu.models.gcn import init_gcn, gcn_apply
from gnnadvisor_osdi21_tpu.models.gin import init_gin, gin_apply

__all__ = ["init_gcn", "gcn_apply", "init_gin", "gin_apply"]

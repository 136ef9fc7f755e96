from gnnadvisor_osdi21_tpu.tuner.decider import InputProperty, LayerConfig

__all__ = ["InputProperty", "LayerConfig"]

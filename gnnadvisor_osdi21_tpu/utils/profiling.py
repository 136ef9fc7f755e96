"""Profiling + roofline utilities (SURVEY.md §5 'Tracing / profiling').

The reference's profiling is cudaEvent timing + GFLOPs printouts behind
``#ifdef PROFILE`` (GNNAdvisor_kernel.cu:134-175); the TPU analog is a
``jax.profiler`` trace plus roofline accounting against HBM bandwidth.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax

# v5e-class single-chip peaks (used for roofline fractions).
HBM_BYTES_PER_S = 819e9
BF16_FLOPS = 197e12
F32_FLOPS = 49e12


@dataclasses.dataclass
class RooflineReport:
    seconds: float
    bytes_accessed: int
    flops: int

    @property
    def achieved_gbs(self) -> float:
        return self.bytes_accessed / self.seconds / 1e9

    @property
    def hbm_fraction(self) -> float:
        return self.bytes_accessed / self.seconds / HBM_BYTES_PER_S

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    def __str__(self) -> str:
        return (
            f"{self.seconds * 1e3:.3f} ms | {self.achieved_gbs:.0f} GB/s "
            f"({self.hbm_fraction * 100:.0f}% of HBM) | "
            f"{self.achieved_tflops:.2f} TFLOP/s"
        )


def spmm_roofline(seconds: float, nnz: int, dim: int, num_nodes: int,
                  dtype_bytes: int = 4) -> RooflineReport:
    """Roofline for one SpMM: must read every neighbor row once and write
    every output row once (the information-theoretic floor)."""
    bytes_accessed = (nnz + num_nodes) * dim * dtype_bytes
    return RooflineReport(seconds, bytes_accessed, 2 * nnz * dim)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/gnnadvisor_tpu_trace"):
    """jax.profiler trace context — open with xprof/tensorboard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

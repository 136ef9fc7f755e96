"""Pallas TPU kernels for the hot-path bit-slab SpMM.

``hot_slab_matmul``: computes ``out = unpack_bits(A_bits) @ x_hot`` where
``A_bits[R, K/32]`` holds one bit per (node row, hot column) adjacency and
``x_hot[K, D]`` is the hot-node feature table.  This is the MXU
re-expression of the reference's warp-level aggregation for high-in-degree
neighbors (GNNAdvisor_kernel.cu:324-415): instead of thousands of warps
gathering the same hub features through HBM, every grid step

1. DMAs a ``[TR, K/32]`` uint32 tile of the slab into VMEM (the only HBM
   traffic that scales with the graph: K/8 bytes per node),
2. unpacks it to a ``[TR, K]`` bf16 0/1 matrix with two vector ops
   (lane-repeat + shift/mask — no HBM traffic),
3. multiplies against the VMEM-resident ``x_hot`` on the MXU.

No atomics, no gathers, fully deterministic.  The cold tail of the degree
distribution goes through the packed-gather path (ops/hybrid_agg.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hot_kernel(bits_ref, shift_ref, xh_ref, out_ref):
    """One grid step: rows tile of the bit slab x the whole hot table."""
    bits = bits_ref[:]  # [TR, W32] uint32
    # Bit-major column layout: A column j lives in word j % W32 at bit
    # j // W32 — chosen because pltpu.repeat TILES its input, so one
    # repeat + one shift unpacks the whole slab tile.  The shift row
    # (j // W32) is a precomputed input: no per-element iota/division.
    words = pltpu.repeat(bits, 32, axis=1)  # [TR, K], words[:, j] = bits[:, j % w32]
    bit = (words >> shift_ref[:]) & 1
    # 0/1 uint32 -> f32 without int casts: 1.0f is 0x3F800000, so a single
    # integer multiply + bitcast materializes the float matrix.
    a = pltpu.bitcast(bit * jnp.uint32(0x3F800000), jnp.float32).astype(
        jnp.bfloat16
    )
    out_ref[:] = jnp.dot(
        a, xh_ref[:], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def hot_slab_matmul(
    bits: jax.Array,  # [R, K/32] uint32
    x_hot: jax.Array,  # [K, D] float32/bf16
    block_rows: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """out[R, D] f32 = unpack(bits) @ x_hot."""
    r, w32 = bits.shape
    k, d = x_hot.shape
    assert k == w32 * 32, f"bit slab K={w32 * 32} != x_hot rows {k}"
    assert r % block_rows == 0, f"rows {r} not a multiple of {block_rows}"
    grid = (r // block_rows,)
    shift_row = (jnp.arange(k, dtype=jnp.uint32) // jnp.uint32(w32))[None, :]
    return pl.pallas_call(
        _hot_kernel,
        out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block_rows, w32), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * d,
            bytes_accessed=r * w32 * 4 + k * d * 4 + r * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits, shift_row, x_hot.astype(jnp.bfloat16))


def pack_slab_bits(rows: "np.ndarray", cols: "np.ndarray", num_rows: int, k: int):
    """Host-side slab builder: set bit for each (row, hot-column) pair using
    the kernel's bit-major layout (column j → word j % (K/32), bit j // (K/32))."""
    import numpy as np

    w32 = k // 32
    bits = np.zeros((num_rows, w32), dtype=np.uint32)
    word = cols % w32
    bit = (cols // w32).astype(np.uint32)
    np.bitwise_or.at(bits, (rows, word), np.uint32(1) << bit)
    return bits


def unpack_slab(bits: "np.ndarray", k: int):
    """Oracle unpack (tests): [R, K/32] uint32 → [R, K] 0/1 float32."""
    import numpy as np

    w32 = k // 32
    j = np.arange(k)
    return (
        (bits[:, j % w32] >> (j // w32).astype(np.uint32)) & np.uint32(1)
    ).astype(np.float32)


def hot_slab_matmul_auto(bits: jax.Array, x_hot: jax.Array) -> jax.Array:
    """Dispatch: Pallas on TPU, interpreter elsewhere (tests on CPU)."""
    interpret = jax.default_backend() not in ("tpu", "axon")
    return hot_slab_matmul(bits, x_hot, interpret=interpret)

"""Decompose the slab kernels' fixed cost: per-row vs per-grid-step.

The tier cost model (graphs/hybrid.py) prices a slab pass as
``rows * (SLAB_A + SLAB_B * C)`` with SLAB_A ~= 7.3 ns/row — fit at the
block_rows values the diag tier allowed (<= diag_b).  If that "per-row"
constant is really a per-grid-STEP pipeline overhead, raising block_rows
divides it away; this probe separates the two by sweeping block_rows at
fixed slab geometry, plus a trivial copy kernel as the pure-step-overhead
floor, plus a D sweep to expose 128-lane padding traffic on x/out.

Usage: python -m gnnadvisor_osdi21_tpu.bench.stepprobe   (on the TPU)
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import (
        hot_slab_matmul, pack_slab_bits, transpose_slab,
    )
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

    r = 409_600  # multiple of every block_rows swept
    rng = np.random.default_rng(0)

    def slab(k):
        rows_e = rng.integers(0, r, size=8 * r)
        cols_e = rng.integers(0, k, size=8 * r)
        return jnp.asarray(transpose_slab(pack_slab_bits(rows_e, cols_e, r, k)))

    print(f"== hot slab_matmul, R={r}: K x D x block_rows x dtype ==")
    for k in (128, 512, 1024, 2048):
        bits = slab(k)
        for d in (16, 128):
            for dt in (jnp.bfloat16, jnp.float32):
                x_hot = jnp.ones((k, d), dt)
                for br in (512, 1024, 2048):
                    if k * br * 4 > 14 << 20:
                        continue  # scoped-vmem limit on the unpacked tile
                    sec = chained_device_time(
                        lambda xh, b: hot_slab_matmul(b, xh, block_rows=br),
                        x_hot, bits, iters=30,
                    )
                    steps = r // br
                    print(
                        f"K={k:5d} D={d:4d} {dt.__name__:9s} br={br:5d}: "
                        f"{sec*1e3:7.3f} ms  {sec/r*1e9:6.2f} ns/row  "
                        f"{sec/steps*1e6:7.2f} us/step",
                        flush=True,
                    )

    # ---- dense-slab variants: skip the bit unpack entirely --------------
    # slab stored as 0/1 bytes (int8, 1 convert op/slot) or bf16 (no VPU
    # work at all) [K, R] transposed; per-slot cost should drop to the
    # HBM stream rate (~2-3 ps/slot) vs the bit slab's ~8 ps VPU unpack.
    def _dense_kernel(a_ref, x_ref, o_ref):
        a = a_ref[:]
        if a.dtype != x_ref.dtype:
            a = a.astype(x_ref.dtype)
        o_ref[:] = jax.lax.dot_general(
            a, x_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @functools.partial(jax.jit, static_argnames=("br",))
    def dense_slab(a_t, x, br):
        k_, r_ = a_t.shape
        d_ = x.shape[1]
        return pl.pallas_call(
            _dense_kernel,
            out_shape=jax.ShapeDtypeStruct((r_, d_), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(r_ // br,),
                in_specs=[
                    pl.BlockSpec((k_, br), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k_, d_), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((br, d_), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
            ),
        )(a_t, x)

    print("== dense slab (no unpack), R x K, D=16 ==", flush=True)
    for k in (512, 1024, 2048):
        rows_e = rng.integers(0, r, size=8 * r)
        cols_e = rng.integers(0, k, size=8 * r)
        a = np.zeros((k, r), dtype=np.int8)
        a[cols_e, rows_e] = 1
        for sdt, xdt in ((jnp.int8, jnp.bfloat16), (jnp.bfloat16, jnp.bfloat16),
                         (jnp.int8, jnp.float32)):
            a_t = jnp.asarray(a, dtype=sdt)
            x = jnp.ones((k, 16), xdt)
            for br in (512, 1024, 2048):
                sec = chained_device_time(
                    lambda x_, aa: dense_slab(aa, x_, br), x, a_t, iters=30
                )
                gbs = r * k * a_t.dtype.itemsize / sec / 1e9
                print(
                    f"K={k:5d} slab={sdt.__name__:9s} x={xdt.__name__:9s} "
                    f"br={br:5d}: {sec*1e3:7.3f} ms  {sec/r*1e9:6.2f} ns/row "
                    f"{sec/(r*k)*1e12:5.2f} ps/slot  {gbs:5.0f} GB/s",
                    flush=True,
                )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Probe the slab kernels' per-row FIXED cost (~3.6 ns/row, K/D/dtype
independent — stepprobe.py) and evaluate the transposed-output fix.

Hypothesis: a [R, 16] f32 output is physically [R, 128] under the TPU's
(8, 128) tiling, so every slab pass writes 512 B/row of which 7/8 is lane
padding; storing features transposed ([D, R], rows on the lane axis) makes
all streaming exact-bytes.  Variants measured:

1. bit slab with transposed out (swap dot operands), K sweep
2. int8 slab with transposed out, K sweep
3. XLA gather cost from [R, 16] (axis 0) vs [16, R] (axis 1) — the
   residual tier's stage gathers under each storage layout.

Usage: python -m gnnadvisor_osdi21_tpu.bench.fixprobe   (on the TPU)
"""

from __future__ import annotations

import functools
import sys


def main(argv=None) -> int:
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import (
        pack_slab_bits, _unpack_tile_t,
    )
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

    # Legacy uint32 transposed layout for the _unpack_tile_t comparison arm:
    # pack_slab_bits is bit-major [R, K/32], and the legacy device layout was
    # literally its transpose ([K/32, R] uint32).  transpose_slab now emits
    # the production uint16 layout, which this probe's kernel does not read.
    def _transpose_u32(b):
        return np.ascontiguousarray(b.T)

    r = 409_600
    k = 512
    br = 1024
    rng = np.random.default_rng(0)
    rows_e = rng.integers(0, r, size=8 * r)
    cols_e = rng.integers(0, k, size=8 * r)
    bits = jnp.asarray(_transpose_u32(pack_slab_bits(rows_e, cols_e, r, k)))
    a8 = np.zeros((k, r), dtype=np.int8)
    a8[cols_e, rows_e] = 1
    a8 = jnp.asarray(a8)

    def report(name, sec, denom_rows=r):
        print(f"{name:44s} {sec*1e3:7.3f} ms  {sec/denom_rows*1e9:6.2f} ns/row",
              flush=True)



    # 3/4: slab kernels with transposed x/out -------------------------------
    def _bit_t_kernel(bits_ref, shift_ref, xt_ref, out_ref):
        a_t = _unpack_tile_t(bits_ref, shift_ref, xt_ref.dtype)  # [K, TR]
        out_ref[:] = jax.lax.dot_general(
            xt_ref[:], a_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [D, TR]

    @functools.partial(jax.jit, static_argnames=("br_",))
    def bit_slab_t(bits_t, x_t, br_):
        w32, r_ = bits_t.shape
        k_ = w32 * 32
        d_ = x_t.shape[0]
        shift_col = (jnp.arange(k_, dtype=jnp.uint32) // jnp.uint32(w32))[:, None]
        return pl.pallas_call(
            _bit_t_kernel,
            out_shape=jax.ShapeDtypeStruct((d_, r_), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(r_ // br_,),
                in_specs=[
                    pl.BlockSpec((w32, br_), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((k_, 1), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d_, k_), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((d_, br_), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
        )(bits_t, shift_col, x_t)

    def _i8_t_kernel(a_ref, xt_ref, out_ref):
        a = a_ref[:].astype(xt_ref.dtype)
        out_ref[:] = jax.lax.dot_general(
            xt_ref[:], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @functools.partial(jax.jit, static_argnames=("br_",))
    def i8_slab_t(a_t, x_t, br_):
        k_, r_ = a_t.shape
        d_ = x_t.shape[0]
        return pl.pallas_call(
            _i8_t_kernel,
            out_shape=jax.ShapeDtypeStruct((d_, r_), jnp.float32),
            grid_spec=pl.GridSpec(
                grid=(r_ // br_,),
                in_specs=[
                    pl.BlockSpec((k_, br_), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d_, k_), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((d_, br_), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
            ),
        )(a_t, x_t)

    for ks in (128, 512, 1024, 2048, 4096):
        rows_s = rng.integers(0, r, size=8 * r)
        cols_s = rng.integers(0, ks, size=8 * r)
        bits_s = jnp.asarray(_transpose_u32(pack_slab_bits(rows_s, cols_s, r, ks)))
        x_t = jnp.ones((16, ks), jnp.bfloat16)
        for br_ in (2048, 4096, 8192):
            if ks * br_ * 2 > 12 << 20:
                continue
            sec = chained_device_time(
                lambda xt, b: bit_slab_t(b, xt, br_), x_t, bits_s, iters=30)
            ps = (sec / r - 0.5e-9) / ks * 1e12
            report(f"bitT K={ks} bf16 br={br_} (~{ps:4.1f}ps/slot)", sec)
        a8s = np.zeros((ks, r), dtype=np.int8)
        a8s[cols_s, rows_s] = 1
        a8s = jnp.asarray(a8s)
        for br_ in (2048, 4096):
            if ks * br_ * (1 + 2) > 24 << 20:
                continue
            sec = chained_device_time(
                lambda xt, a: i8_slab_t(a, xt, br_), x_t, a8s, iters=30)
            ps = (sec / r - 0.5e-9) / ks * 1e12
            report(f"i8T  K={ks} bf16 br={br_} (~{ps:4.1f}ps/slot)", sec)
        del a8s, bits_s

    # 5: gather economics under each layout ----------------------------------
    ud = 93_000
    ids = jnp.asarray(rng.integers(0, r, size=ud, dtype=np.int32))
    x_row = jnp.ones((r, 16), jnp.float32)
    x_col = jnp.ones((16, r), jnp.float32)

    @jax.jit
    def g_row(x_, i_):
        return jnp.take(x_, i_, axis=0)

    @jax.jit
    def g_col(x_, i_):
        return jnp.take(x_, i_, axis=1)

    sec = chained_device_time(
        lambda i_, x_: i_ + jnp.sum(g_row(x_, i_)).astype(jnp.int32) * 0,
        ids, x_row, iters=30)
    report(f"gather {ud} rows from [R,16] (axis 0)", sec, denom_rows=ud)
    sec = chained_device_time(
        lambda i_, x_: i_ + jnp.sum(g_col(x_, i_)).astype(jnp.int32) * 0,
        ids, x_col, iters=30)
    report(f"gather {ud} cols from [16,R] (axis 1)", sec, denom_rows=ud)
    return 0


if __name__ == "__main__":
    sys.exit(main())

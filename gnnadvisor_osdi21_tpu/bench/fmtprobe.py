"""On-chip format probes for the hybrid-v2 kernel design decisions.

Measures, on the real TPU, the primitives the v2 layout composes from, so
format choices (bit-slab vs int8 slab, tile sizes, segment-reduce shape)
are driven by measured rates rather than datasheet numbers:

1. Pallas HBM streaming ceiling (int8 + f32 read-reduce kernels)
2. hot-slab matmul: bit-packed (current) vs int8 dense read
3. XLA row gather at residual scale (~350k packed rows)
4. one-hot segment-reduce (the scatter-free cold combine): Pallas tile
   kernel with MXU one-hot matmul accumulation

Usage: python -m gnnadvisor_osdi21_tpu.bench.fmtprobe [--only a,b,...]
(one TPU process at a time; see utils/timing.py).
"""

from __future__ import annotations

import argparse
import functools
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=410624)
    p.add_argument("--k", type=int, default=4096)
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--only", default="", help="comma list: stream,slab,gather,segred")
    args = p.parse_args(argv)
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

    r, k, d = args.rows, args.k, args.dim
    rng = np.random.default_rng(0)

    # ---------------- 1. streaming ceiling ------------------------------
    if want("stream"):
        def _sum_kernel(a_ref, s_ref, o_ref):
            # s_ref varies per timing iteration: forces re-execution (a
            # constant-input call would be hoisted out of the fori_loop)
            a = a_ref[:]
            if a.dtype == jnp.uint32:
                a = a.astype(jnp.int32)
            o_ref[:] = jnp.sum(a.astype(jnp.float32)) + s_ref[:]

        def stream(a, s, block):
            g = a.shape[0] // block
            return pl.pallas_call(
                _sum_kernel,
                out_shape=jax.ShapeDtypeStruct((g * 8, 128), jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(g,),
                    in_specs=[
                        pl.BlockSpec((block, a.shape[1]), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((8, 128), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                ),
            )(a, s)

        for dtype, name in ((jnp.int8, "int8"), (jnp.float32, "f32"),
                            (jnp.uint32, "u32")):
            # build on device (a multi-GB host array would crawl through
            # the tunnel); content is irrelevant to streaming rate
            a = jax.jit(lambda: jnp.ones((r, k), dtype), static_argnums=())()
            a.block_until_ready()
            nbytes = a.size * a.dtype.itemsize

            def run(x, aux):
                return stream(aux, x.astype(jnp.float32), 512)

            sec = chained_device_time(run, jnp.zeros((8, 128)), a, iters=args.iters)
            print(f"pallas stream {name:5s} [{r}x{k}] {nbytes/1e6:7.1f}MB: "
                  f"{sec*1e3:7.3f} ms = {nbytes/sec/1e9:6.1f} GB/s")

    # ---------------- 2. slab matmul variants ---------------------------
    if want("slab"):
        from gnnadvisor_osdi21_tpu.ops.spmm_pallas import (
            hot_slab_matmul, pack_slab_bits, transpose_slab,
        )

        nnz = 6 * r
        rows_i = rng.integers(0, r, nnz)
        cols_i = rng.integers(0, k, nnz)
        bits = jnp.asarray(transpose_slab(
            pack_slab_bits(rows_i, cols_i, r, k)))  # 67MB: ok
        xh = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))

        sec = chained_device_time(
            lambda x, aux: hot_slab_matmul(aux[0], aux[1] + x[0, 0]),
            jnp.zeros((8, 128)), (bits, xh), iters=args.iters)
        print(f"bit-slab  matmul [{r}x{k}]x[{k}x{d}]: {sec*1e3:7.3f} ms "
              f"({r*k/sec/1e12:.2f} Tslot/s)")

        # int8 dense A, converted to bf16 tile-wise in VMEM (device-built:
        # 1.7GB would crawl through the tunnel)
        a8 = jax.jit(lambda: (jnp.ones((r, k), jnp.int8)))()
        a8.block_until_ready()

        def _i8_kernel(a_ref, x_ref, o_ref):
            o_ref[:] = jnp.dot(a_ref[:].astype(jnp.bfloat16), x_ref[:],
                               preferred_element_type=jnp.float32)

        @functools.partial(jax.jit, static_argnames=("block",))
        def i8_slab(a, x, block=512):
            return pl.pallas_call(
                _i8_kernel,
                out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
                grid_spec=pl.GridSpec(
                    grid=(r // block,),
                    in_specs=[
                        pl.BlockSpec((block, k), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((k, d), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                                           memory_space=pltpu.VMEM),
                ),
                cost_estimate=pl.CostEstimate(
                    flops=2 * r * k * d, bytes_accessed=r * k + k * d * 2 + r * d * 4,
                    transcendentals=0),
            )(a, x.astype(jnp.bfloat16))

        for blk in (512, 1024):
            sec = chained_device_time(
                lambda x, aux: i8_slab(aux[0], aux[1] + x[0, 0], block=blk),
                jnp.zeros((8, 128)), (a8, xh), iters=args.iters)
            print(f"int8-slab matmul blk={blk} [{r}x{k}]x[{k}x{d}]: {sec*1e3:7.3f} ms "
                  f"({r*k/sec/1e9:.0f} GB/s read)")

    # ---------------- 3. residual-scale gather --------------------------
    if want("gather"):
        table = jnp.asarray(rng.standard_normal((r // 8, 128)).astype(np.float32))
        for m in (131072, 262144, 524288):
            idx = jnp.asarray(np.sort(rng.integers(0, r // 8, m)).astype(np.int32))

            def g(x, aux):
                t, ix = aux
                return jnp.take(t + x[0, 0], ix, axis=0)

            sec = chained_device_time(g, jnp.zeros((8, 128)), (table, idx),
                                      iters=args.iters)
            print(f"gather {m:7d} x128-lane rows: {sec*1e3:7.3f} ms "
                  f"= {m/sec/1e6:6.1f} M rows/s")

    # ---------------- 3b. XLA residual pipeline (no pallas) -------------
    if want("xlares"):
        # gather + mask-fold + batched one-hot einsum + fat segment_sum
        OB = 512
        for TILE in (128, 256):
            m = 393216
            t_total = m // TILE
            n_blocks = r // OB
            table = jnp.asarray(rng.standard_normal((r // 8, 128)).astype(np.float32))
            idx = jnp.asarray(np.sort(rng.integers(0, r // 8, m)).astype(np.int32))
            masks = jnp.asarray(rng.integers(1, 255, (m, 1)).astype(np.uint32))
            segs = jnp.asarray(
                np.sort(rng.integers(0, OB, (t_total, TILE))).astype(np.int32))
            t2b = jnp.asarray(
                np.minimum(np.arange(t_total) * n_blocks // t_total,
                           n_blocks - 1).astype(np.int32))

            @jax.jit
            def resid(x, aux):
                table_, idx_, masks_, segs_, t2b_ = aux
                rows = jnp.take(table_ + x[0, 0], idx_, axis=0)  # [m, 128]
                group = (jnp.arange(128, dtype=jnp.uint32) // d)[None, :]
                mm = ((masks_ >> group) & 1).astype(jnp.float32)
                v = (rows * mm).reshape(m, 128 // d, d).sum(axis=1)  # [m, D]
                v3 = v.reshape(t_total, TILE, d).astype(jnp.bfloat16)
                oh = (segs_[:, :, None]
                      == jnp.arange(OB, dtype=jnp.int32)[None, None, :]
                      ).astype(jnp.bfloat16)
                chunks = jnp.einsum("tso,tsd->tod", oh, v3,
                                    preferred_element_type=jnp.float32)
                flat = chunks.reshape(t_total, OB * d)
                out = jax.ops.segment_sum(flat, t2b_, num_segments=n_blocks)
                return out.reshape(n_blocks * OB, d)

            sec = chained_device_time(
                resid, jnp.zeros((8, 128)), (table, idx, masks, segs, t2b),
                iters=args.iters)
            print(f"xla-resid TILE={TILE} OB={OB} m={m}: {sec*1e3:7.3f} ms "
                  f"= {m/sec/1e6:6.1f} M slots/s")

    # ---------------- 3c. slab unpack variants --------------------------
    if want("slabvar"):
        from gnnadvisor_osdi21_tpu.ops.spmm_pallas import pack_slab_bits

        nnz = 6 * r
        bits = jnp.asarray(pack_slab_bits(
            rng.integers(0, r, nnz), rng.integers(0, k, nnz), r, k))
        xh = jnp.asarray(rng.standard_normal((k, d)).astype(np.float32))
        w32 = k // 32

        def mk_slab(variant, block):
            def kern(bits_ref, aux_ref, xh_ref, out_ref):
                words = pltpu.repeat(bits_ref[:], 32, axis=1)
                if variant == "base_bf16":
                    bit = (words >> aux_ref[:]) & 1
                    a = pltpu.bitcast(bit * jnp.uint32(0x3F800000),
                                      jnp.float32).astype(jnp.bfloat16)
                    out_ref[:] = jnp.dot(a, xh_ref[:],
                                         preferred_element_type=jnp.float32)
                elif variant == "mul_f32dot":
                    bit = (words >> aux_ref[:]) & 1
                    a = pltpu.bitcast(bit * jnp.uint32(0x3F800000), jnp.float32)
                    out_ref[:] = jnp.dot(a, xh_ref[:].astype(jnp.float32),
                                         preferred_element_type=jnp.float32)

            aux = (jnp.arange(k, dtype=jnp.uint32)
                   // jnp.uint32(w32))[None, :]

            @jax.jit
            def call(bits_, xh_):
                return pl.pallas_call(
                    kern,
                    out_shape=jax.ShapeDtypeStruct((r, d), jnp.float32),
                    grid_spec=pl.GridSpec(
                        grid=(r // block,),
                        in_specs=[
                            pl.BlockSpec((block, w32), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((1, k), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((k, d), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM),
                        ],
                        out_specs=pl.BlockSpec((block, d), lambda i: (i, 0),
                                              memory_space=pltpu.VMEM),
                    ),
                )(bits_, aux, xh_ if variant == "mul_f32dot"
                  else xh_.astype(jnp.bfloat16))

            return call

        for variant in ("base_bf16", "mul_f32dot"):
            for blk in (512, 1024):
                fn = mk_slab(variant, blk)
                sec = chained_device_time(
                    lambda x, aux: fn(aux[0], aux[1] + x[0, 0]),
                    jnp.zeros((8, 128)), (bits, xh), iters=args.iters)
                print(f"slab {variant:10s} blk={blk}: {sec*1e3:7.3f} ms")

    # ---------------- 4. one-hot segment-reduce -------------------------
    if want("segred"):
        # synthetic: M slots sorted over out rows, OB-row out-blocks,
        # TILE slots per grid step, tile->block map via scalar prefetch.
        for TILE, OB in ((256, 256), (512, 512), (256, 512), (512, 256),
                         (1024, 512)):
            m = 393216  # ~384k slots
            n_blocks = r // OB
            # even spread: block b gets m//n_blocks slots (tile-aligned)
            per_block = max(((m // n_blocks) // TILE) * TILE, TILE)
            tiles_per_block = per_block // TILE
            t_total = n_blocks * tiles_per_block
            seg_local = np.sort(
                rng.integers(0, OB, (t_total, TILE))
            ).astype(np.int32).reshape(t_total * TILE, 1)
            tile2blk = np.repeat(np.arange(n_blocks, dtype=np.int32),
                                 tiles_per_block)
            first = np.ones(t_total, dtype=np.int32)
            first[1:] = tile2blk[1:] != tile2blk[:-1]
            vals = jax.jit(lambda: jnp.ones((t_total * TILE, 128),
                                            jnp.float32))()
            masks = rng.integers(1, 255, (t_total * TILE, 1)).astype(np.uint32)

            def _seg_kernel(t2b_ref, first_ref, vals_ref, mask_ref, seg_ref,
                            s_ref, out_ref):
                t = pl.program_id(0)
                group = (jax.lax.broadcasted_iota(jnp.uint32, (1, 128), 1)
                         // jnp.uint32(d))
                mm = pltpu.bitcast(
                    ((mask_ref[:] >> group) & 1) * jnp.uint32(0x3F800000),
                    jnp.float32)
                vm = (vals_ref[:] * mm).astype(jnp.bfloat16)
                # lane-group fold c*D -> D via a tiny matmul (Mosaic cannot
                # reshape across the lane dimension)
                li = jax.lax.broadcasted_iota(jnp.int32, (128, d), 0)
                di = jax.lax.broadcasted_iota(jnp.int32, (128, d), 1)
                rmat = (li % d == di).astype(jnp.bfloat16)
                v = jnp.dot(vm, rmat, preferred_element_type=jnp.float32)
                iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, OB), 1)
                onehot = (seg_ref[:] == iota).astype(jnp.bfloat16)
                part = jax.lax.dot_general(
                    onehot, v.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32) + s_ref[0, 0]

                @pl.when(first_ref[t] == 1)
                def _():
                    out_ref[:] = part

                @pl.when(first_ref[t] != 1)
                def _():
                    out_ref[:] += part

            @jax.jit
            def segred(vals, masks, segs, t2b, first, s):
                grid_spec = pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(t_total,),
                    in_specs=[
                        pl.BlockSpec((TILE, 128), lambda t, t2b, fr: (t, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((TILE, 1), lambda t, t2b, fr: (t, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((TILE, 1), lambda t, t2b, fr: (t, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((8, 128), lambda t, t2b, fr: (0, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((OB, d), lambda t, t2b, fr: (t2b[t], 0),
                                           memory_space=pltpu.VMEM),
                )
                return pl.pallas_call(
                    _seg_kernel,
                    out_shape=jax.ShapeDtypeStruct((n_blocks * OB, d), jnp.float32),
                    grid_spec=grid_spec,
                )(t2b, first, vals, masks, segs, s)

            sec = chained_device_time(
                lambda x, aux: segred(aux[0], aux[1], aux[2], aux[3],
                                      aux[4], x.astype(jnp.float32)),
                jnp.zeros((8, 128)),
                (jnp.asarray(vals), jnp.asarray(masks),
                 jnp.asarray(seg_local),
                 jnp.asarray(tile2blk), jnp.asarray(first)),
                iters=args.iters)
            print(f"segred TILE={TILE} OB={OB} m={t_total*TILE}: {sec*1e3:7.3f} ms "
                  f"= {t_total*TILE/sec/1e6:6.1f} M slots/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())

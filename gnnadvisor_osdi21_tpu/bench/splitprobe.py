"""Probe: do H independent residual gather chains beat one?

Each XLA gather op carries a ~1 ms fixed launch/ramp cost but INDEPENDENT
gathers overlap (measured: 5 concurrent gathers amortize to ~0.7 ms each,
DESIGN.md §7).  The residual tier's two-stage chain is serially dependent,
but both stages partition cleanly by output-block range: H independent
(stage1_h -> stage2_h) chains could overlap each other's fixed costs.

This measures the full hybrid sag with the residual gathers split H ways
(host-side index split, device-side concat) vs the stock pipeline, on the
headline graph.  If it wins, the split becomes a layout option.

Usage: python -m gnnadvisor_osdi21_tpu.bench.splitprobe  (on the TPU)

RESULT (2026-08-19, v5e): the hypothesis is FALSE in context — stock
2.64 ms vs 3.42 ms (2-way) / 2.65 ms (4-way).  XLA does not overlap the
dependent stage1->stage2 chains against each other the way isolated
concurrent gathers overlap, and the duplicated stage-1 rows (+28-59%)
eat the rest.  Kept as the measurement record; the stock two-stage
residual stands.
"""

from __future__ import annotations

import sys


def main(argv=None) -> int:
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.bench.datasets import bench_graph
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

    g = rabbit_reorder_graph(bench_graph(16))
    hg = build_hybrid(g)
    ht = build_hybrid_tensors(hg, transposed=True, agg_dtype="bfloat16")
    x = jnp.ones((16, hg.num_rows), jnp.float32)
    sec = chained_device_time(lambda a, h: sag(a, h), x, ht, iters=50)
    print(f"stock pipeline: {sec*1e3:7.3f} ms", flush=True)

    # host-side H-way split of the residual stream by slot range (tiles
    # stay grouped per block, so any tile-aligned cut point is valid)
    res_gather = np.asarray(hg.res_gather)
    res_dst = np.asarray(hg.res_dst)
    t2b = np.asarray(hg.res_t2b)
    s = hg.res_tile

    for n_split in (2, 4):
        cuts = [
            (len(t2b) * i // n_split) for i in range(n_split + 1)
        ]
        parts = []
        for i in range(n_split):
            lo_t, hi_t = cuts[i], cuts[i + 1]
            dst_h = res_dst[lo_t * s: hi_t * s]
            # compact the half's own unique stage-1 set
            uniq_h, dst_c = np.unique(res_gather[dst_h], return_inverse=True)
            parts.append((
                jnp.asarray(uniq_h.astype(np.int32)),
                jnp.asarray(dst_c.astype(np.int32)),
            ))
        total_stage1 = sum(len(p[0]) for p in parts)

        def split_residual(a, h):
            a = a.astype(h.agg_dtype)
            rows = []
            for uniq_h, dst_c in parts:
                compact = jnp.take(a, uniq_h, axis=1)
                rows.append(jnp.take(compact, dst_c, axis=1))
            rows_t = jnp.concatenate(rows, axis=1)
            return spmm_pallas.residual_combine_t(
                rows_t, h.res_mask_s, h.res_t2b, h.num_rows, h.res_ob,
            )

        def split_sag(a, h):
            at = a.astype(h.agg_dtype)
            if h.diag_b and h.hot_k:
                x_hot = jnp.take(at, h.hot_ids, axis=1)
                out = spmm_pallas.fused_slab_matmul_t(
                    h.diag_bits, h.hot_bits, at, x_hot, h.diag_b,
                    block_cols=h.block_rows, feature_tile=h.feature_tile,
                )
            elif h.diag_b:
                out = spmm_pallas.slab_matmul_t(
                    h.diag_bits, at, table_block_cols=h.diag_b,
                    block_cols=min(h.block_rows, h.diag_b),
                    feature_tile=h.feature_tile,
                )
            elif h.hot_k:
                x_hot = jnp.take(at, h.hot_ids, axis=1)
                out = spmm_pallas.slab_matmul_t(
                    h.hot_bits, x_hot, block_cols=h.block_rows,
                    feature_tile=h.feature_tile,
                )
            else:
                out = None
            r = split_residual(a, h)
            return r if out is None else out + r

        sec = chained_device_time(split_sag, x, ht, iters=50)
        print(
            f"{n_split}-way split residual: {sec*1e3:7.3f} ms "
            f"(stage1 rows {len(hg.res_gather)} -> {total_stage1}, "
            f"+{total_stage1 - len(hg.res_gather)} duplicated)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

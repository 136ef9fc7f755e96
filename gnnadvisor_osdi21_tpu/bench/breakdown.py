"""Component-level breakdown of the hybrid SpMM on real hardware.

Times each tier of the tuned aggregation separately (diagonal slab, hot
slab, residual gather+combine, full pipeline) with roofline context, and
prints host-side censuses (tier edge shares, coverage curves, diagonal
locality) next to the measured times — the data that drives the kernel
cost model in ``graphs/hybrid.py``.

Usage: python -m gnnadvisor_osdi21_tpu.bench.breakdown [--only X] [--tiers ...]
(run on the TPU; one process at a time — see utils/timing.py).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="",
                   help="graph .npz path (default: the shared bench graph)")
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--only", default="",
                   help="comma list: census,hybrid,diag,hot,res,tiers,geom")
    p.add_argument("--hotk", type=int, default=-1, help="force hot_k (-1=auto)")
    p.add_argument("--diagb", type=int, default=-1, help="force diag_b (-1=auto)")
    p.add_argument("--agg_dtype", default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="tier compute dtype (the tuned default is bfloat16)")
    p.add_argument("--rowmajor", action="store_true",
                   help="use the legacy row-major layout (default: the v3"
                        " transposed pipeline; per-tier --only diag/hot/res"
                        " isolation always runs row-major)")
    p.add_argument("--tiers", default="0:0,512:0,0:4096,2048:2048,4096:4096",
                   help="diag_b:hot_k sweep list for --only tiers")
    args = p.parse_args(argv)
    only = set(args.only.split(",")) if args.only else None

    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.graphs.loader import load_graph
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import (
        build_hybrid_tensors, _diag_aggregate, _hot_aggregate,
        _residual_aggregate,
    )
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time
    from gnnadvisor_osdi21_tpu.utils.profiling import spmm_roofline

    def want(name):
        return only is None or name in only

    dim = args.dim
    if args.graph:
        graph = load_graph(args.graph, num_features=dim)
    else:
        from gnnadvisor_osdi21_tpu.bench.datasets import bench_graph

        graph = bench_graph(dim)
    graph = rabbit_reorder_graph(graph)
    n, e = graph.num_nodes, graph.nnz
    print(f"graph: N={n} nnz={e} dim={dim} (after rabbit)")

    # ---------------- host-side censuses --------------------------------
    if want("census"):
        counts = np.bincount(graph.column_index, minlength=n)
        csum = np.cumsum(np.sort(counts)[::-1])
        for k in (512, 1024, 2048, 4096, 8192, 16384):
            if k <= n:
                print(f"  hot coverage K={k:6d}: {csum[k-1]/e:.3f}")
        src = np.repeat(np.arange(n, dtype=np.int64), np.diff(graph.row_pointers))
        cd = graph.column_index.astype(np.int64)
        for B in (512, 1024, 2048, 4096):
            cov = np.mean(src // B == cd // B)
            print(f"  diag cov B={B:5d} (rabbit order): {cov:.3f}")

    hot_k = None if args.hotk < 0 else args.hotk
    diag_b = None if args.diagb < 0 else args.diagb
    transposed = not args.rowmajor
    hg = build_hybrid(graph, hot_k=hot_k, diag_b=diag_b)
    ht = build_hybrid_tensors(hg, agg_dtype=args.agg_dtype,
                              transposed=transposed)
    # the per-tier isolation helpers are row-major internals; only pay the
    # second device copy of the layout when one of them is requested
    ht_rm = ht
    if transposed and (want("diag") or want("hot") or want("res")):
        ht_rm = build_hybrid_tensors(hg, agg_dtype=args.agg_dtype)
    r = hg.num_rows
    print(f"layout: rows={r} diag_b={hg.diag_b} hot_k={hg.hot_k} | "
          f"edges diag={hg.num_diag_edges} hot={hg.num_hot_edges} "
          f"res={hg.num_res_edges} (pairs={hg.num_res_pairs} "
          f"slots={hg.num_res_slots})")

    x = jnp.ones((dim, r) if transposed else (r, dim), dtype=jnp.float32)
    x_rm = jnp.ones((r, dim), dtype=jnp.float32)

    def report(name, sec):
        rl = spmm_roofline(sec, e, dim, n)
        print(f"{name:34s} {sec*1e3:8.3f} ms | {rl.achieved_gbs:6.0f} GB/s-eff "
              f"| {rl.hbm_fraction*100:5.1f}% of HBM floor | "
              f"{e/sec/1e9:.2f} Gedge/s")

    if want("hybrid"):
        report("hybrid total (sag)", chained_device_time(
            lambda a, h: sag(a, h), x, ht, iters=args.iters))
    if want("diag") and hg.diag_b:
        report("diag slab only (rowmajor)", chained_device_time(
            lambda a, h: _diag_aggregate(a, h), x_rm, ht_rm, iters=args.iters))
    if want("hot") and hg.hot_k:
        report("hot slab only (rowmajor)", chained_device_time(
            lambda a, h: _hot_aggregate(a, h), x_rm, ht_rm, iters=args.iters))
    if want("res") and hg.num_res_slots:
        report("residual only (rowmajor)", chained_device_time(
            lambda a, h: _residual_aggregate(a, h), x_rm, ht_rm, iters=args.iters))
    if want("rest") and hg.num_res_slots and transposed:
        # transposed residual tier in isolation (gathers + fused combine)
        from gnnadvisor_osdi21_tpu.ops.hybrid_agg import _tiers_transposed
        import dataclasses as _dc

        ht_res = _dc.replace(ht, diag_b=0, hot_k=0, diag_bits=None,
                             hot_bits=None, hot_ids=None)
        report("residual only (transposed)", chained_device_time(
            lambda a, h: _tiers_transposed(a.astype(h.agg_dtype), h),
            x, ht_res, iters=args.iters))
    if want("slabt") and hg.diag_b and hg.hot_k and transposed:
        from gnnadvisor_osdi21_tpu.ops import spmm_pallas

        def slab_only(a, h):
            xh = jnp.take(a, h.hot_ids, axis=1).astype(h.agg_dtype)
            return spmm_pallas.fused_slab_matmul_t(
                h.diag_bits, h.hot_bits, a.astype(h.agg_dtype), xh, h.diag_b,
                block_cols=h.block_rows, feature_tile=h.feature_tile)
        report("fused slab only (transposed)", chained_device_time(
            slab_only, x, ht, iters=args.iters))

    # ---------------- (diag_b, hot_k) sweep on the full pipeline --------
    if want("tiers"):
        for spec in args.tiers.split(","):
            b, k = (int(v) for v in spec.split(":"))
            hgc = build_hybrid(graph, hot_k=k, diag_b=b)
            htc = build_hybrid_tensors(hgc, agg_dtype=args.agg_dtype,
                                       transposed=transposed)
            xc = jnp.ones(
                (dim, hgc.num_rows) if transposed else (hgc.num_rows, dim),
                dtype=jnp.float32)
            sec = chained_device_time(lambda a, h: sag(a, h), xc, htc,
                                      iters=args.iters)
            print(f"diag_b={b:5d} hot_k={k:5d} res={hgc.num_res_edges:8d} "
                  f"-> {sec*1e3:8.3f} ms")

    # ---------------- kernel geometry sweep -----------------------------
    if want("geom"):
        from gnnadvisor_osdi21_tpu.ops.hybrid_agg import with_geometry

        for br in (128, 256, 512):
            htg = with_geometry(ht, br, 128)
            sec = chained_device_time(lambda a, h: sag(a, h), x, htg,
                                      iters=args.iters)
            print(f"block_rows={br:4d} -> {sec*1e3:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Component-level breakdown of the hybrid SpMM on real hardware.

Times each piece of the tuned aggregation separately (hot slab, cold
gathers, full pipeline) plus candidate kernel variants (dense int8/bf16
slabs vs the bit-packed slab, pack-width sweep), and prints host-side
censuses (gather row counts, dedup factors) next to the measured times —
the data that drives the kernel cost models in ``graphs/hybrid.py``.

Usage: python -m gnnadvisor_osdi21_tpu.bench.breakdown [--quick] [--only X]
(run on the TPU; one process at a time — see utils/timing.py).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", default="data/bench_web_410k.npz")
    p.add_argument("--dim", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--only", default="", help="comma list: census,hybrid,hot,cold,slabs,packc")
    p.add_argument("--packs", default="8,12,16,24,32", help="pack_c sweep values")
    p.add_argument("--hotk", type=int, default=0, help="force hot_k (0=auto)")
    args = p.parse_args(argv)
    only = set(args.only.split(",")) if args.only else None

    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.graphs.loader import load_graph
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid, choose_hot_k
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import (
        build_hybrid_tensors, _cold_aggregate, _hot_aggregate,
    )
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time
    from gnnadvisor_osdi21_tpu.utils.profiling import spmm_roofline

    def want(name):
        return only is None or name in only

    dim = args.dim
    graph = load_graph(args.graph, num_features=dim)
    graph = rabbit_reorder_graph(graph)
    n, e = graph.num_nodes, graph.nnz
    print(f"graph: N={n} nnz={e} dim={dim} (after rabbit)")

    # ---------------- host-side censuses --------------------------------
    counts = np.bincount(graph.column_index, minlength=n)
    order = np.argsort(counts)[::-1]
    csum = np.cumsum(counts[order])
    if want("census"):
        for k in (512, 1024, 2048, 4096, 8192, 16384, 32768):
            if k <= n:
                print(f"  coverage K={k:6d}: {csum[k-1]/e:.3f}")
        # cold gather-row census per pack width (node mode): rows =
        # #unique (src, dst_pack) pairs among edges NOT covered by hot_k
        k0 = args.hotk or choose_hot_k(graph.column_index, n, e)
        hot = np.zeros(n, dtype=bool)
        if k0:
            hot[order[:k0]] = True
        src = np.repeat(np.arange(n, dtype=np.int64), np.diff(graph.row_pointers))
        sel = ~hot[graph.column_index]
        cs, cd = src[sel], graph.column_index[sel].astype(np.int64)
        print(f"  chosen hot_k={k0}, cold edges={sel.sum()}")
        for c in [1, 2, 4, 8, 12, 16, 24, 32]:
            rows = len(np.unique(cs * ((n // c) + 1) + cd // c))
            print(f"  pack_c={c:2d}: cold rows={rows:9d} dedup={sel.sum()/rows:.2f} "
                  f"row_bytes={c*dim*4}")
        # fraction of rows with >=1 hot edge (row-restricted-slab viability)
        has_hot = np.zeros(n, dtype=bool)
        np.logical_or.at(has_hot, src[~sel], True)
        print(f"  rows with >=1 hot edge: {has_hot.mean():.3f}")
        # diagonal-block coverage of cold edges: (a) raw rabbit order,
        # (b) emulated (coarse-width-class, community-chunk) stable sort —
        # the candidate layout key that keeps communities contiguous inside
        # each width class so a block-diagonal dense slab can eat them.
        deg_cold = np.bincount(cs, minlength=n)
        for B in (1024, 2048, 4096):
            cov = np.mean(cs // B == cd // B)
            print(f"  diag cov B={B:5d} (rabbit order): {cov:.3f}")
        wc = np.clip(np.ceil(np.log2(np.maximum(deg_cold, 1)) / 2), 0, 8)  # pow-4
        for Bc in (1024, 2048):
            key = wc * (n // Bc + 2) + np.arange(n) // Bc
            order2 = np.argsort(key, kind="stable")
            pos = np.empty(n, dtype=np.int64)
            pos[order2] = np.arange(n)
            for B in (1024, 2048, 4096):
                cov = np.mean(pos[cs] // B == pos[cd] // B)
                print(f"  diag cov B={B:5d} (pow4-class, comm={Bc}): {cov:.3f}")

    hg = build_hybrid(graph, feature_dim=dim, coarse_buckets=False,
                      hot_k=args.hotk or None)
    ht = build_hybrid_tensors(hg)
    r = hg.num_rows
    print(f"layout: rows={r} pack_c={hg.pack_c} mode={hg.cold_mode} "
          f"hot_k={hg.hot_k} hot_e={hg.num_hot_edges} cold_e={hg.num_cold_edges} "
          f"cold_rows={hg.cold_gather_rows}")

    x = jnp.ones((r, dim), dtype=jnp.float32)

    def report(name, sec):
        rl = spmm_roofline(sec, e, dim, n)
        print(f"{name:34s} {sec*1e3:8.3f} ms | {rl.achieved_gbs:6.0f} GB/s-eff "
              f"| {rl.hbm_fraction*100:5.1f}% of HBM floor | "
              f"{e/sec/1e9:.2f} Gedge/s")

    if want("hybrid"):
        report("hybrid total (sag)", chained_device_time(
            lambda a, h: sag(a, h), x, ht, iters=args.iters))
    if want("hot") and hg.hot_k:
        report("hot bit-slab only", chained_device_time(
            lambda a, h: _hot_aggregate(a, h), x, ht, iters=args.iters))
    if want("cold"):
        report("cold packed-gather only", chained_device_time(
            lambda a, h: _cold_aggregate(a, h), x, ht, iters=args.iters))

    # ---------------- dense slab variants (hot-path candidates) ---------
    if want("slabs"):
        from gnnadvisor_osdi21_tpu.ops.spmm_pallas import unpack_slab

        for k in (1024, 4096):
            if not hg.hot_k or k > hg.hot_k:
                # rebuild a slab at this K from scratch
                hot_old = order[:k]
                hot_col = np.empty(n, dtype=np.int64)
                hot_col[hot_old] = np.arange(k)
                rp = np.asarray(graph.row_pointers, np.int64)
                srcs = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))
                ish = np.zeros(n, dtype=bool)
                ish[hot_old] = True
                selh = ish[graph.column_index]
                rows_h = hg.pad_pos[hg.perm][srcs[selh]]
                cols_h = hot_col[graph.column_index[selh]]
                a_dense = np.zeros((r, k), dtype=np.int8)
                a_dense[rows_h, cols_h] = 1
            else:
                a_dense = unpack_slab(hg.hot_bits, hg.hot_k)[:, :k].astype(np.int8)
            covered = int(csum[k - 1])
            xh = jnp.ones((k, dim), dtype=jnp.bfloat16)
            for dt, name in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16")):
                a_dev = jnp.asarray(a_dense, dtype=dt)

                def slab_mm(xv, aux):
                    a_, xh_ = aux
                    return jnp.matmul(
                        a_.astype(jnp.bfloat16), xh_ + xv[0, 0].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)

                sec = chained_device_time(slab_mm, x, (a_dev, xh), iters=args.iters)
                print(f"dense {name} slab K={k:5d}: {sec*1e3:8.3f} ms "
                      f"({sec/covered*1e9:.2f} ns/covered-edge, covers {covered/e:.2f})")

    # ---------------- pack_c sweep on the full pipeline -----------------
    if want("packc"):
        for c in [int(v) for v in args.packs.split(",")]:
            if c > 32:
                continue
            hgc = build_hybrid(graph, pack_c=c, feature_dim=dim,
                               coarse_buckets=False, hot_k=args.hotk or None)
            htc = build_hybrid_tensors(hgc)
            xc = jnp.ones((hgc.num_rows, dim), dtype=jnp.float32)
            sec = chained_device_time(lambda a, h: sag(a, h), xc, htc,
                                      iters=args.iters)
            print(f"pack_c={c:2d} mode={hgc.cold_mode} rows={hgc.cold_gather_rows:9d} "
                  f"-> {sec*1e3:8.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())

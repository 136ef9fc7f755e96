"""Single-chip scale demonstration at ogbn-products size.

BASELINE.md's scaling target names ogbn-products-scale graphs (2.45M
nodes / ~124M directed edges).  This tool synthesizes a web-structured
graph at that scale, builds the tuned hybrid layout (sampled tier census,
adaptive residual geometry), and runs the transposed SpMM + one full GCN
train step on the real chip — evidence that the single-chip layout and
kernels hold far beyond the 15-dataset roster.

Usage: python -m gnnadvisor_osdi21_tpu.tools.ogb_scale_demo
           [--nodes N] [--edges E] [--dim D] [--skip_reorder]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=2_449_029)
    p.add_argument("--edges", type=int, default=61_859_140,
                   help="default: ogbn-products' undirected edge count "
                        "(the loader dedups; 2x when counting directions)")
    p.add_argument("--dim", type=int, default=100)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--classes", type=int, default=47)
    p.add_argument("--skip_reorder", action="store_true")
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--shard_devices", default="",
                   help="comma list (e.g. 16,64): also build the sharded "
                        "layout at these device counts and report the "
                        "plan-build time + ragged-vs-dense exchange rows")
    args = p.parse_args(argv)

    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.train import train_and_time
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

    t0 = time.perf_counter()
    g = synthesize_graph(args.nodes, args.edges, num_features=args.dim,
                         num_classes=args.classes, kind="web", seed=0)
    print(f"synthesize: {time.perf_counter()-t0:.1f}s "
          f"(N={g.num_nodes:,} nnz={g.nnz:,})", flush=True)

    if not args.skip_reorder:
        t0 = time.perf_counter()
        g = rabbit_reorder_graph(g)
        print(f"rabbit reorder: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    hg = build_hybrid(g)
    print(
        f"hybrid build: {time.perf_counter()-t0:.1f}s | "
        f"diag_b={hg.diag_b} hot_k={hg.hot_k} res_ob={hg.res_ob} "
        f"res_tile={hg.res_tile} | edges diag={hg.num_diag_edges:,} "
        f"hot={hg.num_hot_edges:,} res={hg.num_res_edges:,} "
        f"(pairs={hg.num_res_pairs:,} slots={hg.num_res_slots:,})",
        flush=True,
    )
    # sharded-plan scaling: build the multi-chip layout at pod-ish device
    # counts and report the exchange economics (the ragged plan ships
    # Σ halo_sizes rows vs the uniform-Hmax plan's ndev·Hmax — round-3
    # review item 4: skewed pairs after rabbit make the dense plan balloon)
    for nd in [int(v) for v in args.shard_devices.split(",") if v]:
        from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import (
            shard_graph_hybrid,
        )

        t0 = time.perf_counter()
        sg = shard_graph_hybrid(g, num_devices=nd)
        dense = sg.dense_exchange_rows
        ragged = sg.ragged_exchange_rows
        print(
            f"shard plan nd={nd}: build {time.perf_counter()-t0:.1f}s | "
            f"Hmax={sg.halo} dense all_to_all rows/dev={dense:,} "
            f"ragged rows/dev={ragged:,} "
            f"({dense / max(ragged, 1):.1f}x fewer bytes on the wire) | "
            f"plan bytes/dev tpu={sg.plan_bytes('tpu'):,} "
            f"cpu-mesh={sg.plan_bytes('cpu'):,}",
            flush=True,
        )

    ht = build_hybrid_tensors(hg, transposed=True, agg_dtype="bfloat16")

    # single SpMM at dim 16 (the kernel-bench protocol shape)
    x16 = jnp.ones((16, hg.num_rows), jnp.float32)
    sec = chained_device_time(lambda a, h: sag(a, h), x16, ht, iters=20)
    print(
        f"SpMM dim=16: {sec*1e3:.3f} ms "
        f"({g.nnz/sec/1e9:.2f} Gedge/s)",
        flush=True,
    )

    # a few full GCN train epochs at the real feature dim
    # (train_and_time transposes x itself when the tensors are transposed).
    # The epoch tensors carry the layers' true aggregate widths so the
    # residual gather formulation follows the epoch-context rule
    # (hybrid_agg agg_feature_dim / RES_SINGLE_MAX_CELLS) — at this slot
    # count the wide-dim layers run two-stage.
    ht_in = build_hybrid_tensors(
        hg, transposed=True, agg_dtype="bfloat16",
        agg_feature_dim=args.hidden,
    )
    ht_hid = build_hybrid_tensors(
        hg, transposed=True, agg_dtype="bfloat16",
        agg_feature_dim=args.classes,
    )
    x = jnp.asarray(hg.pad_array(g.init_embedding(args.dim, seed=0)))
    y = jnp.asarray(hg.pad_array(g.init_labels(args.classes)))
    mask = jnp.asarray(hg.row_mask)
    r = train_and_time(
        "gcn", (ht_in, ht_hid), x, y, hidden=args.hidden,
        num_classes=args.classes, num_epochs=args.epochs, dry_run=2,
        mask=mask,
    )
    print(
        f"GCN dim={args.dim} h={args.hidden}: {r['epoch_ms']:.1f} ms/epoch "
        f"({g.nnz * 2 / r['epoch_ms'] * 1e3 / 1e9:.2f} Gedge/s fwd+bwd), "
        f"loss={r['final_loss']:.4f}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

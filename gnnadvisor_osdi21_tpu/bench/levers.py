"""Headline-kernel lever sweep: measure every remaining tuning knob on the
amazon0505-scale bench graph (same protocol as bench.py) so the cost-model
constants and defaults stay evidence-backed.

Levers swept (VERDICT r1 item 1.iii):
- tier geometry: (diag_b, hot_k) grid incl. >4096 second-tier candidates
- kernel geometry: block_rows (warpPerBlock analog), beyond the 512 default
- compute dtype: float32 vs bfloat16 slab/residual dots
- residual tiling: res_tile x res_ob

Usage: python -m gnnadvisor_osdi21_tpu.bench.levers [--quick]
Prints one line per config: config, ms, Gedge/s; then the best config.
"""

from __future__ import annotations

import itertools
import sys


def _bench_graph(dim: int = 16):
    from gnnadvisor_osdi21_tpu.bench.datasets import bench_graph
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph

    return rabbit_reorder_graph(bench_graph(dim))


def main(argv=None) -> int:
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid, choose_tiers
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors
    from gnnadvisor_osdi21_tpu.utils.timing import chained_device_time

    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv
    base_dtype = (
        argv[argv.index("--dtype") + 1] if "--dtype" in argv else "float32"
    )
    dim = 16
    graph = _bench_graph(dim)
    import numpy as np

    src = np.repeat(
        np.arange(graph.num_nodes, dtype=np.int64),
        np.diff(np.asarray(graph.row_pointers, dtype=np.int64)),
    )
    auto_b, auto_k = choose_tiers(
        src, np.asarray(graph.column_index, dtype=np.int64), graph.num_nodes
    )
    print(f"# cost-model choice: diag_b={auto_b} hot_k={auto_k}", flush=True)

    def run(tag, hg, block_rows=512, feature_tile=128, agg_dtype=None):
        agg_dtype = agg_dtype or base_dtype
        ht = build_hybrid_tensors(
            hg, block_rows=block_rows, feature_tile=feature_tile,
            agg_dtype=agg_dtype,
        )
        xx = jnp.ones((hg.num_rows, dim), jnp.float32)
        try:
            sec = chained_device_time(
                lambda a, h: sag(a, h), xx, ht, iters=20 if quick else 50, reps=3
            )
        except Exception as e:  # e.g. Mosaic VMEM overflow on big geometry
            print(f"{tag:58s} FAILED: {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return float("inf"), tag
        ms = sec * 1e3
        print(
            f"{tag:58s} {ms:8.3f} ms  {graph.nnz / sec / 1e9:6.2f} Gedge/s",
            flush=True,
        )
        return ms, tag

    results = []

    # 1) tier grid around the auto choice (8192 slabs exceed VMEM at
    # practical block_rows — measured Mosaic compile failures — so the
    # grid tops out at 4096)
    b_grid = sorted({auto_b, 512, 1024, 2048, 4096} - {0})
    k_grid = sorted({auto_k, 512, 1024, 2048, 4096} - {0})
    if quick:
        b_grid, k_grid = [auto_b or 2048], sorted({auto_k or 4096, 8192})
    layouts = {}
    for b, k in itertools.product(b_grid, k_grid):
        hg = layouts.setdefault((b, k), build_hybrid(graph, hot_k=k, diag_b=b))
        results.append(run(f"tiers diag_b={b} hot_k={k}", hg))

    # best tier layout feeds the remaining sweeps
    hg = layouts[
        min(
            (m, bk) for (m, t), bk in zip(results, itertools.product(b_grid, k_grid))
        )[1]
    ]

    # 2) block_rows (the VMEM-budget geometry knob)
    for br in (256, 512, 1024, 2048):
        if br > hg.diag_b:
            continue
        results.append(run(f"block_rows={br}", hg, block_rows=br))

    # 3) compute dtype
    other = "float32" if base_dtype == "bfloat16" else "bfloat16"
    results.append(run(f"agg_dtype={other}", hg, agg_dtype=other))

    # 4) residual tiling
    if not quick:
        for rt, ob in ((128, 256), (256, 256), (512, 256), (256, 512)):
            hg2 = build_hybrid(
                graph, hot_k=hg.hot_k, diag_b=hg.diag_b,
                res_tile=rt, res_ob=ob,
            )
            results.append(run(f"res_tile={rt} res_ob={ob}", hg2))

    best = min(results)
    print(f"# BEST: {best[1]} @ {best[0]:.3f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

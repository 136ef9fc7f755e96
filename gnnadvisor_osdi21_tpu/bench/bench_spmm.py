"""Single-SpMM kernel bench on Type III graphs at dim=16
(reference 3_single_spmm_bench.py + 0_bench_Gunrock.py protocol: 200
rounds, feature-len 16).

Benchmarks both the tuned hybrid kernel and the naive COO segment-sum —
the latter playing the Gunrock-SpMM baseline role (SURVEY.md §2.1 #22) —
and prints speedups plus the committed Gunrock/RTX3090 numbers for
context (Gunrock/bench_gunrock.csv).

Usage: python -m gnnadvisor_osdi21_tpu.bench.bench_spmm [--quick]
"""

from __future__ import annotations

import sys

GUNROCK_MS = {  # committed artifact numbers (bench_gunrock.csv:2-6, RTX3090)
    "amazon0505": 4.065,
    "artist": 0.638,
    "com-amazon": 4.020,
    "soc-BlogCatalog": 1.051,
    "amazon0601": 3.028,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    quick = "--quick" in argv
    dim = 16

    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from gnnadvisor_osdi21_tpu.bench.datasets import TYPE_III, get_dataset
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors
    from gnnadvisor_osdi21_tpu.utils.timing import chained_marginal_time

    roster = TYPE_III[:1] if quick else TYPE_III
    # reference protocol: 200 rounds (unitest.py:65-80); marginal cost per
    # round via the two-point fit (removes the tunnel's ~25 ms dispatch)
    iters = 20 if quick else 200
    print("dataset,hybrid_ms,naive_coo_ms,speedup,gunrock_rtx3090_ms")
    for name in roster:
        g = rabbit_reorder_graph(get_dataset(name, dim=dim))
        hg = build_hybrid(g)
        # the tuned defaults: transposed (v3) layout + bf16 tier dots
        ht = build_hybrid_tensors(hg, transposed=True, agg_dtype="bfloat16")
        x = jnp.ones((dim, hg.num_rows), dtype=jnp.float32)
        t_h = chained_marginal_time(
            lambda a, h: sag(a, h), x, ht, iters=iters
        )[0] * 1e3

        gt_coo = build_graph_tensors(g, method="coo")
        xn = jnp.ones((g.num_nodes, dim), dtype=jnp.float32)
        # the naive-COO arm is 100-300 ms/round: fewer rounds, same fit
        t_n = chained_marginal_time(
            lambda a, h: sag(a, h), xn, gt_coo, iters=max(iters // 40, 5)
        )[0] * 1e3

        gr = GUNROCK_MS.get(name, float("nan"))
        print(f"{name},{t_h:.3f},{t_n:.3f},{t_n / t_h:.2f},{gr}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

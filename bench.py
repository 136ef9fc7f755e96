"""Headline benchmark: single-chip SpMM (neighbor aggregation) on an
amazon0505-scale graph at feature dim 16.

Protocol mirrors the reference's SpMM bench (unitest.py:65-80 /
3_single_spmm_bench.py / 0_bench_Gunrock.py): 10 warmups + 200 timed
rounds of the pure aggregation kernel, input features all-ones, dim=16.
Baseline: Gunrock SpMM on amazon0505 = 4.065 ms on the artifact's RTX3090
(Gunrock/bench_gunrock.csv:2) — ``vs_baseline`` is the speedup over that.

Prints ONE JSON line.
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu import synthesize_graph, InputProperty
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag

    # amazon0505 scale: 410,236 nodes / 4,878,874 edges (bench_gunrock.csv:2).
    num_nodes, num_edges, dim = 410_236, 4_878_874, 16
    graph = synthesize_graph(
        num_nodes, num_edges, num_features=dim, kind="powerlaw", seed=0
    )
    prop = InputProperty(graph, hidden_dim=dim).decider()
    gt_in, _ = prop.build_tensors()

    x = jnp.ones((graph.num_nodes, dim), dtype=jnp.float32)
    spmm = jax.jit(lambda x_: sag(x_, gt_in))

    for _ in range(10):
        out = spmm(x)
    jax.block_until_ready(out)

    rounds = 200
    start = time.perf_counter()
    for _ in range(rounds):
        out = spmm(x)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - start) * 1e3 / rounds

    gunrock_amazon0505_ms = 4.065
    print(
        json.dumps(
            {
                "metric": "spmm_amazon0505_scale_dim16_ms",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(gunrock_amazon0505_ms / ms, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

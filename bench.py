"""Headline benchmark: single-chip SpMM (neighbor aggregation) through the
full tuned pipeline on an amazon0505-scale graph at feature dim 16.

Pipeline: rabbit community reordering (native C++) → input-adaptive hybrid
layout (diagonal + hot bit-slabs + residual one-hot combine, cost-model
chosen tiers) → 200 chained kernel executions on device (serial data
dependency; marginal per-round cost via a two-point fit that removes this
dev platform's ~25 ms fixed dispatch tunnel cost — see utils/timing.py).

Protocol mirrors the reference's SpMM bench (unitest.py:65-80,
3_single_spmm_bench.py, 0_bench_Gunrock.py): all-ones features, dim=16,
amazon0505 scale (410,236 nodes / 4,878,874 edges).  Baseline: Gunrock
SpMM on amazon0505 = 4.065 ms on the artifact's RTX3090
(Gunrock/bench_gunrock.csv:2); ``vs_baseline`` is the speedup over that
(values < 1 mean the GPU baseline is still faster).

Prints ONE JSON line.
"""

import json
import os
import signal
import sys
import time


def _quiesce_campaign(max_wait_s: float = 900.0) -> None:
    """If a measurement campaign is running (bench/campaign.py), stop it and
    wait for its in-flight config to drain so the headline bench has the
    TPU to itself.  Kills only the exact PID recorded in campaign.pid; the
    already-running child config is left to finish (its log stays valid for
    the campaign's resume logic)."""
    try:
        with open(os.path.join(os.path.dirname(__file__), "campaign.pid")) as fp:
            pid = int(fp.read().split(":")[-1].strip())
    except (OSError, ValueError):
        return
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as fp:
            cmdline = fp.read().replace(b"\0", b" ").decode()
    except OSError:
        return  # stale pidfile: campaign already gone
    if "campaign" not in cmdline:
        return  # PID was recycled by an unrelated process
    try:
        os.kill(pid, signal.SIGTERM)
        print(f"bench: stopped campaign driver pid {pid}", file=sys.stderr)
    except ProcessLookupError:
        pass
    deadline = time.time() + max_wait_s
    while time.time() < deadline:
        # scan /proc cmdlines directly (ps may be absent, and os.popen hides
        # failures as empty output, which would end the drain early)
        busy = False
        for ent in os.listdir("/proc"):
            if not ent.isdigit():
                continue
            try:
                with open(f"/proc/{ent}/cmdline", "rb") as fp:
                    cmd = fp.read().replace(b"\0", b" ").decode(
                        errors="replace"
                    )
            except OSError:
                continue  # process exited mid-scan
            # matches the campaign's CLI children AND the baseline
            # campaign's `-m gnnadvisor_osdi21_tpu.baselines.*` runs —
            # anything under the package may hold the chip
            if "-m gnnadvisor_osdi21_tpu" in cmd:
                busy = True
                break
        if not busy:
            return
        time.sleep(10.0)


def main():
    _quiesce_campaign()
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.bench.datasets import bench_graph
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.ops.aggregate import sag
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors
    from gnnadvisor_osdi21_tpu.utils.timing import chained_marginal_time

    dim = 16
    graph = rabbit_reorder_graph(bench_graph(dim))
    hg = build_hybrid(graph)
    # v3 tuned defaults: transposed feature layout ([dim, rows] — exact-byte
    # streams, no 128-lane padding) + bf16 tier contractions with f32
    # accumulation — exact on this all-ones protocol (0/1 adjacency x 1.0)
    ht = build_hybrid_tensors(hg, agg_dtype="bfloat16", transposed=True)

    # Marginal per-SpMM cost over a 200-round chained loop (the reference's
    # own round count, unitest.py:65-80) with the tunnel's ~25 ms fixed
    # dispatch removed by a two-point fit — see chained_marginal_time.
    x = jnp.ones((dim, hg.num_rows), dtype=jnp.float32)
    sec, fixed_s = chained_marginal_time(
        lambda a, h: sag(a, h), x, ht, iters=200, reps=3
    )
    ms = sec * 1e3

    from gnnadvisor_osdi21_tpu.utils.profiling import spmm_roofline

    rl = spmm_roofline(sec, graph.nnz, dim, graph.num_nodes)

    # Independently measured gather ceiling: the best any per-edge-gather
    # formulation (the GPU kernel shape) can do on this chip is one row
    # gather per edge — measure it directly so the headline is auditable
    # against the platform, not just against our own cost model
    # (VERDICT r2 item 5).
    import numpy as np

    from gnnadvisor_osdi21_tpu.graphs.hybrid import model_pipeline_ns

    ceil_ids = jnp.asarray(np.asarray(graph.column_index, dtype=np.int32))
    x_small = jnp.ones((dim, hg.num_rows), jnp.bfloat16)
    ceil_sec, _ = chained_marginal_time(
        lambda a, i: jnp.take(a, i, axis=1) + jnp.bfloat16(0),
        x_small, ceil_ids, iters=5, reps=2,
    )
    modeled = model_pipeline_ns(hg)
    gunrock_amazon0505_ms = 4.065
    print(
        json.dumps(
            {
                "metric": "spmm_amazon0505_scale_dim16_ms",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(gunrock_amazon0505_ms / ms, 4),
                "edges_per_s": round(graph.nnz / sec / 1e9, 3),
                "edges_per_s_unit": "Gedge/s",
                # fixed per-dispatch cost of this tunneled dev platform,
                # removed from `value` by the two-point fit (it is not chip
                # time; single-point measurement at N rounds adds fixed/N
                # per round — rounds r1-r3 carried ~0.5 ms of it)
                "dispatch_fixed_ms": round(fixed_s * 1e3, 2),
                "hbm_floor_fraction": round(rl.hbm_fraction, 4),
                # measured E-row-gather floor for a per-edge formulation:
                # what the naive/GPU kernel shape costs on THIS chip
                "gather_ceiling_ms": round(ceil_sec * 1e3, 3),
                "vs_gather_ceiling": round(ceil_sec * 1e3 / ms, 2),
                # cost-model audit: modeled pipeline time / measured
                # (≈1 when the kernels achieve what the model says is
                # achievable at the chosen tiers)
                "modeled_ms": round(modeled["total_ns"] / 1e6, 3),
                "fraction_of_achievable": round(
                    modeled["total_ns"] / 1e6 / ms, 3
                ),
                "graph": "synthetic web topology at amazon0505 scale "
                         "(real .npz not shippable here)",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())

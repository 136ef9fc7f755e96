"""Multi-chip scaling benchmark: aggregated edges/s vs mesh size.

The north-star scaling metric (BASELINE.md): ≥2x edges/s at 2 hosts over a
single chip on large graphs.  On real multi-chip hardware this measures ICI
halo exchange; on a single-host dev box it runs the same sharded program on
virtual CPU devices (functional validation + plan statistics: halo sizes,
interior fraction — the quantities that determine real scaling).

Usage: python -m gnnadvisor_osdi21_tpu.bench.bench_scaling [--devices 1,2,4,8]
       [--nodes N] [--edges E]
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=str, default="1,2,4,8")
    p.add_argument("--nodes", type=int, default=100_000)
    p.add_argument("--edges", type=int, default=1_000_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--epochs", type=int, default=20)
    args = p.parse_args(argv)
    # sorted: the per-chip-equivalent baseline (t1_ms) is taken from the
    # smallest device count's measurement, so it must run first
    dev_list = sorted(int(d) for d in args.devices.split(","))

    import os

    if not os.environ.get("GRAFT_REAL_DEVICES"):
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={max(dev_list)}"
            ).strip()

    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax

    if not os.environ.get("GRAFT_REAL_DEVICES"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.parallel.dist_ops import make_dist_train_step
    from gnnadvisor_osdi21_tpu.parallel.mesh import make_mesh
    from gnnadvisor_osdi21_tpu.parallel.partition import shard_graph

    g = synthesize_graph(args.nodes, args.edges, num_features=args.dim,
                         num_classes=16, kind="web", seed=0)
    g = rabbit_reorder_graph(g)  # locality shrinks the halo
    print("devices,epoch_ms,edges_per_s,halo_rows,interior_frac")
    for nd in dev_list:
        sg = shard_graph(g, num_devices=nd)
        mesh = make_mesh(nd)
        step, init = make_dist_train_step(mesh, sg, "gcn")
        params, opt_state, garr, x, y = init(
            jax.random.PRNGKey(0), args.dim, 16, 16,
            g.init_embedding(args.dim), g.init_labels(16),
        )
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, garr, x, y)
        float(loss)  # host fetch = reliable fence
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            params, opt_state, loss = step(params, opt_state, garr, x, y)
        float(loss)
        ms = (time.perf_counter() - t0) * 1e3 / args.epochs
        interior = float(sg.int_lens.sum()) / max(
            float(sg.int_lens.sum() + sg.bnd_lens.sum()), 1.0
        )
        print(
            f"{nd},{ms:.2f},{g.nnz / ms * 1e3:.3g},{sg.halo},{interior:.3f}",
            flush=True,
        )

        # --- modeled ICI comm time vs per-chip compute --------------------
        # This box tunnels ONE chip, so real multi-chip wall time cannot be
        # measured; the plan statistics + link bandwidth give the paper
        # argument for the >=2x-at-2-hosts target.  Per GCN epoch each
        # layer exchanges the halo rows once forward and once backward
        # (all_to_all adjoint), so comm bytes ~= 4 * halo * dim * 4 B.
        # v5e ICI: ~1600 Gbps aggregate per chip (~200 GB/s, public specs);
        # DCN-crossing layouts would be ~10x slower per hop.
        ici_bps = 200e9
        comm_ms = 4 * sg.halo * args.dim * 4 / ici_bps * 1e3
        if nd == min(dev_list):
            t1_ms = ms * min(dev_list)  # per-chip-equivalent single baseline
        compute_ms = t1_ms / nd
        overlapped = max(compute_ms, comm_ms)
        serial = compute_ms + comm_ms
        print(
            f"  model nd={nd}: compute/chip {compute_ms:.2f} ms, ICI comm "
            f"{comm_ms:.3f} ms -> epoch {overlapped:.2f}-{serial:.2f} ms, "
            f"speedup x{t1_ms / serial:.2f}-x{t1_ms / overlapped:.2f} "
            f"(interior {interior:.0%} overlaps the exchange)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

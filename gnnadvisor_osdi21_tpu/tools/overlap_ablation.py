"""Communication-overlap ablation for the distributed hybrid path.

Evidence harness for SURVEY.md §2.3 mandate (b): the diagonal tier reads
only ``x_local``, so XLA can schedule its slab matmul concurrently with the
halo ``all_to_all``.  This script times the SAME sharded training step in
two builds:

- ``overlap=True``  — diagonal tier fed from ``x_local`` (no dependency on
  the exchange; the shipped configuration), and
- ``overlap=False`` — diagonal tier fed from ``table[:block]`` (identical
  math and identical bytes moved, but a false data dependency forces the
  slab matmul to wait for the all_to_all),

and optionally captures a ``jax.profiler`` trace of each.  Any epoch-time
gap between the two is time the exchange spends hidden behind the diagonal
reduction.

On this container only a virtual CPU mesh is available
(``--xla_force_host_platform_device_count``); collectives there are real
memcpies scheduled by the same XLA machinery, so the ablation demonstrates
the dependency structure. Run on a real TPU pod slice for ICI numbers.

Usage: python -m gnnadvisor_osdi21_tpu.tools.overlap_ablation
           [--devices 8] [--nodes 200000] [--epochs 30] [--trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--nodes", type=int, default=200_000)
    p.add_argument("--edges", type=int, default=2_400_000)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--model", type=str, default="gcn")
    p.add_argument("--trace", type=str, default="",
                   help="write jax.profiler traces under this directory")
    p.add_argument("--real", action="store_true",
                   help="use real devices (default: virtual CPU mesh)")
    args = p.parse_args(argv)

    if not args.real:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={args.devices}"
            ).strip()
    import jax

    if not args.real:
        jax.config.update("jax_platforms", "cpu")

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_reorder_graph
    from gnnadvisor_osdi21_tpu.parallel.dist_hybrid import make_dist_train_step
    from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import shard_graph_hybrid
    from gnnadvisor_osdi21_tpu.parallel.mesh import make_mesh

    g = rabbit_reorder_graph(
        synthesize_graph(args.nodes, args.edges, num_features=32,
                         num_classes=8, kind="community", seed=5)
    )
    mesh = make_mesh(args.devices)
    sg = shard_graph_hybrid(g, num_devices=args.devices)
    print(f"# {args.nodes} nodes, {g.nnz} edges, {args.devices} devices, "
          f"diag_b={sg.diag_b} hot_k={sg.hot_k} halo={sg.halo}")

    results = {}
    for overlap in (True, False):
        step, init = make_dist_train_step(mesh, sg, args.model, overlap=overlap)
        params, opt_state, garr, x, y = init(
            jax.random.PRNGKey(0), 32, 16, g.num_classes,
            g.init_embedding(32, seed=0), g.init_labels(g.num_classes),
        )
        for _ in range(5):  # compile + warm
            params, opt_state, loss = step(params, opt_state, garr, x, y)
        float(loss)
        ctx = None
        if args.trace:
            d = os.path.join(args.trace, f"overlap_{overlap}")
            jax.profiler.start_trace(d)
            ctx = d
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            params, opt_state, loss = step(params, opt_state, garr, x, y)
        float(loss)
        ms = (time.perf_counter() - t0) * 1e3 / args.epochs
        if ctx:
            jax.profiler.stop_trace()
            print(f"# trace written to {ctx}")
        results[overlap] = ms
        print(f"overlap={overlap}: {ms:.3f} ms/epoch  (loss={float(loss):.4f})")

    hidden = results[False] - results[True]
    print(f"exchange time hidden behind the diagonal tier: {hidden:.3f} "
          f"ms/epoch ({hidden / max(results[False], 1e-9):.1%} of the "
          f"serialized step)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Multi-host training demo/validation (jax.distributed).

Launches N host processes on one machine (CPU backend, each contributing
virtual devices) that jointly run the edge-partitioned GCN train step —
the same program that runs across real TPU pod-slice hosts, where
``jax.distributed.initialize`` picks up the coordinator from the TPU
environment automatically.

Usage (single machine, 2 simulated hosts x 4 devices):
    python -m gnnadvisor_osdi21_tpu.tools.multihost_demo --hosts 2 --local_devices 4

Each process prints its host id and the (identical) final loss.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys


def worker(host_id: int, hosts: int, local_devices: int, port: int) -> int:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=hosts,
        process_id=host_id,
    )
    ndev = jax.device_count()
    print(f"[host {host_id}] global devices: {ndev}", flush=True)

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.parallel.dist_ops import make_dist_train_step
    from gnnadvisor_osdi21_tpu.parallel.mesh import make_mesh
    from gnnadvisor_osdi21_tpu.parallel.partition import shard_graph

    g = synthesize_graph(64 * ndev, 512 * ndev, num_features=16, num_classes=5, seed=1)
    sg = shard_graph(g, num_devices=ndev, part_size=4)
    mesh = make_mesh(ndev)
    step, init = make_dist_train_step(mesh, sg, "gcn")
    params, opt_state, garr, x, y = init(
        jax.random.PRNGKey(0), 16, 16, g.num_classes,
        g.init_embedding(16), g.init_labels(g.num_classes),
    )
    loss = None
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, garr, x, y)
    print(f"[host {host_id}] loss after 3 steps: {float(loss):.4f}", flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--hosts", type=int, default=2)
    p.add_argument("--local_devices", type=int, default=4)
    p.add_argument("--port", type=int, default=12421)
    p.add_argument("--worker", type=int, default=-1, help=argparse.SUPPRESS)
    args = p.parse_args(argv)
    if args.worker >= 0:
        return worker(args.worker, args.hosts, args.local_devices, args.port)
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "gnnadvisor_osdi21_tpu.tools.multihost_demo",
             "--hosts", str(args.hosts), "--local_devices", str(args.local_devices),
             "--port", str(args.port), "--worker", str(i)]
        )
        for i in range(args.hosts)
    ]
    rc = max(pr.wait() for pr in procs)
    print("multihost demo:", "OK" if rc == 0 else f"FAILED rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())

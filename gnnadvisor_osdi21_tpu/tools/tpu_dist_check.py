"""Execute the distributed hybrid Pallas branch on REAL TPU hardware.

Closes the round-3 gap "the TPU kernel branch of dist_hybrid has never
*run*, only traced" (VERDICT r3 item 2): with a 1-device TPU mesh the
full ``shard_map`` program — halo all_to_all, ``_dist_tiers_kernels_t``
(``slab_matmul_t`` + ``residual_combine_t`` inside shard_map), loss,
custom-VJP backward — executes on the chip, and the aggregate/loss/grads
are checked against the single-chip oracle path on the same device.

The reference has no analog (GNNA_main.py:53 asserts one GPU); this is
the repo's own §2.3 multi-chip mandate exercised end-to-end on the one
chip this environment tunnels.

Usage: python -m gnnadvisor_osdi21_tpu.tools.tpu_dist_check
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def main(argv=None) -> int:
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    dev = jax.devices()[0]
    if dev.platform == "cpu":
        print("WARNING: no TPU visible — this check is only meaningful on "
              "real hardware (the CPU mesh takes the row-major branch).")

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.ops import reference
    from gnnadvisor_osdi21_tpu.parallel.dist_hybrid import (
        _graph_specs,
        device_graph_arrays,
        dist_hybrid_aggregate,
        make_dist_loss_fn,
        make_dist_train_step,
    )
    from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import (
        shard_graph_hybrid,
    )
    from gnnadvisor_osdi21_tpu.parallel.mesh import GRAPH_AXIS, make_mesh

    g = synthesize_graph(
        20_000, 400_000, num_features=16, num_classes=8,
        kind="community", seed=7,
    )
    sg = shard_graph_hybrid(g, num_devices=1)
    mesh = make_mesh(1)
    print(
        f"graph: {g.num_nodes} nodes / {g.nnz} edges; sharded layout: "
        f"diag_b={sg.diag_b} hot_k={sg.hot_k} res_ob={sg.res_ob} "
        f"res_tile={sg.res_tile} halo={sg.halo}",
        flush=True,
    )

    dim = 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, dim), dtype=np.float32)
    n_pad = sg.num_devices * sg.block
    xp = np.zeros((n_pad, dim), dtype=np.float32)
    xp[: g.num_nodes] = x

    garr = device_graph_arrays(sg, mesh)
    xd = jax.device_put(
        jnp.asarray(xp), NamedSharding(mesh, P(GRAPH_AXIS, None))
    )

    # --- 1. aggregate inside shard_map (executes the Pallas tier branch) --
    ok = True
    for agg_dtype, rtol in (("float32", 1e-4), ("bfloat16", 2e-2)):
        @jax.jit
        @partial(
            shard_map, mesh=mesh,
            in_specs=(_graph_specs(sg), P(GRAPH_AXIS, None)),
            out_specs=P(GRAPH_AXIS, None),
        )
        def run(gd, x_blk):
            gd = {k: v[0] for k, v in gd.items()}
            return dist_hybrid_aggregate(
                x_blk, sg, gd, norm=True, agg_dtype=agg_dtype
            )

        out = np.asarray(run(garr, xd))[: g.num_nodes]
        src = reference.csr_to_coo(g.row_pointers, g.column_index)
        want = np.asarray(reference.gcn_aggregate(
            jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index),
            jnp.asarray(g.degrees), g.num_nodes,
        ))
        scale = float(np.abs(want).max())
        err = float(np.abs(out - want).max()) / scale
        passed = err < rtol
        ok &= passed
        print(
            f"dist-aggregate [{agg_dtype}] inside shard_map on "
            f"{dev.platform}: max rel err {err:.2e} "
            f"({'PASS' if passed else 'FAIL'} @ {rtol})",
            flush=True,
        )

    # --- 2. full train step (fwd + custom-VJP bwd through the kernels) ---
    step, init = make_dist_train_step(mesh, sg, "gcn", agg_dtype="float32")
    params, opt_state, garr2, xd2, yd2 = init(
        jax.random.PRNGKey(0), dim, 16, g.num_classes,
        x, g.init_labels(g.num_classes),
    )
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, garr2, xd2, yd2)
        losses.append(float(loss))
    dec = losses[-1] < losses[0] and np.isfinite(losses).all()
    ok &= bool(dec)
    print(
        f"dist train step x5 on {dev.platform}: losses "
        f"{losses[0]:.4f} -> {losses[-1]:.4f} "
        f"({'PASS' if dec else 'FAIL'})",
        flush=True,
    )

    # --- 3. loss parity vs the single-chip loss on the same chip ---------
    from gnnadvisor_osdi21_tpu.models import gcn_apply, init_gcn
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
    from gnnadvisor_osdi21_tpu.train import nll_loss

    p0 = init_gcn(jax.random.PRNGKey(3), dim, 16, g.num_classes)
    y = g.init_labels(g.num_classes)
    gt = build_graph_tensors(g, method="ell", part_size=4)
    single = float(nll_loss(
        gcn_apply(p0, jnp.asarray(x), (gt, gt)), jnp.asarray(y)
    ))
    loss_fn = make_dist_loss_fn(mesh, sg, "gcn", agg_dtype="float32")
    yp = np.zeros(n_pad, dtype=np.int32)
    yp[: g.num_nodes] = y
    yd = jax.device_put(jnp.asarray(yp), NamedSharding(mesh, P(GRAPH_AXIS)))
    dist = float(jax.jit(loss_fn)(p0, garr, xd, yd))
    lerr = abs(dist - single) / max(1.0, abs(single))
    lp = lerr < 1e-4
    ok &= lp
    print(
        f"dist loss {dist:.6f} vs single-chip tuned loss {single:.6f}: "
        f"rel err {lerr:.2e} ({'PASS' if lp else 'FAIL'})",
        flush=True,
    )

    # --- 3b. ELL dist path (ragged exchange) executes on the chip --------
    # (r5 moved the ELL wire to the compact ragged table; its TPU branch
    # must lower and agree with the single-chip loss like the hybrid one)
    from gnnadvisor_osdi21_tpu.parallel import dist_ops
    from gnnadvisor_osdi21_tpu.parallel.partition import shard_graph

    sge = shard_graph(g, num_devices=1, part_size=4)
    loss_fn_e = dist_ops.make_dist_loss_fn(mesh, sge, "gcn")
    garr_e = dist_ops.device_graph_arrays(sge, mesh)
    n_pad_e = sge.num_devices * sge.block
    xpe = np.zeros((n_pad_e, dim), dtype=np.float32)
    xpe[: g.num_nodes] = x
    ype = np.zeros(n_pad_e, dtype=np.int32)
    ype[: g.num_nodes] = y
    dist_e = float(jax.jit(loss_fn_e)(
        p0,
        garr_e,
        jax.device_put(jnp.asarray(xpe), NamedSharding(mesh, P(GRAPH_AXIS, None))),
        jax.device_put(jnp.asarray(ype), NamedSharding(mesh, P(GRAPH_AXIS))),
    ))
    eerr = abs(dist_e - single) / max(1.0, abs(single))
    ep = eerr < 1e-4
    ok &= ep
    print(
        f"ELL dist loss (ragged exchange) {dist_e:.6f} vs single-chip "
        f"{single:.6f}: rel err {eerr:.2e} ({'PASS' if ep else 'FAIL'})",
        flush=True,
    )

    # --- 4. multi-device ragged collective vs the emulation table --------
    # (ADVICE r4: the multi-pair jax.lax.ragged_all_to_all branch only
    # lowers trivially on a 1-device mesh).  Hardware-gated: runs whenever
    # this host sees 2+ accelerator devices — the pod-slice CI arm.
    ndev_hw = len([d for d in jax.devices() if d.platform != "cpu"])
    if ndev_hw >= 2:
        from gnnadvisor_osdi21_tpu.parallel.dist_ops import (
            _halo_exchange_ragged_t,
        )

        nd = min(ndev_hw, 4)
        g2 = synthesize_graph(4096 * nd, 40_000 * nd, num_features=8,
                              kind="web", seed=13)
        sg2 = shard_graph_hybrid(g2, num_devices=nd, diag_b=512, hot_k=0)
        mesh2 = make_mesh(nd)
        garr3 = device_graph_arrays(sg2, mesh2)
        n_pad2 = nd * sg2.block
        ids = jnp.arange(n_pad2, dtype=jnp.float32)[None, :]
        xr = jax.device_put(ids, NamedSharding(mesh2, P(None, GRAPH_AXIS)))

        @jax.jit
        @partial(
            shard_map, mesh=mesh2,
            in_specs=(_graph_specs(sg2), P(None, GRAPH_AXIS)),
            out_specs=P(None, GRAPH_AXIS),
        )
        def exchange(gd, x_t):
            gd = {k: v[0] for k, v in gd.items()}
            return _halo_exchange_ragged_t(x_t, gd, sg2.recv_max)

        got = np.asarray(exchange(garr3, xr))[0].reshape(
            nd, sg2.block + sg2.recv_max
        )
        # dense-emulation oracle, host-side from the dense plan arrays:
        # recv[r][s*Hmax + j] = id shipped by sender s slot j, repacked
        ids_np = np.arange(n_pad2, dtype=np.float32).reshape(nd, sg2.block)
        rp_ok = True
        for r in range(nd):
            dense_recv = np.concatenate([
                ids_np[s][sg2.send_idx[s, r]] for s in range(nd)
            ])
            want = np.concatenate(
                [ids_np[r], dense_recv[sg2.halo_repack[r]]]
            )
            n_real = sg2.block + int(sg2.halo_sizes[r].sum())
            rp_ok &= bool(np.array_equal(got[r, :n_real], want[:n_real]))
        ok &= rp_ok
        print(
            f"multi-device ragged_all_to_all vs emulation table "
            f"(nd={nd}, {dev.platform}): {'PASS' if rp_ok else 'FAIL'}",
            flush=True,
        )
    else:
        print(
            "multi-device ragged check: SKIPPED (1 accelerator visible; "
            "runs automatically on a pod slice)",
            flush=True,
        )

    print("ALL PASS" if ok else "FAILURES PRESENT", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

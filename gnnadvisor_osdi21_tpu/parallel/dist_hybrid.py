"""Distributed aggregation + training on the tuned hybrid layout.

The multi-chip twin of ``ops/hybrid_agg.py`` (see
``parallel/hybrid_partition.py`` for the layout): inside ``shard_map``,
each device runs

1. the **diagonal tier** against ``x_local`` — its columns are block-local
   by construction, so this Pallas slab matmul has NO data dependency on
   the halo exchange and XLA schedules it concurrently with the
   all_to_all (communication overlap on the tuned kernel; ablation in
   ``tools/overlap_ablation.py``),
2. one ``all_to_all`` halo exchange building the gather table
   ``[x_local ; recv]`` (plan from hybrid_partition; rides ICI),
3. the **hot + residual tiers** against the table.

GCN's ``deg[s]·deg[d]`` weighting factors into a local pre-scale of the
sent features and a local post-scale of the output (the same algebraic
trick as dist_ops), so the exchange never ships degree vectors.

Differentiable end-to-end: ``aggregate`` carries a custom VJP whose
backward is the same aggregation applied to the cotangent (undirected
graphs — the reference's assumption, gnn_conv.py:23-27); the halo
exchange inside re-runs, and its adjoint all_to_all never materializes a
scatter.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from gnnadvisor_osdi21_tpu.ops.aggregate import _zero_cotangent
from gnnadvisor_osdi21_tpu.ops.hybrid_agg import (
    HybridTensors,
    _diag_aggregate,
    _hot_aggregate,
    _on_tpu,
    _residual_aggregate,
    residual_tier_t,
)
from gnnadvisor_osdi21_tpu.parallel.dist_ops import (
    _halo_exchange_ragged_t,
    model_apply_with_agg,
)
from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import HybridShardedGraph
from gnnadvisor_osdi21_tpu.parallel.mesh import GRAPH_AXIS
from gnnadvisor_osdi21_tpu.train import build_model


def _local_tensors(
    sg: HybridShardedGraph, g: dict, agg_dtype: str = "bfloat16"
) -> HybridTensors:
    """Assemble the local shard's HybridTensors view (row space = block).
    Only the mask orientation the backend's kernels read travels in ``g``
    (slot-major on TPU, out-row-major on the CPU mesh — _graph_specs)."""
    return HybridTensors(
        degrees=g["degrees"],
        row_mask=g["node_mask"],
        diag_bits=g["diag_bits"] if sg.diag_b else None,
        hot_bits=g["hot_bits"] if sg.hot_k else None,
        hot_ids=g["hot_ids"] if sg.hot_k else None,
        # single-stage residual (sg.res_single): res_dst holds precomposed
        # table ids and res_gather never ships — the kernels branch on None
        res_gather=g.get("res_gather"),
        res_dst=g["res_dst"],
        res_mask=g.get("res_mask"),
        res_mask_s=g.get("res_mask_s"),
        res_t2b=g["res_t2b"],
        num_rows=sg.block,
        real_nodes=sg.block,
        diag_b=sg.diag_b,
        hot_k=sg.hot_k,
        res_tile=sg.res_tile,
        res_ob=sg.res_ob,
        agg_dtype=agg_dtype,
    )


def dist_hybrid_aggregate(
    x_local: jax.Array, sg: HybridShardedGraph, g: dict, norm: bool,
    overlap: bool = True, agg_dtype: str = "bfloat16",
) -> jax.Array:
    """out[s] = Σ_d w_sd · x[d] over the three tiers; runs inside shard_map.

    Row-major ``[block, D]`` boundary wrapper over the transposed core
    (``dist_hybrid_aggregate_t``) — kept for callers that hold row-major
    shards; the tuned loss path runs transposed end-to-end instead.
    """
    return _dist_agg_t(x_local.T, g, sg, norm, overlap, agg_dtype).T


def dist_hybrid_aggregate_t(
    x_t: jax.Array, sg: HybridShardedGraph, g: dict, norm: bool,
    overlap: bool = True, agg_dtype: str = "bfloat16",
) -> jax.Array:
    """Transposed aggregate: ``out[D, block] = Σ_d w_sd · x_t[:, d]``.

    The v3 layout end-to-end: the shard's features stay ``[D, rows]``
    through GEMMs, halo exchange and all three tiers — no per-layer
    transposes in the traced program (round-3 review item; single-chip
    eliminated these in train.py and the dist path now matches).

    Carries a custom VJP (``_dist_agg_t``): the global operator is
    symmetric (undirected graphs, gnn_conv.py:23-27), so the adjoint is
    the same distributed aggregation applied to the cotangent — the halo
    exchange re-runs and its adjoint never materializes a scatter.  This
    also keeps reverse-mode AD away from ``pallas_call`` (no transpose
    rule) on TPU.

    ``overlap=False`` forces the diagonal tier to read through the halo
    table (adding a false dependency on the all_to_all) — the ablation arm
    that demonstrates the overlap is real (tools/overlap_ablation.py).
    """
    return _dist_agg_t(x_t, g, sg, norm, overlap, agg_dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _dist_agg_t(x_t, g, sg, norm, overlap, agg_dtype):
    return _dist_tiers_t(x_t, g, sg, norm, overlap, agg_dtype)


def _dist_agg_t_fwd(x_t, g, sg, norm, overlap, agg_dtype):
    return _dist_tiers_t(x_t, g, sg, norm, overlap, agg_dtype), g


def _dist_agg_t_bwd(sg, norm, overlap, agg_dtype, g, ct):
    return _dist_tiers_t(ct, g, sg, norm, overlap, agg_dtype), _zero_cotangent(g)


_dist_agg_t.defvjp(_dist_agg_t_fwd, _dist_agg_t_bwd)


def _dist_tiers_t(
    x_t: jax.Array, g: dict, sg: HybridShardedGraph, norm: bool,
    overlap: bool, agg_dtype: str = "bfloat16",
) -> jax.Array:
    ht = _local_tensors(sg, g, agg_dtype)
    out_dtype = x_t.dtype
    if norm:
        x_t = x_t * ht.degrees[None, :].astype(x_t.dtype)
    # one dtype contract for BOTH branches (single-chip hybrid_aggregate
    # casts before the tiers; the CPU-mesh validation path must exercise
    # the same numerics production runs) — and casting *before* the halo
    # exchange halves the all_to_all bytes at bf16
    x_t = x_t.astype(ht.agg_dtype)
    table_t = _halo_exchange_ragged_t(x_t, g, recv_max=sg.recv_max)
    if _on_tpu():
        out = _dist_tiers_kernels_t(x_t, table_t, ht, sg, overlap)
    else:
        # CPU mesh: same transposed shard_map program, row-major reference
        # tier composition at the kernel boundary (the Pallas kernels get
        # their own interpret-mode tests)
        out = _dist_tiers_rowmajor(x_t.T, table_t.T, ht, sg, overlap).T
    if norm:
        out = out * ht.degrees[None, :].astype(out.dtype)
    return out.astype(out_dtype)


def _dist_tiers_rowmajor(x_local, table, ht, sg, overlap):
    """Reference tier composition (CPU mesh validation path)."""
    out = None
    if sg.diag_b:
        # diagonal columns are block-local: reading them from x_local keeps
        # the slab matmul independent of the exchange
        diag_src = x_local if overlap else table[: sg.block]
        out = _diag_aggregate(diag_src, ht)
    if sg.hot_k:
        h = _hot_aggregate(table, ht)
        out = h if out is None else out + h
    if ht.res_dst is not None:
        r = _residual_aggregate(table, ht)
        out = r if out is None else out + r
    if out is None:
        out = jnp.zeros_like(x_local)
    return out


def _dist_tiers_kernels_t(x_t, table_t, ht, sg, overlap):
    """Per-shard tier composition on the v3 transposed kernels.

    Everything arrives already transposed (``x_t [D, block]``,
    ``table_t [D, table_rows]`` from the transposed halo exchange), so the
    slab/residual passes run at the single-chip kernels' exact-byte rates
    (ops/spmm_pallas.py *_t) with ZERO transposes — the round-3 per-layer
    ``.T`` on [rows, D] operands is gone.  Executes on real TPU hardware
    (tools/tpu_dist_check.py runs it on a 1-device mesh and checks against
    the single-chip oracle); the CPU mesh validates the surrounding
    program via the row-major reference path above.
    """
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas

    # pallas_call cannot infer varying-mesh-axes metadata; annotating the
    # kernel outputs keeps check_vma=True on the surrounding shard_map
    # program (ADVICE r3: a blanket check_vma=False also exempted the
    # collective/loss code from a check that catches real mistakes)
    vma = frozenset({GRAPH_AXIS})
    out = None
    if sg.diag_b:
        diag_src_t = x_t if overlap else table_t[:, : sg.block]
        out = spmm_pallas.slab_matmul_t(
            ht.diag_bits, diag_src_t, table_block_cols=ht.diag_b,
            block_cols=min(ht.block_rows, ht.diag_b),
            feature_tile=ht.feature_tile, vma=vma,
        )
    if sg.hot_k:
        h = spmm_pallas.slab_matmul_t(
            ht.hot_bits, jnp.take(table_t, ht.hot_ids, axis=1),
            block_cols=ht.block_rows, feature_tile=ht.feature_tile, vma=vma,
        )
        out = h if out is None else out + h
    if ht.res_dst is not None:
        # shared with _tiers_transposed
        r = residual_tier_t(table_t, ht, vma=vma)
        out = r if out is None else out + r
    if out is None:
        return jnp.zeros_like(x_t)
    return out  # [D, block]


def _graph_specs(sg: HybridShardedGraph):
    specs = {
        "degrees": P(GRAPH_AXIS, None),
        "node_mask": P(GRAPH_AXIS, None),
        "res_dst": P(GRAPH_AXIS, None),
        "res_t2b": P(GRAPH_AXIS, None),
    }
    if not sg.res_single:
        specs["res_gather"] = P(GRAPH_AXIS, None)
    # Ship only the plan arrays and mask orientation the backend actually
    # reads (VERDICT r4 item 8: both plans used to travel in every run).
    # TPU (jax.lax.ragged_all_to_all): the sender-side flat gather list +
    # offset/size tables — all O(halo + ndev²).  CPU mesh (dense
    # all_to_all + static repack emulation): the dense send_idx
    # ([ndev, ndev, Hmax] — the largest plan array once pair sizes skew)
    # + the dense->ragged repack map.  Mask twins are equal-sized; holding
    # both wastes ~words·M_pad·4 bytes of HBM per device at scale.
    if _on_tpu():
        specs.update({
            "send_flat": P(GRAPH_AXIS, None),
            "halo_in_off": P(GRAPH_AXIS, None),
            "halo_send_sizes": P(GRAPH_AXIS, None),
            "halo_out_off": P(GRAPH_AXIS, None),
            "halo_sizes": P(GRAPH_AXIS, None),
            "res_mask_s": P(GRAPH_AXIS, None, None),
        })
    else:
        specs.update({
            "send_idx": P(GRAPH_AXIS, None, None),
            "halo_repack": P(GRAPH_AXIS, None),
            "res_mask": P(GRAPH_AXIS, None, None),
        })
    if sg.diag_b:
        specs["diag_bits"] = P(GRAPH_AXIS, None, None)
    if sg.hot_k:
        specs["hot_ids"] = P(GRAPH_AXIS, None)
        specs["hot_bits"] = P(GRAPH_AXIS, None, None)
    return specs


def device_graph_arrays(sg: HybridShardedGraph, mesh: Mesh) -> dict:
    specs = _graph_specs(sg)
    return {
        k: jax.device_put(
            jnp.asarray(getattr(sg, k)), NamedSharding(mesh, specs[k])
        )
        for k in specs
    }


def make_dist_loss_fn(
    mesh: Mesh, sg: HybridShardedGraph, model: str, overlap: bool = True,
    agg_dtype: str = "bfloat16",
) -> Callable:
    """loss(params, g_arrays, x, y): full hybrid forward inside shard_map."""
    total_nodes = float(sg.num_nodes)
    specs = _graph_specs(sg)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P(GRAPH_AXIS, None), P(GRAPH_AXIS)),
        out_specs=P(),
    )
    def loss_fn(params, g, x_blk, y_blk):
        g = {k: v[0] for k, v in g.items()}
        agg = lambda h_t, norm: dist_hybrid_aggregate_t(
            h_t, sg, g, norm, overlap, agg_dtype
        )
        # ONE transpose at the shard boundary; the whole forward (GEMMs,
        # halo exchange, tiers, log_softmax) then runs in the v3 [D, rows]
        # layout — no per-layer transposes in the traced program
        log_probs_t = model_apply_with_agg(
            model, params, x_blk.T, agg, transposed=True
        )  # [classes, block]
        nll = -jnp.take_along_axis(
            log_probs_t, y_blk[None, :].astype(jnp.int32), axis=0
        )[0]
        local = jnp.sum(nll * g["node_mask"])
        return jax.lax.psum(local, GRAPH_AXIS) / total_nodes

    return loss_fn


def make_dist_train_step(
    mesh: Mesh, sg: HybridShardedGraph, model: str, lr: float = 0.01,
    overlap: bool = True, agg_dtype: str = "bfloat16",
):
    """Jitted multi-chip hybrid train step + init helper (dist_ops twin)."""
    loss_fn = make_dist_loss_fn(
        mesh, sg, model, overlap=overlap, agg_dtype=agg_dtype
    )
    optimizer = optax.adam(lr)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, g, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, g, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init(key, in_dim: int, hidden: int, num_classes: int, x=None, y=None):
        params, _ = build_model(model, key, in_dim, hidden, num_classes)
        params = jax.device_put(params, NamedSharding(mesh, P()))
        opt_state = optimizer.init(params)
        g = device_graph_arrays(sg, mesh)
        out = [params, opt_state, g]
        row_sharding = NamedSharding(mesh, P(GRAPH_AXIS, None))
        n_pad = sg.num_devices * sg.block
        if x is not None:
            xp = np.zeros((n_pad, x.shape[1]), dtype=np.float32)
            xp[: x.shape[0]] = np.asarray(x)
            out.append(jax.device_put(jnp.asarray(xp), row_sharding))
        if y is not None:
            yp = np.zeros(n_pad, dtype=np.int32)
            yp[: y.shape[0]] = np.asarray(y)
            out.append(
                jax.device_put(jnp.asarray(yp), NamedSharding(mesh, P(GRAPH_AXIS)))
            )
        return tuple(out)

    return step, init

"""Distributed aggregation + training over a 1-D device mesh.

Edge-partitioned multi-chip GNN execution (new capability; SURVEY.md §2.3):
destination rows are sharded in contiguous blocks over the ``"graph"`` mesh
axis; every layer's aggregation fetches remote source features with one
exact-size ``jax.lax.ragged_all_to_all`` (riding ICI) using the compact
halo plan from ``parallel/partition.py`` (the CPU mesh emulates the same
table layout over a dense exchange + static repack), then runs the same
padded neighbor-group reduction as the single-chip ELL path, entirely
inside ``shard_map``.

Key algebraic trick: the GCN weighting ``deg[s]·deg[d]`` factors into a
pre-scale of the *sent* features by the sender's local degrees and a
post-scale by the receiver's — so the halo exchange never has to ship
degree vectors.

Everything is differentiable through ``shard_map`` (the all_to_all adjoint
is the reverse all_to_all, which XLA inserts automatically), so one
``jax.grad`` + optax step trains the full model multi-chip.
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

from gnnadvisor_osdi21_tpu.parallel.mesh import GRAPH_AXIS
from gnnadvisor_osdi21_tpu.parallel.partition import ShardedGraph
from gnnadvisor_osdi21_tpu.train import build_model


def _halo_exchange_ragged(
    x_local: jax.Array, g: dict, recv_max: int | None = None
) -> jax.Array:
    """Row-major exact-size halo exchange: gather table ``[B + recv_max, D]``
    packing each receiver's halo compactly (segments in sender order) — the
    layout ``ShardedGraph``'s remapped ``bnd_cols`` index.  Rows lead, so
    ``jax.lax.ragged_all_to_all`` (leading-dim ragged) needs no transposes
    at all; the CPU mesh (no ragged lowering in XLA:CPU, jax 0.9) validates
    the same table layout by dense exchange + a static repack gather."""
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import _on_tpu

    r_max = recv_max if recv_max is not None else g["halo_repack"].shape[0]
    if _on_tpu():
        send = jnp.take(x_local, g["send_flat"], axis=0, mode="clip")
        out = jnp.zeros((r_max, x_local.shape[1]), x_local.dtype)
        recv = jax.lax.ragged_all_to_all(
            send, out,
            g["halo_in_off"], g["halo_send_sizes"],
            g["halo_out_off"], g["halo_sizes"],
            axis_name=GRAPH_AXIS,
        )
        return jnp.concatenate([x_local, recv], axis=0)
    ndev, halo = g["send_idx"].shape[:2]
    send_buf = jnp.take(
        x_local, g["send_idx"].reshape(-1), axis=0, mode="clip"
    ).reshape(ndev, halo, -1)
    recv = jax.lax.all_to_all(
        send_buf, GRAPH_AXIS, split_axis=0, concat_axis=0, tiled=True
    ).reshape(ndev * halo, -1)
    return jnp.concatenate(
        [x_local, jnp.take(recv, g["halo_repack"], axis=0)], axis=0
    )


def _halo_exchange_ragged_t(
    x_t: jax.Array, g: dict, recv_max: int | None = None
) -> jax.Array:
    """Exact-size halo exchange in the transposed layout: the gather table
    ``[D, B + recv_max]`` packs each receiver's halo compactly (segments in
    sender order), shipping Σ halo_sizes rows per device instead of the
    uniform-Hmax all_to_all's ``ndev·Hmax`` — after rabbit the pair sizes
    are heavily skewed, so the dense plan pads most pairs enormously at
    32-64 devices (hybrid_partition builds both plans; ``ogb_scale_demo``
    reports the measured byte reduction).

    TPU: ``jax.lax.ragged_all_to_all`` (leading-dim ragged, so the
    halo-sized send/recv buffers transpose at the exchange boundary —
    halo ≪ block rows, the full shard never transposes).  The CPU mesh has
    no ragged-all-to-all lowering (XLA:CPU ThunkEmitter, jax 0.9), so it
    validates the SAME table layout by dense exchange + a static repack
    gather."""
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import _on_tpu

    d = x_t.shape[0]
    # only the backend's own plan arrays travel (dist_hybrid._graph_specs),
    # so the table halo span comes from the caller's static layout on TPU
    # and from the repack map's length on the CPU mesh
    r_max = recv_max if recv_max is not None else g["halo_repack"].shape[0]
    if _on_tpu():
        send = jnp.take(
            x_t, g["send_flat"], axis=1, mode="clip"
        ).T  # [Smax, D]
        out = jnp.zeros((r_max, d), x_t.dtype)
        recv = jax.lax.ragged_all_to_all(
            send, out,
            g["halo_in_off"], g["halo_send_sizes"],
            # recv_sizes[r, s] = halo_sizes[r, s] (receiver-indexed census)
            g["halo_out_off"], g["halo_sizes"],
            axis_name=GRAPH_AXIS,
        )
        return jnp.concatenate([x_t, recv.T], axis=1)
    ndev, halo = g["send_idx"].shape[:2]
    send_buf = jnp.take(
        x_t, g["send_idx"].reshape(-1), axis=1, mode="clip"
    ).reshape(d, ndev, halo)
    recv = jax.lax.all_to_all(
        send_buf, GRAPH_AXIS, split_axis=1, concat_axis=1, tiled=True
    ).reshape(d, ndev * halo)
    return jnp.concatenate(
        [x_t, jnp.take(recv, g["halo_repack"], axis=1)], axis=1
    )


def _local_part_reduce(
    table: jax.Array,
    part_cols: jax.Array,
    part_lens: jax.Array,
    part2local: jax.Array,
    block: int,
) -> jax.Array:
    """Masked neighbor-group sum + sorted segment reduction (ELL stage 1+2)."""
    num_parts, part_size = part_cols.shape
    gathered = jnp.take(
        table, part_cols.reshape(-1), axis=0, mode="clip"
    ).reshape(num_parts, part_size, -1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_parts, part_size), 1)
    mask = (lane < part_lens[:, None]).astype(table.dtype)
    part_sums = jnp.einsum(
        "psd,ps->pd", gathered, mask, preferred_element_type=jnp.float32
    ).astype(table.dtype)
    return jax.ops.segment_sum(
        part_sums, part2local, num_segments=block, indices_are_sorted=True
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dist_aggregate(
    x_local: jax.Array,
    g: dict,
    block: int,
    norm: bool,
    recv_max: int | None = None,
) -> jax.Array:
    """out[s] = Σ_d w_sd · x[d] with the halo exchange; runs inside shard_map.

    Communication overlap: interior parts (all-local neighbors, split out at
    build time) reduce against ``x_local`` with no data dependency on the
    all_to_all — XLA schedules that reduction concurrently with the
    exchange; boundary parts reduce against the full gather table once the
    halo lands.  Owners are sorted within each class, so both partials use
    the fast sorted segment-sum and add exactly.

    ``recv_max``: the compact table's halo span (``ShardedGraph.recv_max``)
    — required on TPU, where the ragged exchange plan carries no
    recv-shaped array.

    Custom VJP: the global operator is symmetric (undirected graphs), so
    the adjoint is the same distributed aggregation applied to the
    cotangent — no scatter-add adjoints of the gathers, and the adjoint
    all_to_all is just the forward exchange re-run.
    """
    return _dist_ell_body(x_local, g, block, norm, recv_max)


def _dist_ell_body(x_local, g, block, norm, recv_max=None):
    if norm:
        x_local = x_local * g["degrees"][:, None].astype(x_local.dtype)
    out = _local_part_reduce(
        x_local, g["int_cols"], g["int_lens"], g["int2local"], block
    )
    table = _halo_exchange_ragged(x_local, g, recv_max=recv_max)
    out = out + _local_part_reduce(
        table, g["bnd_cols"], g["bnd_lens"], g["bnd2local"], block
    )
    if norm:
        out = out * g["degrees"][:, None].astype(out.dtype)
    return out


def _dist_ell_fwd(x_local, g, block, norm, recv_max):
    return _dist_ell_body(x_local, g, block, norm, recv_max), g


def _dist_ell_bwd(block, norm, recv_max, g, ct):
    from gnnadvisor_osdi21_tpu.ops.aggregate import _zero_cotangent

    return _dist_ell_body(ct, g, block, norm, recv_max), _zero_cotangent(g)


dist_aggregate.defvjp(_dist_ell_fwd, _dist_ell_bwd)


def model_apply_with_agg(
    model: str, params, x, agg, epsilon: float = 0.5,
    transposed: bool = False,
):
    """GCN-2 / GIN-5 forward over an injected per-layer aggregate closure
    ``agg(h, norm)`` — the ONE definition shared by the ELL (dist_ops) and
    hybrid (dist_hybrid) distributed paths, so the two twins cannot drift.

    ``transposed``: run the whole forward in the v3 feature layout
    ``[D, rows]`` (``x`` transposed once at the shard boundary; GEMMs are
    ``W^T @ h``, class axis 0) — the hybrid path's mode, so no per-layer
    transposes appear in the traced program."""
    if transposed:
        mm = lambda h, w: jnp.matmul(w.T, h)
        axis = 0
    else:
        mm = lambda h, w: jnp.matmul(h, w)
        axis = 1
    if model == "gcn":
        h = mm(x, params["conv1"])
        h = jax.nn.relu(agg(h, True))
        h = mm(h, params["conv2"])
        h = agg(h, True)
        return jax.nn.log_softmax(h, axis=axis)
    if model == "gin":
        h = x
        n_layers = len(params)
        for i in range(n_layers):
            h = epsilon * agg(h, False)
            h = mm(h, params[f"conv{i + 1}"])
            if i < n_layers - 1:
                h = jax.nn.relu(h)
        return jax.nn.log_softmax(h, axis=axis)
    raise ValueError(f"unknown model: {model}")


def _graph_specs():
    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import _on_tpu

    specs = {
        "int_cols": P(GRAPH_AXIS, None, None),
        "int_lens": P(GRAPH_AXIS, None),
        "int2local": P(GRAPH_AXIS, None),
        "bnd_cols": P(GRAPH_AXIS, None, None),
        "bnd_lens": P(GRAPH_AXIS, None),
        "bnd2local": P(GRAPH_AXIS, None),
        "degrees": P(GRAPH_AXIS, None),
        "node_mask": P(GRAPH_AXIS, None),
    }
    # only the backend's own exchange plan travels (_halo_exchange_ragged):
    # the dense [ndev, ndev, Hmax] send_idx is the largest plan array once
    # pair sizes skew, and only the CPU-mesh emulation reads it
    if _on_tpu():
        specs.update({
            "send_flat": P(GRAPH_AXIS, None),
            "halo_in_off": P(GRAPH_AXIS, None),
            "halo_send_sizes": P(GRAPH_AXIS, None),
            "halo_out_off": P(GRAPH_AXIS, None),
            "halo_sizes": P(GRAPH_AXIS, None),
        })
    else:
        specs.update({
            "send_idx": P(GRAPH_AXIS, None, None),
            "halo_repack": P(GRAPH_AXIS, None),
        })
    return specs


def device_graph_arrays(sg: ShardedGraph, mesh: Mesh) -> dict:
    """Place the sharded-graph arrays on the mesh."""
    specs = _graph_specs()
    return {
        k: jax.device_put(
            jnp.asarray(getattr(sg, k)), NamedSharding(mesh, specs[k])
        )
        for k in specs
    }


def make_dist_loss_fn(mesh: Mesh, sg: ShardedGraph, model: str) -> Callable:
    """Build loss(params, g_arrays, x, y) with everything inside shard_map.

    ``x``/``y`` are the full padded arrays sharded over rows; the scalar loss
    is the masked mean NLL over real nodes (replicated output).
    """
    block = sg.block
    total_nodes = float(sg.num_nodes)
    specs = _graph_specs()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), specs, P(GRAPH_AXIS, None), P(GRAPH_AXIS)),
        out_specs=P(),
    )
    def loss_fn(params, g, x_blk, y_blk):
        # Graph arrays are stacked [ndev, ...]; the local shard has a
        # leading axis of size 1 — drop it.
        g = {k: v[0] for k, v in g.items()}
        agg = lambda h, norm: dist_aggregate(
            h, g, block, norm, sg.recv_max
        )
        log_probs = model_apply_with_agg(model, params, x_blk, agg)
        nll = -jnp.take_along_axis(
            log_probs, y_blk[:, None].astype(jnp.int32), axis=1
        )[:, 0]
        local = jnp.sum(nll * g["node_mask"])
        return jax.lax.psum(local, GRAPH_AXIS) / total_nodes

    return loss_fn


def make_dist_train_step(
    mesh: Mesh, sg: ShardedGraph, model: str, lr: float = 0.01
):
    """Jitted multi-chip train step + init helper.

    Returns ``(step, init)`` where ``init(key, in_dim, hidden, classes, x, y)``
    places everything and ``step(params, opt_state, g, x, y)`` is one
    fwd+bwd+Adam update.
    """
    loss_fn = make_dist_loss_fn(mesh, sg, model)
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
        if x is not None:
            xp = np.zeros((sg.num_devices * sg.block, x.shape[1]), dtype=np.float32)
            xp[: x.shape[0]] = np.asarray(x)
            out.append(jax.device_put(jnp.asarray(xp), row_sharding))
        if y is not None:
            yp = np.zeros(sg.num_devices * sg.block, dtype=np.int32)
            yp[: y.shape[0]] = np.asarray(y)
            out.append(
                jax.device_put(jnp.asarray(yp), NamedSharding(mesh, P(GRAPH_AXIS)))
            )
        return tuple(out)

    return step, init

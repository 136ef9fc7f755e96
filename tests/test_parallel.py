"""Multi-chip runtime tests on the 8-device virtual CPU mesh
(SURVEY.md §4: multi-host tests via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.ops import reference
from gnnadvisor_osdi21_tpu.parallel.dist_ops import (
    device_graph_arrays,
    make_dist_loss_fn,
    make_dist_train_step,
)
from gnnadvisor_osdi21_tpu.parallel.mesh import make_mesh, GRAPH_AXIS
from gnnadvisor_osdi21_tpu.parallel.partition import shard_graph
from jax.sharding import NamedSharding, PartitionSpec as P


needs_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def dist_setup():
    g = synthesize_graph(600, 7000, num_features=16, num_classes=5, seed=11)
    sg = shard_graph(g, num_devices=8, part_size=4)
    mesh = make_mesh(8)
    return g, sg, mesh


def _padded(x, rows):
    out = np.zeros((rows,) + x.shape[1:], dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


@needs_8
def test_shard_plan_consistency(dist_setup):
    g, sg, _ = dist_setup
    assert sg.num_devices * sg.block >= g.num_nodes
    # every edge lands in exactly one (interior or boundary) part
    assert int(sg.int_lens.sum()) + int(sg.bnd_lens.sum()) == g.nnz
    # interior cols are strictly local; boundary cols within the table
    assert sg.int_cols.max() < sg.block
    assert sg.bnd_cols.max() < sg.table_rows
    # owners local, in range, and sorted within each class per device
    assert sg.int2local.max() < sg.block
    assert sg.bnd2local.max() < sg.block
    for d in range(sg.num_devices):
        assert np.all(np.diff(sg.int2local[d].astype(np.int64)) >= 0)
        assert np.all(np.diff(sg.bnd2local[d].astype(np.int64)) >= 0)


@needs_8
def test_dist_aggregate_matches_single_chip(dist_setup):
    """Distributed halo-exchange aggregation == single-chip oracle."""
    g, sg, mesh = dist_setup
    dim = 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, dim), dtype=np.float32)

    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    want = np.asarray(
        reference.gcn_aggregate(
            jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index),
            jnp.asarray(g.degrees), g.num_nodes,
        )
    )

    from functools import partial
    from jax import shard_map
    from gnnadvisor_osdi21_tpu.parallel.dist_ops import dist_aggregate, _graph_specs

    garr = device_graph_arrays(sg, mesh)
    xp = jax.device_put(
        jnp.asarray(_padded(x, sg.num_devices * sg.block)),
        NamedSharding(mesh, P(GRAPH_AXIS, None)),
    )

    @jax.jit
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_graph_specs(), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )
    def run(gd, x_blk):
        gd = {k: v[0] for k, v in gd.items()}
        return dist_aggregate(x_blk, gd, sg.block, norm=True)

    out = np.asarray(run(garr, xp))[: g.num_nodes]
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


@needs_8
@pytest.mark.parametrize("model,hidden", [("gcn", 16), ("gin", 32)])
def test_dist_training_runs_and_converges(dist_setup, model, hidden):
    g, sg, mesh = dist_setup
    step, init = make_dist_train_step(mesh, sg, model)
    x = g.init_embedding(16, seed=1)
    y = g.init_labels(g.num_classes)
    params, opt_state, garr, xd, yd = init(
        jax.random.PRNGKey(0), 16, hidden, g.num_classes, x, y
    )
    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, garr, xd, yd)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@needs_8
def test_dist_loss_matches_single_chip_loss(dist_setup):
    """Same params ⇒ multi-chip loss == single-chip loss (bitwise-ish)."""
    g, sg, mesh = dist_setup
    from gnnadvisor_osdi21_tpu.models import init_gcn, gcn_apply
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
    from gnnadvisor_osdi21_tpu.train import nll_loss

    params = init_gcn(jax.random.PRNGKey(3), 16, 16, g.num_classes)
    x = g.init_embedding(16, seed=2)
    y = g.init_labels(g.num_classes)

    gt = build_graph_tensors(g, method="ell", part_size=4)
    single = float(
        nll_loss(gcn_apply(params, jnp.asarray(x), (gt, gt)), jnp.asarray(y))
    )

    loss_fn = make_dist_loss_fn(mesh, sg, "gcn")
    garr = device_graph_arrays(sg, mesh)
    xd = jax.device_put(
        jnp.asarray(_padded(x, sg.num_devices * sg.block)),
        NamedSharding(mesh, P(GRAPH_AXIS, None)),
    )
    yd = jax.device_put(
        jnp.asarray(_padded(y.astype(np.int32), sg.num_devices * sg.block)),
        NamedSharding(mesh, P(GRAPH_AXIS)),
    )
    dist = float(jax.jit(loss_fn)(params, garr, xd, yd))
    assert abs(dist - single) < 1e-4 * max(1.0, abs(single))

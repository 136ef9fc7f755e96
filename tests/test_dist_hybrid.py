"""Multi-chip hybrid-layout runtime: the tuned three-tier kernel inside
shard_map must agree with the single-chip oracle (8-device virtual CPU
mesh; SURVEY.md §2.3 mandate (b) follow-up)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.ops import reference
from gnnadvisor_osdi21_tpu.parallel.dist_hybrid import (
    _graph_specs,
    device_graph_arrays,
    dist_hybrid_aggregate,
    make_dist_loss_fn,
    make_dist_train_step,
)
from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import shard_graph_hybrid
from gnnadvisor_osdi21_tpu.parallel.mesh import GRAPH_AXIS, make_mesh

needs_8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


@pytest.fixture(scope="module")
def setup():
    # community topology: after the (identity here) ordering some edges are
    # block-local ⇒ all three tiers are exercised with diag_b/hot_k forced on
    g = synthesize_graph(3000, 40000, num_features=16, num_classes=5,
                         kind="community", seed=3)
    sg = shard_graph_hybrid(g, num_devices=8, diag_b=512, hot_k=512)
    mesh = make_mesh(8)
    return g, sg, mesh


def _padded(x, rows):
    out = np.zeros((rows,) + x.shape[1:], dtype=x.dtype)
    out[: x.shape[0]] = x
    return out


def _edge_coverage(sg):
    """Edges represented across tiers (bit counts + residual mask bits)."""
    bits = int(np.unpackbits(sg.diag_bits.view(np.uint8)).sum())
    bits += int(np.unpackbits(sg.hot_bits.view(np.uint8)).sum())
    bits += int(np.unpackbits(sg.res_mask.view(np.uint8)).sum())
    return bits


@needs_8
def test_sharded_layout_covers_every_edge(setup):
    g, sg, _ = setup
    assert sg.num_devices * sg.block >= g.num_nodes
    assert sg.block % max(sg.diag_b, sg.res_ob) == 0
    assert _edge_coverage(sg) == g.nnz
    assert sg.res_gather.max() < sg.table_rows
    assert sg.hot_ids.max() < sg.table_rows
    for d in range(sg.num_devices):
        assert np.all(np.diff(sg.res_t2b[d].astype(np.int64)) >= 0)


@needs_8
@pytest.mark.parametrize("norm", [False, True])
@pytest.mark.parametrize("overlap", [True, False])
# the CPU mesh runs the SAME dtype contract as production (ADVICE r3):
# exact oracle match at f32, loose per-dtype tolerance at the bf16
# default (same split as verification.py's per-dtype tolerances)
@pytest.mark.parametrize("agg_dtype", ["float32", "bfloat16"])
def test_dist_hybrid_aggregate_matches_oracle(setup, norm, overlap, agg_dtype):
    g, sg, mesh = setup
    dim = 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, dim), dtype=np.float32)

    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    if norm:
        want = reference.gcn_aggregate(
            jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index),
            jnp.asarray(g.degrees), g.num_nodes,
        )
    else:
        want = reference.sag(
            jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index),
            g.num_nodes,
        )

    garr = device_graph_arrays(sg, mesh)
    xp = jax.device_put(
        jnp.asarray(_padded(x, sg.num_devices * sg.block)),
        NamedSharding(mesh, P(GRAPH_AXIS, None)),
    )

    @jax.jit
    @partial(
        shard_map, mesh=mesh,
        in_specs=(_graph_specs(sg), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )
    def run(gd, x_blk):
        gd = {k: v[0] for k, v in gd.items()}
        return dist_hybrid_aggregate(
            x_blk, sg, gd, norm, overlap=overlap, agg_dtype=agg_dtype
        )

    out = np.asarray(run(garr, xp))[: g.num_nodes]
    want = np.asarray(want)
    if agg_dtype == "float32":
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)
    else:
        # bf16 tier contraction: per-element error is relative to the
        # row's term magnitudes (cancellation makes tiny outputs with
        # O(scale·2^-8) absolute error), so the atol scales with the
        # output's dynamic range rather than pretending to be elementwise
        np.testing.assert_allclose(
            out, want, rtol=2e-2, atol=2e-2 * float(np.abs(want).max())
        )


@needs_8
def test_dist_hybrid_loss_matches_single_chip(setup):
    g, sg, mesh = setup
    from gnnadvisor_osdi21_tpu.models import gcn_apply, init_gcn
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
    from gnnadvisor_osdi21_tpu.train import nll_loss

    params = init_gcn(jax.random.PRNGKey(3), 16, 16, g.num_classes)
    x = g.init_embedding(16, seed=2)
    y = g.init_labels(g.num_classes)

    gt = build_graph_tensors(g, method="ell", part_size=4)
    single = float(
        nll_loss(gcn_apply(params, jnp.asarray(x), (gt, gt)), jnp.asarray(y))
    )

    loss_fn = make_dist_loss_fn(mesh, sg, "gcn", agg_dtype="float32")
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


@needs_8
def test_dist_hybrid_grads_match_single_chip(setup):
    """The custom VJP (adjoint = same distributed aggregation) produces the
    same parameter gradients as the single-chip oracle path."""
    g, sg, mesh = setup
    from gnnadvisor_osdi21_tpu.models import gcn_apply, init_gcn
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
    from gnnadvisor_osdi21_tpu.train import nll_loss

    params = init_gcn(jax.random.PRNGKey(3), 16, 16, g.num_classes)
    x = g.init_embedding(16, seed=2)
    y = g.init_labels(g.num_classes)

    gt = build_graph_tensors(g, method="ell", part_size=4)
    single = jax.grad(
        lambda p: nll_loss(gcn_apply(p, jnp.asarray(x), (gt, gt)), jnp.asarray(y))
    )(params)

    loss_fn = make_dist_loss_fn(mesh, sg, "gcn", agg_dtype="float32")
    garr = device_graph_arrays(sg, mesh)
    xd = jax.device_put(
        jnp.asarray(_padded(x, sg.num_devices * sg.block)),
        NamedSharding(mesh, P(GRAPH_AXIS, None)),
    )
    yd = jax.device_put(
        jnp.asarray(_padded(y.astype(np.int32), sg.num_devices * sg.block)),
        NamedSharding(mesh, P(GRAPH_AXIS)),
    )
    dist = jax.jit(jax.grad(loss_fn))(params, garr, xd, yd)
    for k in single:
        np.testing.assert_allclose(
            np.asarray(dist[k]), np.asarray(single[k]), rtol=2e-3, atol=2e-5
        )


@needs_8
@pytest.mark.parametrize("model,hidden", [("gcn", 16), ("gin", 32)])
def test_dist_hybrid_training_converges(setup, model, hidden):
    g, sg, mesh = setup
    # production-default bf16: convergence only asserts the loss decreases,
    # so this arm exercises the real dtype contract end-to-end on the mesh
    step, init = make_dist_train_step(mesh, sg, model)
    params, opt_state, garr, xd, yd = init(
        jax.random.PRNGKey(0), 16, hidden, g.num_classes,
        g.init_embedding(16, seed=1), g.init_labels(g.num_classes),
    )
    losses = []
    for _ in range(15):
        params, opt_state, loss = step(params, opt_state, garr, xd, yd)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@needs_8
def test_auto_tiers_sharded_build(setup):
    """Cost-model tier choice also produces a consistent sharded layout."""
    g, _, mesh = setup
    sg = shard_graph_hybrid(g, num_devices=8)
    assert _edge_coverage(sg) == g.nnz


def test_dist_transposed_kernel_branch_traces(monkeypatch):
    """The TPU-only transposed tier branch can't lower on the CPU mesh, but
    it must TRACE with the sharded shapes (jax.eval_shape runs all the
    pallas_call shape logic and asserts without compiling) — catches
    shape/layout bugs that would otherwise only surface on a real pod."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import gnnadvisor_osdi21_tpu.ops.hybrid_agg as ha
    import gnnadvisor_osdi21_tpu.parallel.dist_hybrid as dh
    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.parallel.hybrid_partition import (
        shard_graph_hybrid,
    )

    monkeypatch.setattr(ha, "_on_tpu", lambda: True)
    monkeypatch.setattr(dh, "_on_tpu", lambda: True)
    from gnnadvisor_osdi21_tpu.models import init_gcn
    from gnnadvisor_osdi21_tpu.parallel.mesh import make_mesh

    g = synthesize_graph(2048, 16000, num_features=16, kind="community",
                         seed=13)
    sg = shard_graph_hybrid(g, num_devices=4, diag_b=512, hot_k=512)
    mesh = make_mesh(4)
    loss_fn = dh.make_dist_loss_fn(mesh, sg, "gcn")
    garr = dh.device_graph_arrays(sg, mesh)
    params = init_gcn(jax.random.PRNGKey(0), 16, 8, 4)
    x = jnp.zeros((sg.num_devices * sg.block, 16), jnp.float32)
    y = jnp.zeros(sg.num_devices * sg.block, jnp.int32)
    out = jax.eval_shape(loss_fn, params, garr, x, y)
    assert out.shape == ()


def test_ragged_halo_plan_consistency():
    """The ragged exchange plan (send_flat/offsets/repack) must describe
    exactly the same rows as the dense send_idx plan, and the compact
    table must be smaller than the uniform-Hmax one on skewed graphs."""
    g = synthesize_graph(4096, 60000, num_features=8, kind="web", seed=11)
    sg = shard_graph_hybrid(g, num_devices=4, diag_b=512, hot_k=512)
    nd = sg.num_devices
    sizes = sg.halo_sizes  # [receiver, sender]
    assert sg.halo_send_sizes.T.tolist() == sizes.tolist()
    for s in range(nd):
        for r in range(nd):
            n = int(sizes[r, s])
            a = sg.send_flat[s, sg.halo_in_off[s, r]: sg.halo_in_off[s, r] + n]
            b = sg.send_idx[s, r, :n]
            assert a.tolist() == b.tolist()
            # repack points the receiver's compact segment at the dense slot
            off = int(sg.halo_out_off[s, r])
            want = (s * sg.halo + np.arange(n)).tolist()
            assert sg.halo_repack[r, off: off + n].tolist() == want
    # compact table never exceeds the dense one, and each receiver's total
    # matches its census
    assert sg.recv_max <= nd * sg.halo
    assert sg.ragged_exchange_rows <= sg.recv_max


# --------------------------------------------------------------------------
# Ragged exchange contract fuzzing (VERDICT r4 item 7): the emulated ragged
# gather table must match a per-pair oracle computed INDEPENDENTLY from the
# edge list (not via the shared plan-building code), across random device
# counts and heavily skewed per-pair halo sizes (zero pairs + one pair
# dominating — the post-rabbit wire distribution the plan exists for).
# --------------------------------------------------------------------------

from gnnadvisor_osdi21_tpu.graphs.loader import _from_edges
from gnnadvisor_osdi21_tpu.parallel.dist_ops import (
    _halo_exchange_ragged,
    _halo_exchange_ragged_t,
)


def _skewed_edges(rng, ndev):
    """Random edge list with a dominating cross-device pair and many
    zero-halo pairs: uniform edges target only the low half of the id
    space, plus a heavy slice from the first block to the last."""
    n = int(rng.integers(ndev * 520, ndev * 1600))
    m = 6 * n
    src = rng.integers(0, n, size=m).astype(np.int64)
    dst = rng.integers(0, max(n // 2, 1), size=m).astype(np.int64)
    k = m // 2
    lo = max(n // ndev, 1)
    src[:k] = rng.integers(0, lo, size=k)
    dst[:k] = rng.integers(n - lo, n, size=k)
    return _from_edges(src, dst, n, 8, 4), n


def _oracle_need(g, block, diag_b, ndev, exclude_diag):
    """Per-pair halo oracle straight from the CSR: unique source ids
    receiver r's rows reference on sender s (ascending — the plan's
    packing order)."""
    srcg = np.repeat(
        np.arange(g.num_nodes, dtype=np.int64), np.diff(g.row_pointers)
    )
    ci = np.asarray(g.column_index, dtype=np.int64)
    if exclude_diag and diag_b:
        keep = (srcg // diag_b) != (ci // diag_b)
        srcg, ci = srcg[keep], ci[keep]
    need = {}
    for r in range(ndev):
        for s in range(ndev):
            if r == s:
                need[(r, s)] = np.empty(0, dtype=np.int64)
                continue
            sel = (srcg // block == r) & (ci // block == s)
            need[(r, s)] = np.unique(ci[sel])
    return need


def _run_exchange_t(sg, mesh, fn, specs, garr, n_pad):
    """Ship x_t[1, n_pad] with value == global row id through the ragged
    exchange; return the per-device tables [ndev, block + recv_max]."""
    ids = jnp.arange(n_pad, dtype=jnp.float32)[None, :]
    xd = jax.device_put(ids, NamedSharding(mesh, P(None, GRAPH_AXIS)))

    @jax.jit
    @partial(
        shard_map, mesh=mesh, in_specs=(specs, P(None, GRAPH_AXIS)),
        out_specs=P(None, GRAPH_AXIS),
    )
    def ex(gd, x_t):
        gd = {k: v[0] for k, v in gd.items()}
        return fn(x_t, gd, sg.recv_max)

    out = np.asarray(ex(garr, xd))[0]
    return out.reshape(sg.num_devices, sg.block + sg.recv_max)


@needs_8
@pytest.mark.parametrize("seed", range(4))
def test_ragged_exchange_hybrid_fuzz_matches_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    ndev = int(rng.choice([2, 3, 5, 8]))
    g, n = _skewed_edges(rng, ndev)
    sg = shard_graph_hybrid(g, num_devices=ndev, diag_b=512, hot_k=0)
    need = _oracle_need(g, sg.block, sg.diag_b, ndev, exclude_diag=True)

    # census vs oracle (independent recomputation, not the plan builder)
    for r in range(ndev):
        for s in range(ndev):
            assert sg.halo_sizes[r, s] == len(need[(r, s)]), (r, s)
    sizes = sg.halo_sizes + np.eye(ndev, dtype=np.int32) * 10**9
    assert (sizes == 0).any(), "fuzz graph should produce zero-halo pairs"
    assert sg.halo_sizes.max() >= 4 * max(np.median(sg.halo_sizes), 1), (
        "fuzz graph should produce a dominating pair"
    )

    mesh = make_mesh(ndev)
    garr = device_graph_arrays(sg, mesh)
    tables = _run_exchange_t(
        sg, mesh, _halo_exchange_ragged_t, _graph_specs(sg), garr,
        ndev * sg.block,
    )
    for r in range(ndev):
        want_local = np.arange(r * sg.block, (r + 1) * sg.block)
        np.testing.assert_array_equal(tables[r, : sg.block], want_local)
        want_halo = np.concatenate([need[(r, s)] for s in range(ndev)])
        got = tables[r, sg.block : sg.block + len(want_halo)]
        np.testing.assert_array_equal(got, want_halo)


@needs_8
@pytest.mark.parametrize("seed", range(3))
def test_ragged_exchange_ell_fuzz_matches_oracle(seed):
    """Row-major twin over the ELL plan (shard_graph): the compact table
    must pack each receiver's remote-neighbor sets in sender order."""
    from gnnadvisor_osdi21_tpu.parallel import dist_ops
    from gnnadvisor_osdi21_tpu.parallel.partition import shard_graph

    rng = np.random.default_rng(200 + seed)
    ndev = int(rng.choice([2, 4, 8]))
    g, n = _skewed_edges(rng, ndev)
    sg = shard_graph(g, num_devices=ndev, part_size=4)
    need = _oracle_need(g, sg.block, 0, ndev, exclude_diag=False)

    for r in range(ndev):
        for s in range(ndev):
            assert sg.halo_sizes[r, s] == len(need[(r, s)]), (r, s)

    mesh = make_mesh(ndev)
    garr = dist_ops.device_graph_arrays(sg, mesh)
    n_pad = ndev * sg.block
    ids = jnp.arange(n_pad, dtype=jnp.float32)[:, None]
    xd = jax.device_put(ids, NamedSharding(mesh, P(GRAPH_AXIS, None)))

    @jax.jit
    @partial(
        shard_map, mesh=mesh,
        in_specs=(dist_ops._graph_specs(), P(GRAPH_AXIS, None)),
        out_specs=P(GRAPH_AXIS, None),
    )
    def ex(gd, x_blk):
        gd = {k: v[0] for k, v in gd.items()}
        return _halo_exchange_ragged(x_blk, gd, sg.recv_max)

    out = np.asarray(ex(garr, xd))[:, 0]
    tables = out.reshape(ndev, sg.block + sg.recv_max)
    for r in range(ndev):
        np.testing.assert_array_equal(
            tables[r, : sg.block], np.arange(r * sg.block, (r + 1) * sg.block)
        )
        want_halo = np.concatenate([need[(r, s)] for s in range(ndev)])
        got = tables[r, sg.block : sg.block + len(want_halo)]
        np.testing.assert_array_equal(got, want_halo)


def test_plan_bytes_tpu_smaller_than_dense():
    """The per-backend plan payload report: on skewed graphs the TPU
    ragged sender plan is much smaller per device than the CPU-mesh dense
    emulation payload (VERDICT r4 item 8's reporting criterion)."""
    rng = np.random.default_rng(42)
    for ndev in (8, 64):
        g, _ = _skewed_edges(rng, 8)
        sg = shard_graph_hybrid(g, num_devices=ndev, diag_b=512, hot_k=0)
        tpu, cpu = sg.plan_bytes("tpu"), sg.plan_bytes("cpu")
        assert 0 < tpu < cpu, (ndev, tpu, cpu)


@needs_8
def test_dist_res_formulations_match_oracle(monkeypatch):
    """Both dist residual gather formulations (single-stage precomposed
    table ids vs two-stage compact) produce the oracle aggregate; the
    plan ships res_gather only for the two-stage build."""
    import gnnadvisor_osdi21_tpu.graphs.hybrid as H

    g = synthesize_graph(3000, 40000, num_features=16, num_classes=5,
                         kind="community", seed=3)
    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    want = np.asarray(reference.sag(
        jnp.asarray(g.init_embedding(8, seed=0)), jnp.asarray(src),
        jnp.asarray(g.column_index), g.num_nodes,
    ))
    x = g.init_embedding(8, seed=0)
    mesh = make_mesh(8)
    for force_two in (False, True):
        if force_two:
            monkeypatch.setattr(H, "GATHER_SINGLE_NS", 1e9)
        else:
            monkeypatch.setattr(H, "GATHER_SINGLE_NS", 2.1)
        sg = shard_graph_hybrid(g, num_devices=8, diag_b=512, hot_k=512)
        assert sg.res_single == (not force_two)
        garr = device_graph_arrays(sg, mesh)
        assert ("res_gather" in garr) == force_two
        xp = jax.device_put(
            jnp.asarray(_padded(x, sg.num_devices * sg.block)),
            NamedSharding(mesh, P(GRAPH_AXIS, None)),
        )

        @jax.jit
        @partial(
            shard_map, mesh=mesh,
            in_specs=(_graph_specs(sg), P(GRAPH_AXIS, None)),
            out_specs=P(GRAPH_AXIS, None),
        )
        def run(gd, x_blk):
            gd = {k: v[0] for k, v in gd.items()}
            return dist_hybrid_aggregate(
                x_blk, sg, gd, norm=False, agg_dtype="float32"
            )

        out = np.asarray(run(garr, xp))[: g.num_nodes]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

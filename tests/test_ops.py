"""Aggregation-op correctness: every production path vs the pure-JAX oracle,
and custom VJPs vs the reference backward math (the unitest.py analog,
reference unitest.py:9-63, extended with gradient checks per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.ops import reference
from gnnadvisor_osdi21_tpu.ops.aggregate import aggregate, gcn_conv, gin_conv, sag
from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors

METHODS = ["ell", "dense", "coo"]


def _coo(graph):
    src = reference.csr_to_coo(graph.row_pointers, graph.column_index)
    return jnp.asarray(src), jnp.asarray(graph.column_index)


@pytest.fixture(scope="module", params=[16, 128])
def dim(request):
    return request.param


def _x(graph, dim, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((graph.num_nodes, dim), dtype=np.float32))


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("norm", [False, True])
def test_aggregate_matches_oracle(skewed_graph, method, norm, dim):
    g = skewed_graph
    x = _x(g, dim)
    gt = build_graph_tensors(g, method=method, part_size=4)
    out = aggregate(x, gt, norm)
    src, dst = _coo(g)
    if norm:
        want = reference.gcn_aggregate(x, src, dst, jnp.asarray(g.degrees), g.num_nodes)
    else:
        want = reference.sag(x, src, dst, g.num_nodes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_sag_all_ones_matches_degree(skewed_graph):
    """The reference's unitest fixture: X = ones ⇒ SAG(X)[s] = out-degree[s]
    broadcast across features (unitest.py:27-50)."""
    g = skewed_graph
    x = jnp.ones((g.num_nodes, 16), dtype=jnp.float32)
    gt = build_graph_tensors(g, method="ell", part_size=8)
    out = np.asarray(sag(x, gt))
    deg = (g.row_pointers[1:] - g.row_pointers[:-1]).astype(np.float32)
    np.testing.assert_allclose(out, np.repeat(deg[:, None], 16, axis=1), rtol=1e-5)


@pytest.mark.parametrize("method", METHODS)
def test_gcn_conv_forward(skewed_graph, method, dim):
    g = skewed_graph
    x = _x(g, dim)
    w = _x(g, dim, seed=1)[: dim].T[:, :8]  # [dim, 8]
    w = jnp.asarray(np.random.default_rng(1).standard_normal((dim, 8), dtype=np.float32))
    gt = build_graph_tensors(g, method=method, part_size=4)
    out = gcn_conv(x, w, gt)
    src, dst = _coo(g)
    want = reference.gcn_forward(x, w, src, dst, jnp.asarray(g.degrees), g.num_nodes)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("method", METHODS)
def test_gcn_conv_backward_matches_reference(skewed_graph, method):
    """Our custom VJP must reproduce the reference backward exactly —
    including its un-transposed aggregation (spmm_backward_cuda,
    GNNAdvisor_kernel.cu:422-476) — even on a *directed* graph."""
    g = skewed_graph
    x = _x(g, 16)
    w = jnp.asarray(np.random.default_rng(2).standard_normal((16, 8), dtype=np.float32))
    gt = build_graph_tensors(g, method=method, part_size=4)
    d_out = _x(g, 8, seed=3)[:, :8]

    _, vjp = jax.vjp(lambda x_, w_: gcn_conv(x_, w_, gt), x, w)
    dx, dw = vjp(d_out)

    src, dst = _coo(g)
    want_dx, want_dw = reference.gcn_backward(
        d_out, x, w, src, dst, jnp.asarray(g.degrees), g.num_nodes
    )
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(want_dw), rtol=1e-3, atol=1e-3)


def test_gcn_grad_exact_on_symmetric_graph(small_graph):
    """On an undirected graph the reference backward IS the true gradient;
    check our custom VJP against plain JAX autodiff of the oracle."""
    g = small_graph
    x = _x(g, 12)
    w = jnp.asarray(np.random.default_rng(4).standard_normal((12, 6), dtype=np.float32))
    gt = build_graph_tensors(g, method="ell", part_size=4)
    src, dst = _coo(g)
    deg = jnp.asarray(g.degrees)

    def loss_ours(x_, w_):
        return (gcn_conv(x_, w_, gt) ** 2).sum()

    def loss_oracle(x_, w_):
        return (reference.gcn_forward(x_, w_, src, dst, deg, g.num_nodes) ** 2).sum()

    gx, gw = jax.grad(loss_ours, argnums=(0, 1))(x, w)
    ox, ow = jax.grad(loss_oracle, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(ox), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ow), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("method", METHODS)
def test_gin_conv_forward_and_backward(skewed_graph, method):
    g = skewed_graph
    eps = 0.5
    x = _x(g, 16)
    w = jnp.asarray(np.random.default_rng(5).standard_normal((16, 8), dtype=np.float32))
    gt = build_graph_tensors(g, method=method, part_size=4)
    src, dst = _coo(g)

    out = gin_conv(x, w, gt, eps)
    want, x_agg = reference.gin_forward(x, w, src, dst, g.num_nodes, eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-4, atol=1e-4)

    d_out = _x(g, 8, seed=6)[:, :8]
    _, vjp = jax.vjp(lambda x_, w_: gin_conv(x_, w_, gt, eps), x, w)
    dx, dw = vjp(d_out)
    want_dx, want_dw = reference.gin_backward(d_out, x_agg, w, src, dst, g.num_nodes, eps)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(want_dw), rtol=1e-3, atol=1e-3)


def test_aggregate_under_jit_with_graph_closure(skewed_graph):
    g = skewed_graph
    x = _x(g, 16)
    gt = build_graph_tensors(g, method="ell", part_size=4)

    @jax.jit
    def f(x_):
        return aggregate(x_, gt, True).sum()

    assert np.isfinite(float(f(x)))
    assert np.isfinite(float(jax.grad(f)(x).sum()))


@pytest.mark.parametrize("norm", [False, True])
def test_ell_chunked_matches_unchunked(skewed_graph, norm, monkeypatch):
    """The lax.map-chunked ELL pass (big part_size × dim products, s7-4_1
    study grid) must agree exactly with the single-shot pass."""
    import importlib

    agg_mod = importlib.import_module("gnnadvisor_osdi21_tpu.ops.aggregate")

    g = skewed_graph
    x = _x(g, 32)
    gt = build_graph_tensors(g, method="ell", part_size=8)
    want = np.asarray(aggregate(x, gt, norm))
    # force chunking (several chunks, plus a ragged tail)
    monkeypatch.setattr(agg_mod, "_ELL_SCRATCH_BUDGET", 8 * 32 * 4 * 3)
    out = np.asarray(aggregate(x, gt, norm))
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)


def test_gemm_dtype_bfloat16_close_to_f32():
    """The opt-in bf16 model-stack GEMM (GraphTensors.gemm_dtype) matches
    the f32 default within bf16 rounding, forward and backward, and the
    default stays exactly the f32 path."""
    import dataclasses

    import jax
    import numpy as np

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.ops.aggregate import gcn_conv, gin_conv
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors

    g = synthesize_graph(600, 5000, num_features=24, kind="powerlaw", seed=3)
    gt32 = build_graph_tensors(g, method="ell", part_size=4)
    assert gt32.gemm_dtype == "float32"
    gt16 = dataclasses.replace(gt32, gemm_dtype="bfloat16")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((g.num_nodes, 24)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((24, 8)).astype(np.float32))

    for conv in (gcn_conv, gin_conv):
        def loss(gt):
            return lambda x_, w_: (conv(x_, w_, gt) ** 2).mean()

        o32 = np.asarray(conv(x, w, gt32))
        o16 = np.asarray(conv(x, w, gt16))
        scale = np.abs(o32).max()
        np.testing.assert_allclose(o16, o32, atol=2e-2 * scale, rtol=2e-2)
        g32 = jax.grad(loss(gt32), argnums=1)(x, w)
        g16 = jax.grad(loss(gt16), argnums=1)(x, w)
        gs = float(np.abs(np.asarray(g32)).max())
        np.testing.assert_allclose(
            np.asarray(g16), np.asarray(g32), atol=3e-2 * gs, rtol=3e-2
        )

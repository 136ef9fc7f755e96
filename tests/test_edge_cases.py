"""Degenerate-input robustness: empty/self-loop/star graphs, tiny dims."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid
from gnnadvisor_osdi21_tpu.graphs.loader import GraphCSR, _from_edges
from gnnadvisor_osdi21_tpu.ops import reference
from gnnadvisor_osdi21_tpu.ops.aggregate import sag
from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors


def _graph(src, dst, n):
    return _from_edges(
        np.asarray(src, np.int64), np.asarray(dst, np.int64), n, 8, 3
    )


def _check_all_paths(g, dim=8):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, dim), dtype=np.float32)
    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    want = np.asarray(
        reference.sag(jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index), g.num_nodes)
    )
    for method in ("ell", "dense", "coo"):
        gt = build_graph_tensors(g, method=method, part_size=2)
        got = np.asarray(sag(jnp.asarray(x), gt))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=method)
    hg = build_hybrid(g, hot_k=0)
    ht = build_hybrid_tensors(hg)
    got = hg.unpad_array(np.asarray(sag(jnp.asarray(hg.pad_array(x)), ht)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg="hybrid")


def test_graph_with_no_edges():
    g = _graph([], [], 5)
    assert g.nnz == 0
    _check_all_paths(g)


def test_self_loops_only():
    g = _graph([0, 1, 2], [0, 1, 2], 3)
    _check_all_paths(g)


def test_star_graph():
    # one hub referenced by everyone (extreme in-degree skew)
    n = 64
    g = _graph(list(range(1, n)), [0] * (n - 1), n)
    _check_all_paths(g)


def test_single_node_self_loop():
    g = _graph([0], [0], 1)
    _check_all_paths(g)


def test_hybrid_with_hot_on_star():
    n = 2048
    src = list(range(1, n)) + [0]
    dst = [0] * (n - 1) + [1]
    g = _graph(src, dst, n)
    hg = build_hybrid(g, hot_k=512, diag_b=0)
    ht = build_hybrid_tensors(hg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, 8), dtype=np.float32)
    srcc = reference.csr_to_coo(g.row_pointers, g.column_index)
    want = np.asarray(
        reference.sag(jnp.asarray(x), jnp.asarray(srcc), jnp.asarray(g.column_index), n)
    )
    got = hg.unpad_array(np.asarray(sag(jnp.asarray(hg.pad_array(x)), ht)))
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_dim_one_features():
    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph

    g = synthesize_graph(300, 2000, seed=8)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((g.num_nodes, 1), dtype=np.float32)
    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    want = np.asarray(
        reference.sag(jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index), g.num_nodes)
    )
    gt = build_graph_tensors(g, method="ell", part_size=4)
    np.testing.assert_allclose(
        np.asarray(sag(jnp.asarray(x), gt)), want, rtol=1e-4, atol=1e-5
    )

"""Rabbit-reordering tests (reference rabbit_module semantics)."""

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.graphs.reorder import (
    rabbit_permutation,
    rabbit_reorder_graph,
    reorder,
)


def test_permutation_is_valid(skewed_graph):
    g = skewed_graph
    perm = rabbit_permutation(g.edge_index, g.num_nodes)
    assert sorted(perm) == list(range(g.num_nodes))


def test_reorder_api_shape(skewed_graph):
    g = skewed_graph
    out = reorder(g.edge_index, g.num_nodes)
    assert out.shape == g.edge_index.shape
    assert out.max() < g.num_nodes


def test_reorder_preserves_graph_structure(small_graph):
    """Degree multiset is invariant under relabeling."""
    g = small_graph
    g2 = rabbit_reorder_graph(g)
    deg1 = np.sort(np.diff(g.row_pointers))
    deg2 = np.sort(np.diff(g2.row_pointers))
    np.testing.assert_array_equal(deg1, deg2)
    assert g2.nnz == g.nnz
    assert g2.reordered


def test_reorder_improves_community_locality():
    """On a planted-community graph with scattered labels, reordering should
    substantially shrink the mean edge span (the reference's motivation,
    README 'community detection')."""
    g = synthesize_graph(800, 12000, kind="community", seed=9)
    span_before = np.mean(np.abs(g.edge_index[0] - g.edge_index[1]))
    g2 = rabbit_reorder_graph(g)
    span_after = np.mean(np.abs(g2.edge_index[0] - g2.edge_index[1]))
    assert span_after < span_before * 0.7

"""Neighbor-group partition builder tests (the build_part analog,
reference GNNAdvisor.cpp:210-251 / SURVEY.md §2.1 #1)."""

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.partition import (
    build_neighbor_groups,
    groups_to_ragged,
)


def _naive_parts(row_pointers, column_index, part_size):
    """Straightforward per-node split, the way the reference C++ loop does it."""
    parts = []
    for node in range(len(row_pointers) - 1):
        beg, end = row_pointers[node], row_pointers[node + 1]
        for s in range(beg, end, part_size):
            parts.append((node, list(column_index[s : min(s + part_size, end)])))
    return parts


def test_groups_match_naive(skewed_graph):
    g = skewed_graph
    for part_size in (1, 3, 4, 16):
        groups = build_neighbor_groups(g.row_pointers, g.column_index, part_size)
        naive = _naive_parts(g.row_pointers, g.column_index, part_size)
        assert groups.num_real_parts == len(naive)
        for p, (node, cols) in enumerate(naive):
            assert groups.part2node[p] == node
            assert groups.part_lens[p] == len(cols)
            np.testing.assert_array_equal(
                groups.part_cols[p, : len(cols)], np.array(cols, dtype=np.int32)
            )


def test_every_edge_covered_exactly_once(skewed_graph):
    g = skewed_graph
    groups = build_neighbor_groups(g.row_pointers, g.column_index, 8)
    total_valid = int(groups.part_lens.sum())
    assert total_valid == g.nnz


def test_part2node_sorted_including_padding(skewed_graph):
    g = skewed_graph
    groups = build_neighbor_groups(g.row_pointers, g.column_index, 5, pad_parts_to=64)
    assert groups.num_parts % 64 == 0
    assert np.all(np.diff(groups.part2node.astype(np.int64)) >= 0)
    # Padding rows contribute nothing.
    assert np.all(groups.part_lens[groups.num_real_parts :] == 0)


def test_ragged_roundtrip(skewed_graph):
    """partPtr/part2Node recovered from the rectangle match the reference
    descriptor contract: partPtr deltas = part lengths, monotone."""
    g = skewed_graph
    groups = build_neighbor_groups(g.row_pointers, g.column_index, 4)
    part_ptr, part2node = groups_to_ragged(groups)
    assert part_ptr[-1] == g.nnz
    assert np.all(np.diff(part_ptr) >= 1)
    assert np.all(np.diff(part_ptr) <= 4)
    assert len(part2node) == groups.num_real_parts


def test_zero_degree_nodes():
    rp = np.array([0, 0, 2, 2, 3], dtype=np.int32)
    ci = np.array([1, 3, 0], dtype=np.int32)
    groups = build_neighbor_groups(rp, ci, 2)
    # Nodes 0 and 2 have no neighbors -> no parts.
    assert groups.num_real_parts == 2
    assert list(groups.part2node[:2]) == [1, 3]
    assert list(groups.part_lens[:2]) == [2, 1]

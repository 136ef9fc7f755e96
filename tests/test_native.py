"""Native C++ graphtools tests (parser / rabbit / build_parts parity)."""

import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph

gt = pytest.importorskip(
    "gnnadvisor_osdi21_tpu.native.graphtools", reason="toolchain unavailable"
)
try:
    gt.get_lib()
except Exception:
    pytest.skip("native build failed", allow_module_level=True)


def test_parse_edge_list(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# header\n0 1\n1 2\n\n2 0\n10 3\n")
    src, dst = gt.parse_edge_list(str(p))
    pairs = sorted(zip(src.tolist(), dst.tolist()))
    assert pairs == [(0, 1), (1, 2), (2, 0), (10, 3)]


def test_rabbit_matches_python_quality():
    from gnnadvisor_osdi21_tpu.graphs.reorder import rabbit_permutation as py_perm

    g = synthesize_graph(1200, 15000, kind="community", seed=6)
    perm_c = gt.rabbit_permutation(g.edge_index, g.num_nodes)
    assert sorted(perm_c) == list(range(g.num_nodes))
    span = lambda gg: np.mean(np.abs(gg.edge_index[0] - gg.edge_index[1]))
    span_c = span(g.apply_permutation(perm_c))
    span_p = span(g.apply_permutation(py_perm(g.edge_index, g.num_nodes)))
    # same algorithm ⇒ same locality ballpark
    assert span_c <= span_p * 1.2
    assert span_c < span(g) * 0.7


def test_build_parts_matches_numpy():
    from gnnadvisor_osdi21_tpu.graphs.partition import (
        build_neighbor_groups,
        groups_to_ragged,
    )

    g = synthesize_graph(500, 6000, kind="powerlaw", seed=7)
    for ps in (1, 4, 16):
        pp, p2n = gt.build_parts(g.row_pointers, ps)
        groups = build_neighbor_groups(g.row_pointers, g.column_index, ps)
        pp2, p2n2 = groups_to_ragged(groups)
        np.testing.assert_array_equal(np.diff(pp), np.diff(pp2))
        np.testing.assert_array_equal(p2n, p2n2)

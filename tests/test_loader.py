"""Graph loader tests (reference dataset.py:20-175 semantics)."""

import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.graphs.loader import build_csr, load_graph, synthesize_graph


def test_build_csr_dedups_and_sorts():
    ei = np.array([[1, 0, 1, 1, 0], [0, 2, 0, 2, 2]])  # (1,0) duplicated, (0,2) dup
    rp, ci = build_csr(ei, 3)
    np.testing.assert_array_equal(rp, [0, 1, 3, 3])
    np.testing.assert_array_equal(ci, [2, 0, 2])


def test_txt_loader(tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("0 1\n1 2\n2 0\n2 1\n")
    g = load_graph(str(p), load_from_txt=True, use_native_parser=False)
    assert g.num_nodes == 3
    assert g.num_edges == 4
    assert g.avg_degree == pytest.approx(4 / 3)
    # avg_edgeSpan = mean(|0-1|,|1-2|,|2-0|,|2-1|) = 5/4
    assert g.avg_edgeSpan == pytest.approx(1.25)
    np.testing.assert_array_equal(g.row_pointers, [0, 1, 2, 4])


def test_npz_loader(tmp_path):
    p = tmp_path / "g.npz"
    np.savez(
        p, src_li=np.array([0, 1, 3]), dst_li=np.array([1, 3, 0]), num_nodes=5
    )
    g = load_graph(str(p))
    assert g.num_nodes == 5
    assert g.nnz == 3
    # degrees = sqrt(max(deg,1)): node 2 and 4 have degree 0 -> 1.0
    np.testing.assert_allclose(g.degrees, [1, 1, 1, 1, 1])


def test_degrees_sqrt_semantics():
    g = synthesize_graph(50, 400, seed=1)
    deg = (g.row_pointers[1:] - g.row_pointers[:-1]).astype(np.float64)
    np.testing.assert_allclose(
        g.degrees, np.sqrt(np.maximum(deg, 1.0)), rtol=1e-6
    )


def test_masks():
    g = synthesize_graph(100, 500)
    train, val, test = g.masks()
    assert train.sum() == 100 and val.sum() == 30 and test.sum() == 10


def test_synth_kinds():
    for kind in ("uniform", "powerlaw", "community"):
        g = synthesize_graph(300, 3000, kind=kind, seed=2)
        assert g.num_nodes == 300
        assert g.nnz > 0
        assert np.all(np.asarray(g.column_index) < 300)
        assert g.row_pointers[-1] == g.nnz


def test_compound_synthesis_structure():
    """Type II synthesis must look like a TUDataset compound collection:
    many small disjoint components with contiguous ids, avg degree ~2+
    (loader 'compound' kind; see bench/datasets.py Type II entries)."""
    import numpy as np
    import scipy.sparse as sp

    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph

    g = synthesize_graph(20000, 42000, kind="compound", seed=3)
    n = g.num_nodes
    src = np.repeat(np.arange(n, dtype=np.int64),
                    np.diff(np.asarray(g.row_pointers)))
    ci = np.asarray(g.column_index, dtype=np.int64)
    adj = sp.coo_matrix((np.ones(len(src)), (src, ci)), shape=(n, n)).tocsr()
    ncomp, labels = sp.csgraph.connected_components(adj, directed=False)
    sizes = np.bincount(labels)
    assert ncomp > 100 and sizes.max() <= 160
    # contiguous ids per component -> near-total diagonal-block coverage
    cov = np.mean(src // 512 == ci // 512)
    assert cov > 0.9
    # symmetric backbone: every node reachable (no isolated vertices)
    assert sizes.min() >= 2

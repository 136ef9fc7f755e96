"""Decider ("Advisor") tests — the param.py:51-120 analog."""

import math

import numpy as np

from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.tuner.decider import InputProperty, DENSE_MAX_NODES


def test_auto_small_graph_picks_dense():
    g = synthesize_graph(500, 4000, seed=0)
    prop = InputProperty(g, hidden_dim=16).decider()
    assert prop.layer_input.method == "dense"


def test_auto_large_graph_picks_hybrid():
    g = synthesize_graph(DENSE_MAX_NODES + 1000, 50000, seed=0)
    prop = InputProperty(g, hidden_dim=16).decider()
    assert prop.layer_input.method == "hybrid"


def test_manual_mode_passes_params_through():
    g = synthesize_graph(2000, 20000, seed=1)
    prop = InputProperty(
        g, hidden_dim=16, part_size=24, method="ell",
        manual_mode=True,
    ).decider()
    assert prop.layer_input.method == "ell"
    assert prop.layer_input.part_size == 24


def test_auto_part_size_minimizes_measured_ell_cost():
    """Auto partSize comes from the measured ELL cost law (slots x
    ELL_SLOT_NS + parts x ELL_PART_NS over the degree histogram), not the
    reference's mean-degree rule — the round-3 study showed optimum ~8 on
    every hub-skewed Type III graph while int(avg_degree) picked 16-32."""
    import numpy as np

    from gnnadvisor_osdi21_tpu.tuner.decider import ELL_PART_NS, ELL_SLOT_NS

    g = synthesize_graph(3000, 90000, seed=2)  # avg degree ~30
    prop = InputProperty(g, hidden_dim=16, method="ell").decider()
    picked = prop.layer_input.part_size
    deg = np.diff(np.asarray(g.row_pointers, dtype=np.int64))

    def cost(p):
        parts = int(-(-deg // p).sum())
        return ELL_SLOT_NS * parts * p + ELL_PART_NS * parts

    assert cost(picked) == min(cost(p) for p in (2, 4, 8, 16, 32, 64))


def test_auto_part_size_prefers_small_parts_on_hub_skew():
    """Hub-skewed degree distributions (web-graph-like) land at a small
    partSize — the measured optimum regime (logs/study_partsize.csv)."""
    g = synthesize_graph(20000, 300000, kind="web", seed=5)
    prop = InputProperty(g, hidden_dim=16, method="ell").decider()
    assert prop.layer_input.part_size <= 8


def test_per_layer_feature_tiles_differ():
    g = synthesize_graph(2000, 20000, num_features=256, seed=3)
    prop = InputProperty(g, hidden_dim=16, method="ell").decider()
    # input layer dim 256 -> tile capped at 128; hidden dim 16 -> 16
    assert prop.layer_input.feature_tile == 128
    assert prop.layer_hidden.feature_tile == 16


def test_reorder_heuristic_matches_reference_formula():
    g = synthesize_graph(5000, 50000, kind="community", seed=4)
    prop = InputProperty(g, hidden_dim=16, enable_reorder=True).decider()
    expected = math.sqrt(g.avg_edgeSpan) > math.sqrt(g.num_nodes) / 100.0
    assert prop.reorder_status == expected
    if expected:
        assert prop.graph.reordered


def test_hybrid_build_tensors_and_padding_roundtrip():
    g = synthesize_graph(6000, 60000, seed=5)
    prop = InputProperty(g, hidden_dim=16).decider()
    gts = prop.build_tensors()
    assert gts[0].method == "hybrid"
    a = np.arange(prop.graph.num_nodes, dtype=np.float32)
    np.testing.assert_array_equal(prop.unpad_outputs(prop.pad_features(a)), a)


def test_fused_slab_vmem_accounting_prices_both_slabs():
    """The fused pass unpacks diag AND hot slabs per grid step; block_parts
    must leave room for their combined unpacked width in VMEM (v4 kernels:
    bf16 one-hot matrices and bf16 x tiles, f32 accumulator tile)."""
    g = synthesize_graph(20000, 200000, num_features=16, kind="web", seed=1)
    prop = InputProperty(
        g, hidden_dim=16, method="hybrid", manual_mode=True,
        diag_b=4096, hot_k=4096, enable_reorder=False,
    ).decider()
    bp = prop.layer_input.block_parts
    td = prop.layer_input.feature_tile
    combined = 4096 + 4096
    unpacked = bp * combined * 2          # two 0/1 bf16 matrices
    bits = 2 * bp * combined // 8         # double-buffered slab bits
    x_tiles = 2 * combined * td * 2
    out = 2 * bp * td * 4
    assert unpacked + bits + x_tiles + out <= prop.vmem_budget

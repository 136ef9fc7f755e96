"""Hybrid diag/hot/residual layout + aggregation tests (vs the COO oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.graphs.hybrid import (
    build_hybrid, choose_hot_k, choose_tiers,
)
from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.ops import reference
from gnnadvisor_osdi21_tpu.ops.aggregate import aggregate, gcn_conv
from gnnadvisor_osdi21_tpu.ops.hybrid_agg import (
    build_hybrid_tensors, with_geometry,
)


def _oracle(g, x, norm):
    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    if norm:
        return np.asarray(reference.gcn_aggregate(
            jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index),
            jnp.asarray(g.degrees), g.num_nodes,
        ))
    return np.asarray(reference.sag(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index),
        g.num_nodes,
    ))


@pytest.fixture(scope="module", params=["powerlaw", "community"])
def hybrid_setup(request):
    g = synthesize_graph(3000, 40000, num_features=16, kind=request.param, seed=5)
    hg = build_hybrid(g, hot_k=512, diag_b=512)
    ht = build_hybrid_tensors(hg)
    return g, hg, ht


def _popcount(bits):
    return sum(int(bin(w).count("1")) for w in np.asarray(bits).reshape(-1))


def test_layout_accounts_every_edge(hybrid_setup):
    g, hg, _ = hybrid_setup
    assert _popcount(hg.hot_bits) == hg.num_hot_edges
    assert _popcount(hg.diag_bits) == hg.num_diag_edges
    # every residual edge is exactly one multi-hot bit
    assert _popcount(hg.res_mask) == hg.num_res_edges
    assert hg.num_res_pairs <= hg.num_res_edges
    real_slots = int((hg.res_mask != 0).any(axis=0).sum())
    assert real_slots == hg.num_res_pairs
    assert hg.num_hot_edges + hg.num_diag_edges + hg.num_res_edges == g.nnz


def test_pad_unpad_roundtrip(hybrid_setup):
    g, hg, _ = hybrid_setup
    a = np.arange(g.num_nodes, dtype=np.float32)
    assert np.array_equal(hg.unpad_array(hg.pad_array(a)), a)


def test_hybrid_aggregate_matches_oracle(hybrid_setup):
    g, hg, ht = hybrid_setup
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, 16), dtype=np.float32)
    for norm in (False, True):
        want = _oracle(g, x, norm)
        out = aggregate(jnp.asarray(hg.pad_array(x)), ht, norm)
        got = hg.unpad_array(np.asarray(out))
        # all tiers run f32: only addition-order differences remain
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "tiers",
    [
        {"hot_k": 0, "diag_b": 0},      # residual only
        {"hot_k": 512, "diag_b": 0},    # hot + residual
        {"hot_k": 0, "diag_b": 512},    # diag + residual
        {"hot_k": 1024, "diag_b": 1024},
    ],
)
def test_each_tier_combination_matches_oracle(tiers):
    g = synthesize_graph(2500, 30000, num_features=8, kind="community", seed=7)
    hg = build_hybrid(g, **tiers)
    assert hg.hot_k == tiers["hot_k"] and hg.diag_b == tiers["diag_b"]
    ht = build_hybrid_tensors(hg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((g.num_nodes, 8), dtype=np.float32)
    want = _oracle(g, x, False)
    got = hg.unpad_array(np.asarray(aggregate(jnp.asarray(hg.pad_array(x)), ht, False)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_geometry_does_not_change_results():
    """Decider geometry (block_rows / feature_tile) must change kernel
    tiling only — results stay put (and the meta actually changes)."""
    g = synthesize_graph(2000, 25000, num_features=8, seed=9)
    hg = build_hybrid(g, hot_k=512, diag_b=512)
    ht_a = build_hybrid_tensors(hg, block_rows=512, feature_tile=128)
    ht_b = with_geometry(ht_a, 128, 8)
    assert (ht_b.block_rows, ht_b.feature_tile) == (128, 8)
    assert ht_b.diag_bits is ht_a.diag_bits  # shared device arrays
    rng = np.random.default_rng(2)
    x = jnp.asarray(hg.pad_array(rng.standard_normal((g.num_nodes, 8), dtype=np.float32)))
    np.testing.assert_allclose(
        np.asarray(aggregate(x, ht_a, False)),
        np.asarray(aggregate(x, ht_b, False)),
        rtol=1e-6, atol=1e-6,
    )


def test_hybrid_gcn_conv_grads(hybrid_setup):
    g, hg, ht = hybrid_setup
    rng = np.random.default_rng(1)
    x = jnp.asarray(hg.pad_array(rng.standard_normal((g.num_nodes, 16), dtype=np.float32)))
    w = jnp.asarray(rng.standard_normal((16, 8), dtype=np.float32))

    def loss(x_, w_):
        return (gcn_conv(x_, w_, ht) ** 2).sum()

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gw)).all()


def test_choose_hot_k_prefers_skew():
    """At a node count where a hot column costs more slab area than a flat
    graph's per-column coverage can repay, only the skewed graph earns a
    hot tier.  (At small N the v3 constants make hot columns profitable
    even for uniform graphs — both pick the max — so the discriminating
    regime is sparse-and-large.)"""
    skew = synthesize_graph(200000, 400000, kind="powerlaw", seed=2, zipf_a=1.5)
    flat = synthesize_graph(200000, 400000, kind="uniform", seed=2)
    k_skew = choose_hot_k(skew.column_index, skew.num_nodes, skew.nnz)
    k_flat = choose_hot_k(flat.column_index, flat.num_nodes, flat.nnz)
    assert k_skew > k_flat == 0


def test_choose_tiers_manual_passthrough():
    g = synthesize_graph(3000, 20000, seed=4)
    src = np.repeat(np.arange(g.num_nodes), np.diff(g.row_pointers))
    assert choose_tiers(src, g.column_index, g.num_nodes,
                        hot_k=1024, diag_b=2048) == (2048, 1024)


def test_choose_tiers_community_picks_diag():
    """A community graph in community order should earn a diagonal tier."""
    g = synthesize_graph(20000, 400000, kind="community", seed=6)
    src = np.repeat(np.arange(g.num_nodes), np.diff(g.row_pointers))
    diag_b, _ = choose_tiers(src, g.column_index.astype(np.int64), g.num_nodes)
    assert diag_b > 0


def test_hot_k_exceeding_nodes_pads_with_zero_row():
    """hot_k > num_nodes: padding columns must point at the dedicated zero
    pad row (never a real row) and the aggregate must still match the
    oracle (VERDICT r2 'hot_ids padding indexes row 0')."""
    g = synthesize_graph(700, 9000, num_features=8, kind="powerlaw", seed=7)
    hg = build_hybrid(g, hot_k=1024, diag_b=0)  # 1024 > 700 nodes
    assert hg.num_rows > g.num_nodes  # pad rows exist at this size
    n_top = int((hg.hot_ids != g.num_nodes).sum())
    assert n_top <= g.num_nodes
    assert np.all(hg.hot_ids[n_top:] == g.num_nodes)  # sentinel zero row
    ht = build_hybrid_tensors(hg)
    x = np.random.default_rng(0).normal(size=(g.num_nodes, 8)).astype(np.float32)
    xp = jnp.asarray(hg.pad_array(x))
    out = np.asarray(aggregate(xp, ht))[: g.num_nodes]
    np.testing.assert_allclose(out, _oracle(g, x, norm=False), rtol=1e-4, atol=1e-4)


def test_choose_tiers_sampled_census_is_fast():
    """Above CENSUS_EDGE_LIMIT the census samples output blocks: a 12M-edge
    synthetic graph must rank tiers in seconds, not minutes (VERDICT r2
    'choose_tiers exact-census cost scales with candidates x edges')."""
    import time

    rng = np.random.default_rng(0)
    e, n = 12_000_000, 1_000_000
    src = np.sort(rng.integers(0, n, size=e).astype(np.int64))
    dst = rng.integers(0, n, size=e).astype(np.int64)
    t0 = time.perf_counter()
    diag_b, hot_k = choose_tiers(src, dst, n)
    elapsed = time.perf_counter() - t0
    # ~4s unloaded on this 4-core box; generous bound so concurrent bench
    # campaigns sharing the cores don't flake the suite (the pre-sampling
    # exact census took MINUTES at this scale, so the bound still bites —
    # 90s allows a fully contended box, observed once at 45-50s under a
    # parallel campaign)
    assert elapsed < 90.0, f"sampled census took {elapsed:.1f}s"
    assert diag_b in (0, 512, 1024, 2048, 4096)
    assert hot_k in (0, 512, 1024, 2048, 4096)


def test_transposed_aggregate_matches_rowmajor(hybrid_setup):
    """hybrid_aggregate with transposed tensors ([D, R] in/out) must equal
    the row-major result exactly (same tiers, boundary transpose on CPU)."""
    g, hg, ht = hybrid_setup
    ht_t = build_hybrid_tensors(hg, transposed=True)
    assert ht_t.transposed
    x = np.random.default_rng(3).normal(size=(g.num_nodes, 16)).astype(np.float32)
    xp = jnp.asarray(hg.pad_array(x))
    for norm in (False, True):
        want = np.asarray(aggregate(xp, ht, norm))
        got = np.asarray(aggregate(xp.T, ht_t, norm)).T
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_transposed_gcn_train_step_matches_rowmajor():
    """A full GCN loss/grad step in the transposed layout must match the
    row-major one (models, ops and loss all adapt via is_transposed)."""
    import jax

    from gnnadvisor_osdi21_tpu.models import gcn_apply, init_gcn
    from gnnadvisor_osdi21_tpu.train import nll_loss

    g = synthesize_graph(2000, 24000, num_features=12, num_classes=4,
                         kind="community", seed=11)
    hg = build_hybrid(g, hot_k=512, diag_b=512)
    ht = build_hybrid_tensors(hg)
    ht_t = build_hybrid_tensors(hg, transposed=True)
    params = init_gcn(jax.random.PRNGKey(0), 12, 8, 4)
    x = jnp.asarray(hg.pad_array(
        np.random.default_rng(0).normal(size=(g.num_nodes, 12)).astype(np.float32)
    ))
    y = jnp.asarray(hg.pad_array(g.init_labels(4)))
    mask = jnp.asarray(hg.row_mask)

    def loss_row(p):
        return nll_loss(gcn_apply(p, x, (ht, ht)), y, mask)

    def loss_t(p):
        return nll_loss(gcn_apply(p, x.T, (ht_t, ht_t)), y, mask,
                        transposed=True)

    l_row, g_row = jax.value_and_grad(loss_row)(params)
    l_t, g_t = jax.value_and_grad(loss_t)(params)
    np.testing.assert_allclose(float(l_t), float(l_row), rtol=1e-5)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(g_t[k]), np.asarray(g_row[k]), rtol=1e-4, atol=1e-6
        )


def test_transposed_gin_forward_matches_rowmajor():
    import jax

    from gnnadvisor_osdi21_tpu.models import gin_apply, init_gin

    g = synthesize_graph(1500, 15000, num_features=10, num_classes=3,
                         kind="powerlaw", seed=12)
    hg = build_hybrid(g, hot_k=512, diag_b=0)
    ht = build_hybrid_tensors(hg)
    ht_t = build_hybrid_tensors(hg, transposed=True)
    params = init_gin(jax.random.PRNGKey(1), 10, 8, 3)
    x = jnp.asarray(hg.pad_array(
        np.random.default_rng(1).normal(size=(g.num_nodes, 10)).astype(np.float32)
    ))
    want = np.asarray(gin_apply(params, x, (ht, ht)))
    got = np.asarray(gin_apply(params, x.T, (ht_t, ht_t))).T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_choose_res_geometry_adapts_to_structure():
    """Sparse pair streams (few pairs over many blocks — compound
    collections) should pick big sparse blocks; dense streams keep
    smaller blocks (measured grids, DESIGN.md §7)."""
    from gnnadvisor_osdi21_tpu.graphs.hybrid import choose_res_geometry

    rng = np.random.default_rng(0)
    n = 1 << 20
    # sparse: 20k pairs spread over the whole row space
    rs = rng.integers(0, n, size=20_000).astype(np.int64)
    rd = rng.integers(0, n, size=20_000).astype(np.int64)
    ob_sparse, _ = choose_res_geometry(rs, rd, n)
    # dense: 400k pairs concentrated in the first quarter
    rs2 = rng.integers(0, n // 4, size=400_000).astype(np.int64)
    rd2 = rng.integers(0, n, size=400_000).astype(np.int64)
    ob_dense, _ = choose_res_geometry(rs2, rd2, n)
    assert ob_sparse > ob_dense
    assert choose_res_geometry(rs[:0], rd[:0], n) == (1024, 256)


def test_model_pipeline_ns_breakdown():
    from gnnadvisor_osdi21_tpu.graphs.hybrid import model_pipeline_ns

    g = synthesize_graph(4000, 60000, kind="powerlaw", seed=9)
    hg = build_hybrid(g, hot_k=512, diag_b=512)
    m = model_pipeline_ns(hg)
    assert m["slab_ns"] > 0 and m["total_ns"] >= max(m["slab_ns"],
                                                     m["gather_ns"])
    # tiers-off layout puts every edge in the residual: gather term > 0
    hg2 = build_hybrid(g, hot_k=0, diag_b=0)
    assert hg2.num_res_slots > 0
    assert model_pipeline_ns(hg2)["gather_ns"] > 0


def test_single_stage_residual_matches_two_stage(hybrid_setup):
    """res_single precomposes the gather chain (one full-x gather); both
    formulations must produce identical aggregates, and the single-stage
    tensors must actually drop the stage-1 table."""
    import dataclasses

    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import hybrid_aggregate

    g, hg, _ = hybrid_setup
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((hg.num_rows, 16)).astype(np.float32))
    outs = {}
    for single in (False, True):
        ht = build_hybrid_tensors(dataclasses.replace(hg, res_single=single))
        assert (ht.res_gather is None) == single
        outs[single] = np.asarray(hybrid_aggregate(x, ht, norm=False))
    np.testing.assert_allclose(outs[False], outs[True], rtol=1e-5, atol=1e-5)


def test_res_single_decision_small_graphs():
    """The decider picks the single-stage gather whenever a residual
    stream exists: the fitted per-slot rate (GATHER_SINGLE_NS, r5) beats
    even the compact-table stage-2 rate, so the two-stage chain never
    wins single-chip (it remains the dist path's table formulation)."""
    g = synthesize_graph(3000, 40000, num_features=8, kind="powerlaw", seed=2)
    hg = build_hybrid(g, hot_k=0, diag_b=512)
    assert hg.num_res_slots and hg.res_single
    from gnnadvisor_osdi21_tpu.graphs.hybrid import (
        GATHER_SINGLE_NS, GATHER_SLOT_NS,
    )
    assert GATHER_SINGLE_NS <= GATHER_SLOT_NS


def test_probe_autotune_picks_measured_winner(monkeypatch):
    """The measured-probe autotune must override the model's ranking with
    on-device timings: pin a fake timer that inverts the model's order and
    assert the probed build returns the 'measured' winner."""
    import gnnadvisor_osdi21_tpu.graphs.hybrid as H

    g = synthesize_graph(3000, 40000, num_features=8, kind="powerlaw", seed=7)
    base = build_hybrid(g, probe=False)
    ranked = H.rank_tiers(
        np.repeat(np.arange(g.num_nodes, dtype=np.int64),
                  np.diff(g.row_pointers)),
        np.asarray(g.column_index, dtype=np.int64),
        g.num_nodes, res_ob=base.res_ob,
    )
    assert ranked[0][1:] == (base.diag_b, base.hot_k)
    assert len(ranked) >= 2
    # fake timer: the model's SECOND candidate "measures" fastest
    want = ranked[1][1:]
    times = {c[1:]: 1.0 for c in ranked}
    times[want] = 0.1

    monkeypatch.setattr(
        H, "_probe_spmm_time", lambda hg: times[(hg.diag_b, hg.hot_k)]
    )
    probed = build_hybrid(g, probe=True)
    assert (probed.diag_b, probed.hot_k) == want
    # probe=False trusts the model
    assert (base.diag_b, base.hot_k) == ranked[0][1:]


def test_probe_autotune_skipped_off_tpu():
    """Default (probe=None) never probes on the CPU backend — the layout
    equals the pure-model build."""
    g = synthesize_graph(2000, 20000, num_features=8, kind="community", seed=9)
    a = build_hybrid(g)
    b = build_hybrid(g, probe=False)
    assert (a.diag_b, a.hot_k, a.res_ob, a.res_tile) == (
        b.diag_b, b.hot_k, b.res_ob, b.res_tile
    )


def test_model_pipeline_matches_chooser_formulation():
    """model_pipeline_ns must price the residual-gather formulation the
    built layout actually uses (single vs two-stage) with the same
    constants as choose_tiers' min — the lockstep ADVICE r4 asked for."""
    import dataclasses

    from gnnadvisor_osdi21_tpu.graphs.hybrid import (
        GATHER_BIG_NS, GATHER_SINGLE_NS, GATHER_SLOT_NS, RESID_FIX_NS,
        RES_STAGE2_FIX_NS, model_pipeline_ns,
    )

    g = synthesize_graph(3000, 40000, num_features=8, kind="powerlaw", seed=4)
    hg = build_hybrid(g, hot_k=0, diag_b=512)
    assert hg.num_res_slots
    m1 = model_pipeline_ns(dataclasses.replace(hg, res_single=True))
    m2 = model_pipeline_ns(dataclasses.replace(hg, res_single=False))
    assert m1["gather_ns"] == (
        RESID_FIX_NS - RES_STAGE2_FIX_NS
        + GATHER_SINGLE_NS * hg.num_res_slots
    )
    assert m2["gather_ns"] == (
        RESID_FIX_NS
        + GATHER_BIG_NS * len(hg.res_gather)
        + GATHER_SLOT_NS * hg.num_res_slots
    )
    # the built layout picked the cheaper formulation
    assert (m1["gather_ns"] < m2["gather_ns"]) == hg.res_single


def test_res_single_width_gate():
    """The single-stage formulation is gated per layer by the aggregate
    width: wide rows over long slot streams revert to two-stage
    (RES_SINGLE_MAX_CELLS — measured r5 epoch inversions)."""
    from gnnadvisor_osdi21_tpu.graphs.hybrid import RES_SINGLE_MAX_CELLS

    g = synthesize_graph(3000, 40000, num_features=8, kind="powerlaw", seed=2)
    hg = build_hybrid(g, hot_k=0, diag_b=512)
    assert hg.res_single and hg.num_res_slots
    narrow = build_hybrid_tensors(hg, agg_feature_dim=16)
    assert narrow.res_gather is None  # single-stage
    wide_dim = RES_SINGLE_MAX_CELLS // hg.num_res_slots + 1
    wide = build_hybrid_tensors(hg, agg_feature_dim=wide_dim)
    assert wide.res_gather is not None  # two-stage


def test_probe_cache_roundtrip(monkeypatch, tmp_path):
    """Probe verdicts persist: the second build with the same graph and
    candidate set must not call the timer again and must return the
    cached winner."""
    import gnnadvisor_osdi21_tpu.graphs.hybrid as H

    monkeypatch.setenv("GNNADVISOR_CACHE_DIR", str(tmp_path))
    g = synthesize_graph(3000, 40000, num_features=8, kind="powerlaw", seed=7)
    base = build_hybrid(g, probe=False)
    ranked = H.rank_tiers(
        np.repeat(np.arange(g.num_nodes, dtype=np.int64),
                  np.diff(g.row_pointers)),
        np.asarray(g.column_index, dtype=np.int64),
        g.num_nodes, res_ob=base.res_ob,
    )
    want = ranked[1][1:]
    times = {c[1:]: 1.0 for c in ranked}
    times[want] = 0.1
    calls = []

    def timer(hg):
        calls.append((hg.diag_b, hg.hot_k))
        return times[(hg.diag_b, hg.hot_k)]

    monkeypatch.setattr(H, "_probe_spmm_time", timer)
    first = build_hybrid(g, probe=True)
    assert (first.diag_b, first.hot_k) == want
    n_calls = len(calls)
    assert n_calls >= 2
    second = build_hybrid(g, probe=True)
    assert (second.diag_b, second.hot_k) == want
    assert len(calls) == n_calls  # cache hit: no new probe timings


@pytest.mark.parametrize("seed", range(6))
def test_hybrid_fuzz_random_layouts_match_oracle(seed):
    """Randomized end-to-end fuzz over graph kinds, tier configs, residual
    geometry and gather formulation: every built layout must reproduce the
    per-edge oracle."""
    import dataclasses

    from gnnadvisor_osdi21_tpu.ops.hybrid_agg import hybrid_aggregate

    rng = np.random.default_rng(300 + seed)
    kind = ["powerlaw", "community", "web", "uniform"][seed % 4]
    n = int(rng.integers(800, 4000))
    e = int(rng.integers(4 * n, 15 * n))
    g = synthesize_graph(n, e, num_features=8, kind=kind, seed=seed)
    hot_k = int(rng.choice([0, 512, 1024]))
    diag_b = int(rng.choice([0, 512, 1024]))
    res_ob = int(rng.choice([512, 1024, 2048]))
    hg = build_hybrid(g, hot_k=hot_k, diag_b=diag_b, res_ob=res_ob)
    single = bool(rng.integers(0, 2))
    hg = dataclasses.replace(hg, res_single=single)
    ht = build_hybrid_tensors(hg)
    x = rng.standard_normal((g.num_nodes, 8)).astype(np.float32)
    for norm in (False, True):
        want = _oracle(g, x, norm)
        got = hg.unpad_array(
            np.asarray(hybrid_aggregate(jnp.asarray(hg.pad_array(x)), ht, norm))
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

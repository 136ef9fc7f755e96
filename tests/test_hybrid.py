"""Hybrid hot/cold layout + aggregation tests (vs the COO oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.graphs.hybrid import build_hybrid, choose_hot_k
from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.ops import reference
from gnnadvisor_osdi21_tpu.ops.aggregate import aggregate, gcn_conv
from gnnadvisor_osdi21_tpu.ops.hybrid_agg import build_hybrid_tensors


@pytest.fixture(scope="module", params=["powerlaw", "community"])
def hybrid_setup(request):
    g = synthesize_graph(3000, 40000, num_features=16, kind=request.param, seed=5)
    hg = build_hybrid(g, pack_c=8, hot_k=512)
    ht = build_hybrid_tensors(hg)
    return g, hg, ht


def test_layout_accounts_every_edge(hybrid_setup):
    g, hg, _ = hybrid_setup
    hot_bits_set = sum(int(bin(w).count("1")) for w in hg.hot_bits.reshape(-1))
    cold_bits_set = sum(
        int(bin(w).count("1"))
        for b in hg.buckets
        for w in b.block_mask.reshape(-1)
    )
    assert hot_bits_set == hg.num_hot_edges
    assert cold_bits_set == hg.num_cold_edges
    assert hg.num_hot_edges + hg.num_cold_edges == g.nnz


def test_pad_unpad_roundtrip(hybrid_setup):
    g, hg, _ = hybrid_setup
    a = np.arange(g.num_nodes, dtype=np.float32)
    assert np.array_equal(hg.unpad_array(hg.pad_array(a)), a)


def test_hybrid_aggregate_matches_oracle(hybrid_setup):
    g, hg, ht = hybrid_setup
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, 16), dtype=np.float32)
    src = reference.csr_to_coo(g.row_pointers, g.column_index)

    for norm in (False, True):
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
        xp = jnp.asarray(hg.pad_array(x))
        out = aggregate(xp, ht, norm)
        got = hg.unpad_array(np.asarray(out))
        # hot path runs in bf16 on the MXU: coarser tolerance
        np.testing.assert_allclose(got, np.asarray(want), rtol=2e-2, atol=2e-2)


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
    skew = synthesize_graph(20000, 300000, kind="powerlaw", seed=2, zipf_a=1.3)
    flat = synthesize_graph(20000, 300000, kind="uniform", seed=2)
    k_skew = choose_hot_k(skew.column_index, skew.num_nodes, skew.nnz)
    k_flat = choose_hot_k(flat.column_index, flat.num_nodes, flat.nnz)
    assert k_skew >= k_flat


def test_hot_k_zero_is_pure_cold():
    g = synthesize_graph(1000, 8000, kind="uniform", seed=3)
    hg = build_hybrid(g, pack_c=8, hot_k=0)
    ht = build_hybrid_tensors(hg)
    assert ht.hot_bits is None
    rng = np.random.default_rng(0)
    x = rng.standard_normal((g.num_nodes, 16), dtype=np.float32)
    src = reference.csr_to_coo(g.row_pointers, g.column_index)
    want = reference.sag(
        jnp.asarray(x), jnp.asarray(src), jnp.asarray(g.column_index), g.num_nodes
    )
    out = aggregate(jnp.asarray(hg.pad_array(x)), ht, False)
    np.testing.assert_allclose(
        hg.unpad_array(np.asarray(out)), np.asarray(want), rtol=1e-4, atol=1e-4
    )

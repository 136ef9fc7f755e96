"""Interpret-mode tests for the Pallas bit-slab kernels.

Runs the actual kernel body (unpack + MXU dot) through the Pallas
interpreter on CPU against the ``unpack_slab`` oracle, so a layout bug in
the bit-major packing or the grid/index maps fails in CI rather than only
as wrong TPU bench numbers (unitest.py:9-63 analog at the kernel level).
"""

import numpy as np

from gnnadvisor_osdi21_tpu.ops.spmm_pallas import (
    diag_slab_matmul, hot_slab_matmul, pack_slab_bits, transpose_slab,
    unpack_slab,
)


def _random_slab(rng, r, k, nnz):
    rows = rng.integers(0, r, nnz)
    cols = rng.integers(0, k, nnz)
    return pack_slab_bits(rows, cols, r, k)


def test_hot_slab_matmul_interpret_matches_oracle():
    rng = np.random.default_rng(0)
    r, k, d = 256, 64, 10  # d=10 exercises the lane-padding path
    bits = _random_slab(rng, r, k, 800)
    x = rng.standard_normal((k, d)).astype(np.float32)
    want = unpack_slab(bits, k) @ x
    got = np.asarray(hot_slab_matmul(transpose_slab(bits), x, block_rows=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hot_slab_matmul_feature_tiling():
    rng = np.random.default_rng(1)
    r, k, d = 128, 96, 300
    bits = _random_slab(rng, r, k, 600)
    x = rng.standard_normal((k, d)).astype(np.float32)
    want = unpack_slab(bits, k) @ x
    # d=300 > feature_tile=128 forces a 3-step lane grid (128-lane tiles)
    got = np.asarray(
        hot_slab_matmul(transpose_slab(bits), x, block_rows=64, feature_tile=128, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_diag_slab_matmul_interpret_matches_oracle():
    rng = np.random.default_rng(2)
    r, b, d = 512, 128, 12
    # block-local columns: row i may only reference cols inside its block
    rows = rng.integers(0, r, 2000)
    cols = rng.integers(0, b, 2000)
    bits = pack_slab_bits(rows, cols, r, b)
    x = rng.standard_normal((r, d)).astype(np.float32)
    a = unpack_slab(bits, b)  # [r, b], block-local
    want = np.concatenate([
        a[i : i + b] @ x[i : i + b] for i in range(0, r, b)
    ])
    got = np.asarray(
        diag_slab_matmul(transpose_slab(bits), x, diag_b=b, block_rows=64, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pack_unpack_roundtrip_bit_major():
    rng = np.random.default_rng(3)
    r, k = 64, 96
    rows = rng.integers(0, r, 300)
    cols = rng.integers(0, k, 300)
    bits = pack_slab_bits(rows, cols, r, k)
    dense = unpack_slab(bits, k)
    want = np.zeros((r, k), np.float32)
    want[rows, cols] = 1.0
    np.testing.assert_array_equal(dense, want)


def test_fused_slab_matmul_interpret_matches_oracle():
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import fused_slab_matmul

    rng = np.random.default_rng(4)
    r, b, k, d = 256, 128, 64, 16
    drows = rng.integers(0, r, 900)
    dcols = rng.integers(0, b, 900)
    dbits = pack_slab_bits(drows, dcols, r, b)
    hbits = _random_slab(rng, r, k, 500)
    x = rng.standard_normal((r, d)).astype(np.float32)
    xh = rng.standard_normal((k, d)).astype(np.float32)
    da = unpack_slab(dbits, b)
    want = np.concatenate([
        da[i : i + b] @ x[i : i + b] for i in range(0, r, b)
    ]) + unpack_slab(hbits, k) @ xh
    got = np.asarray(fused_slab_matmul(
        transpose_slab(dbits), transpose_slab(hbits), x, xh, diag_b=b, block_rows=64, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_residual_combine_interpret_matches_reference():
    """Fused residual combine == slot-by-slot accumulation, including an
    out-block with zero tiles (never visited by the grid — the caller
    zero-selects it; here the kernel output for visited blocks must still
    be exact)."""
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_residual_stream
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import residual_combine

    rng = np.random.default_rng(5)
    res_ob, res_tile, num_rows, d = 32, 8, 128, 16
    col_space = 64
    # destinations concentrated so block 2 (rows 64..95) gets no residual
    rs = np.concatenate([
        rng.integers(0, 64, 300), rng.integers(96, 128, 100)
    ]).astype(np.int64)
    rd = rng.integers(0, col_space, 400).astype(np.int64)
    # unique (s, d) pairs: the layout dedups edges like CSR inputs do
    rs, rd = np.unique(np.stack([rs, rd]), axis=1)
    res_gather, res_dst, res_mask, res_mask_s, res_t2b, _ = build_residual_stream(
        rs, rd, col_space, num_rows, res_tile, res_ob
    )
    table = rng.standard_normal((col_space, d)).astype(np.float32)
    compact = table[res_gather]
    rows = compact[res_dst]

    got = np.asarray(residual_combine(
        rows, res_mask, res_t2b, num_rows, res_ob, interpret=True
    ))

    want = np.zeros((num_rows, d), np.float32)
    for s, dst in zip(rs, rd):
        want[s] += table[dst]
    visited = np.zeros(num_rows // res_ob, bool)
    visited[res_t2b] = True
    vis_rows = np.repeat(visited, res_ob)
    np.testing.assert_allclose(got[vis_rows], want[vis_rows], rtol=1e-5,
                               atol=1e-5)
    assert not visited[2]  # the empty-block case is actually exercised
    assert np.all(want[64:96] == 0)


# ---------------------------------------------------------------------------
# Transposed (v3) kernels: features [D, R], graph rows on the lane axis.
# ---------------------------------------------------------------------------


def test_slab_matmul_t_hot_matches_oracle():
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import slab_matmul_t

    rng = np.random.default_rng(6)
    r, k, d = 256, 64, 10  # d=10 exercises sublane padding
    bits = _random_slab(rng, r, k, 800)
    x = rng.standard_normal((k, d)).astype(np.float32)
    want = (unpack_slab(bits, k) @ x).T  # [d, r]
    got = np.asarray(slab_matmul_t(
        transpose_slab(bits), x.T.copy(), block_cols=64, interpret=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_slab_matmul_t_feature_tiling():
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import slab_matmul_t

    rng = np.random.default_rng(7)
    r, k, d = 128, 96, 300  # d=300 > feature_tile forces a sublane grid
    bits = _random_slab(rng, r, k, 600)
    x = rng.standard_normal((k, d)).astype(np.float32)
    want = (unpack_slab(bits, k) @ x).T
    got = np.asarray(slab_matmul_t(
        transpose_slab(bits), x.T.copy(), block_cols=64, feature_tile=128,
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_slab_matmul_t_diag_matches_oracle():
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import slab_matmul_t

    rng = np.random.default_rng(8)
    r, b, d = 512, 128, 12
    rows = rng.integers(0, r, 2000)
    cols = rng.integers(0, b, 2000)
    bits = pack_slab_bits(rows, cols, r, b)
    x = rng.standard_normal((r, d)).astype(np.float32)
    a = unpack_slab(bits, b)
    want = np.concatenate([
        a[i : i + b] @ x[i : i + b] for i in range(0, r, b)
    ]).T
    got = np.asarray(slab_matmul_t(
        transpose_slab(bits), x.T.copy(), table_block_cols=b, block_cols=64,
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fused_slab_matmul_t_matches_oracle():
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import fused_slab_matmul_t

    rng = np.random.default_rng(9)
    r, b, k, d = 256, 128, 64, 16
    drows = rng.integers(0, r, 900)
    dcols = rng.integers(0, b, 900)
    dbits = pack_slab_bits(drows, dcols, r, b)
    hbits = _random_slab(rng, r, k, 500)
    x = rng.standard_normal((r, d)).astype(np.float32)
    xh = rng.standard_normal((k, d)).astype(np.float32)
    da = unpack_slab(dbits, b)
    want = (np.concatenate([
        da[i : i + b] @ x[i : i + b] for i in range(0, r, b)
    ]) + unpack_slab(hbits, k) @ xh).T
    got = np.asarray(fused_slab_matmul_t(
        transpose_slab(dbits), transpose_slab(hbits), x.T.copy(),
        xh.T.copy(), diag_b=b, block_cols=64, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_residual_combine_t_matches_reference():
    """Transposed residual combine (slot-major mask) == slot-by-slot
    accumulation, including an unvisited out-block."""
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_residual_stream
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import residual_combine_t

    rng = np.random.default_rng(10)
    res_ob, res_tile, num_rows, d = 32, 32, 128, 16
    col_space = 64
    rs = np.concatenate([
        rng.integers(0, 64, 300), rng.integers(96, 128, 100)
    ]).astype(np.int64)
    rd = rng.integers(0, col_space, 400).astype(np.int64)
    rs, rd = np.unique(np.stack([rs, rd]), axis=1)
    res_gather, res_dst, _rm, res_mask_s, res_t2b, _ = build_residual_stream(
        rs, rd, col_space, num_rows, res_tile, res_ob
    )
    table = rng.standard_normal((col_space, d)).astype(np.float32)
    rows_t = table[res_gather][res_dst].T.copy()  # [d, M_pad]

    got = np.asarray(residual_combine_t(
        rows_t, res_mask_s, res_t2b, num_rows, res_ob, interpret=True
    ))

    want = np.zeros((num_rows, d), np.float32)
    for s, dst in zip(rs, rd):
        want[s] += table[dst]
    visited = np.zeros(num_rows // res_ob, bool)
    visited[res_t2b] = True
    vis_rows = np.repeat(visited, res_ob)
    np.testing.assert_allclose(
        got[:, vis_rows], want[vis_rows].T, rtol=1e-5, atol=1e-5
    )
    assert not visited[2]


def test_residual_combine_t_feature_grid():
    """d > feature_tile forces a 2-D grid (feature slices x tiles); the
    per-block accumulate/flush logic must hold within every feature
    slice independently."""
    from gnnadvisor_osdi21_tpu.graphs.hybrid import build_residual_stream
    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import residual_combine_t

    rng = np.random.default_rng(11)
    res_ob, res_tile, num_rows, d = 32, 32, 128, 300
    col_space = 64
    rs = rng.integers(0, num_rows, 500).astype(np.int64)
    rd = rng.integers(0, col_space, 500).astype(np.int64)
    rs, rd = np.unique(np.stack([rs, rd]), axis=1)
    res_gather, res_dst, _rm, res_mask_s, res_t2b, _ = build_residual_stream(
        rs, rd, col_space, num_rows, res_tile, res_ob
    )
    table = rng.standard_normal((col_space, d)).astype(np.float32)
    rows_t = table[res_gather][res_dst].T.copy()

    got = np.asarray(residual_combine_t(
        rows_t, res_mask_s, res_t2b, num_rows, res_ob,
        feature_tile=128, interpret=True,
    ))
    want = np.zeros((num_rows, d), np.float32)
    for s, dst in zip(rs, rd):
        want[s] += table[dst]
    visited = np.zeros(num_rows // res_ob, bool)
    visited[res_t2b] = True
    vis = np.repeat(visited, res_ob)
    np.testing.assert_allclose(got[:, vis], want[vis].T, rtol=1e-4, atol=1e-4)


def test_slab_matmul_t_wide_hot_k4096_both_dtypes():
    """K=4096 is the shape family where Mosaic (jax 0.9) rejected the
    f32-select unpack ("Invalid relayout ... vector<4096x512xi1>") — the
    unpack must select bf16 and cast.  Guard the logic at this width in
    interpret mode for BOTH dtypes (the lowering itself was verified on
    hardware at 1e-8/1.7e-7 rel err, 2026-08-20)."""
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.ops.spmm_pallas import slab_matmul_t

    rng = np.random.default_rng(5)
    r, k, d = 1024, 4096, 16
    e = 20000
    rows = rng.integers(0, r, e)
    cols = rng.integers(0, k, e)
    bits = pack_slab_bits(rows, cols, r, k)
    dense = unpack_slab(bits, k)
    x = rng.standard_normal((k, d)).astype(np.float32)
    for dt, tol in ((np.float32, 1e-4), (jnp.bfloat16, 3e-2)):
        xt = jnp.asarray(x.T.copy()).astype(dt)
        got = np.asarray(slab_matmul_t(
            transpose_slab(bits), xt, block_cols=512, feature_tile=128,
            interpret=True,
        ))
        want = (dense @ np.asarray(xt, dtype=np.float32).T).T
        assert np.abs(got - want).max() / np.abs(want).max() < tol

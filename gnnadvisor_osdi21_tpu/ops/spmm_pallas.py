"""Pallas TPU bit-slab matmul kernels for the hybrid aggregation tiers.

``slab_matmul`` computes ``out = unpack_bits(A_bits) @ X`` where the bit
slab holds one adjacency bit per (output row, slab column).  Two wirings
share the kernel body:

- **hot** (``table_block_rows=None``): every grid row-block multiplies
  against the same global table ``x[K, D]`` (the gathered hot-node
  features).  One tiny K-row gather replaces millions of per-edge hub
  gathers.
- **diagonal** (``table_block_rows=B``): slab columns are *local* to the
  ``B``-row block the output row lives in, and the x operand for grid step
  ``i`` is the matching contiguous slice ``x[blk*B:(blk+1)*B]`` — zero
  gathers; community reordering packs edges into these blocks.

**Storage layout — transposed, [K/16, R] uint16.**  TPU tiled layouts pad
the minor dimension of every array to 128 lanes, so a row-major
``[R, K/32]`` slab narrower than 128 words is stored AND streamed at up
to 8-16x its logical bytes (measured: a 512-column slab at 1.89M rows
materialized 923 MB and OOM'd the SW-620H GIN run).  Keeping rows on the
*lane* axis makes the physical bytes exactly the logical bytes for every
slab width.  Within a word the layout is bit-major: column ``j`` lives in
word ``j % W16`` at bit ``j // W16``, so one ``pltpu.repeat(..., 16,
axis=0)`` plus a per-sublane AND/select unpacks a whole tile — 16-bit
words, because 16-bit lanes pack two cells per VPU lane and double the
unpack throughput over the earlier uint32 layout (Mosaic cannot legalize
16-bit shifts, hence the shift-free bit test).

This is the MXU re-expression of the reference's warp-level aggregation
(GNNAdvisor_kernel.cu:324-415): instead of warps gathering neighbor rows
through HBM and flushing with ``atomicAdd_F`` (:12-17), every grid step

1. DMAs a ``[K/32, block_rows]`` uint32 slab tile into VMEM (the only HBM
   traffic that scales with the graph: K/8 bytes per row),
2. unpacks it to a ``[K, block_rows]`` 0/1 matrix with two vector ops
   (sublane-repeat + shift/mask — no HBM traffic),
3. contracts the K axis against the VMEM-resident x tile on the MXU.

**Precision**: TPU MXU dots default to bf16 operands.  f32 operands are
contracted at ``precision=HIGHEST`` (multi-pass, exact for 0/1 x f32 —
measured max err 1.9e-6 vs 2.4e-2 at default), so ``agg_dtype="float32"``
keeps its matches-the-oracle contract on hardware; bf16 operands use the
native fast path.

No atomics, no gathers, fully deterministic.  The kernel geometry
(``block_rows`` rows per grid step — the warpPerBlock/sharedMem analog —
and ``feature_tile`` lanes per step — the dimWorker analog) is supplied by
the decider (tuner/decider.py) from the VMEM budget and feature width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _precision(dtype):
    """Exact contraction for f32 operands; native fast path for bf16."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _unpack_tile_t(bits_ref, shift_ref, dtype):
    """Unpack a transposed [W32, TR] uint32 slab tile to [K, TR] 0/1.

    Bit-major layout: column j lives in word j % W32 at bit j // W32 —
    chosen because ``pltpu.repeat(..., 32, axis=0)`` tiles the words down
    the sublane axis, so one repeat + one per-sublane shift unpacks the
    whole tile.  The shift column (j // W32) is a precomputed input.
    0/1 uint32 -> f32 without int casts: 1.0f is 0x3F800000, so a single
    integer multiply + bitcast materializes the float matrix."""
    words = pltpu.repeat(bits_ref[:], 32, axis=0)  # [K, TR]
    bit = (words >> shift_ref[:]) & 1
    a = pltpu.bitcast(bit * jnp.uint32(0x3F800000), jnp.float32)
    return a if dtype == jnp.float32 else a.astype(dtype)


def _unpack_tile_t16(bits_ref, pow2_ref, dtype):
    """Unpack a transposed [W16, TR] uint16 slab tile to [K, TR] 0/1.

    The 16-bit twin of ``_unpack_tile_t`` and the one every production
    kernel uses: 16-bit lanes pack two cells per 32-bit VPU lane, so the
    unpack runs at 2x the uint32 throughput (measured: residual combine
    1.25 -> 0.64 ms on the amazon0505-scale stream, 2026-08-20).  The bit
    test is shift-free — Mosaic (jax 0.9) cannot legalize 16-bit shifts
    (arith.shrui) or mins (arith.minui): AND with the per-sublane
    power-of-two column (column j lives in word j % W16 at bit j // W16,
    ``pow2_ref[j] = 1 << (j // W16)``) + a bf16 select.  The select must
    target bf16 even for the f32 path: the compare's i1 vector carries
    the packed 16-bit layout, and selecting 32-bit values from it trips a
    Mosaic relayout bug at wide K ("Invalid relayout ...
    vector<4096x512xi1>"); measured variants at the residual shape:
    bf16-select 0.64 ms, int16-sitofp 0.83, i1-astype 1.11, uint32 1.25."""
    words = pltpu.repeat(bits_ref[:], 16, axis=0)  # [K, TR] uint16
    a = jnp.where(
        (words & pow2_ref[:]) != jnp.uint16(0),
        jnp.bfloat16(1), jnp.bfloat16(0),
    )
    return a if dtype == jnp.bfloat16 else a.astype(dtype)


def _pow2_col(k: int, w16: int):
    """[K, 1] uint16 bit-test column for ``_unpack_tile_t16``."""
    # uint16 arange wraps silently at 65536; auto tier choice caps K at
    # 4096 but manual_mode accepts arbitrary widths — fail loudly instead
    # of producing wrong bit masks (ADVICE r4)
    assert k < 65536, f"slab width {k} overflows the uint16 bit-test layout"
    return (
        jnp.uint16(1) << (jnp.arange(k, dtype=jnp.uint16) // jnp.uint16(w16))
    )[:, None]


def _contract(a_t, x, dtype):
    """out[R_tile, D] = a_t[K, R_tile]^T @ x[K, D], K on the MXU."""
    return jax.lax.dot_general(
        a_t, x, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(dtype),
    )


def _slab_kernel(bits_ref, pow2_ref, x_ref, out_ref):
    """One grid step: unpack a rows-tile of the bit slab, contract with x."""
    a_t = _unpack_tile_t16(bits_ref, pow2_ref, x_ref.dtype)
    out_ref[:] = _contract(a_t, x_ref[:], x_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("table_block_rows", "block_rows", "feature_tile", "interpret"),
)
def slab_matmul(
    bits_t: jax.Array,  # [K/16, R] uint16, transposed bit-major
    x: jax.Array,  # [K, D] (hot) or [R, D] (diagonal)
    table_block_rows: int | None = None,
    block_rows: int = 512,
    feature_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """out[R, D] f32 = unpack(bits_t)^T @ x (global or block-local table)."""
    w16, r = bits_t.shape
    k = w16 * 16
    t, d = x.shape
    assert bits_t.dtype == jnp.uint16, "slabs are uint16 (see _unpack_tile_t16)"
    if table_block_rows is None:
        assert t == k, f"hot table rows {t} != slab K {k}"
    else:
        assert table_block_rows == k, f"diag block {table_block_rows} != slab K {k}"
        assert t == r, f"diag x rows {t} != slab rows {r}"
        assert table_block_rows % block_rows == 0, (
            f"block_rows {block_rows} must divide diag block {table_block_rows}"
        )
    assert r % block_rows == 0, f"rows {r} not a multiple of {block_rows}"

    # Lane tiling (the dimWorker analog): td lanes per grid step.  Mosaic
    # requires block lane dims to be multiples of 128 or equal to the full
    # array dim, so narrow features run as one full-width tile and wide
    # features tile at a 128-multiple derived from ``feature_tile``.
    dp8 = _round_up(max(d, 1), 8)
    if dp8 <= max(feature_tile, 128):
        td = dp = dp8
    else:
        td = _round_up(feature_tile, 128)
        dp = _round_up(d, td)
    if dp != d:
        x = jnp.pad(x, ((0, 0), (0, dp - d)))
    grid = (r // block_rows, dp // td)

    if table_block_rows is None:
        x_index = lambda i, j: (0, j)
    else:
        blocks_per_diag = table_block_rows // block_rows
        x_index = lambda i, j: (i // blocks_per_diag, j)

    out = pl.pallas_call(
        _slab_kernel,
        out_shape=jax.ShapeDtypeStruct((r, dp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (w16, block_rows), lambda i, j: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((k, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, td), x_index, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, td), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * dp,
            bytes_accessed=r * w16 * 2 * (dp // td) + t * dp * 4 + r * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits_t, _pow2_col(k, w16), x)
    return out[:, :d] if dp != d else out


def hot_slab_matmul(
    bits_t: jax.Array,
    x_hot: jax.Array,
    block_rows: int = 512,
    feature_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """out[R, D] = unpack(bits_t)^T @ x_hot — global-table wiring."""
    return slab_matmul(
        bits_t, x_hot, table_block_rows=None, block_rows=block_rows,
        feature_tile=feature_tile, interpret=interpret,
    )


def diag_slab_matmul(
    bits_t: jax.Array,
    x: jax.Array,
    diag_b: int,
    block_rows: int = 512,
    feature_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """out[R, D] = blockdiag-unpack(bits_t)^T @ x — block-local wiring."""
    return slab_matmul(
        bits_t, x, table_block_rows=diag_b,
        block_rows=min(block_rows, diag_b), feature_tile=feature_tile,
        interpret=interpret,
    )


def _fused_kernel(db_ref, dpow2_ref, hb_ref, hpow2_ref, x_ref, xh_ref, out_ref):
    """One grid step: unpack BOTH slabs, two MXU contractions, one write.

    The measured slab cost is ``rows·(a + b·K)`` with a ≈ 4.7 ns/row
    dominating at practical K — fusing the diagonal and hot tiers into one
    pallas_call pays the fixed per-row cost once instead of twice."""
    da = _unpack_tile_t16(db_ref, dpow2_ref, x_ref.dtype)
    ha = _unpack_tile_t16(hb_ref, hpow2_ref, xh_ref.dtype)
    out_ref[:] = _contract(da, x_ref[:], x_ref.dtype) + _contract(
        ha, xh_ref[:], xh_ref.dtype
    )


@functools.partial(
    jax.jit,
    static_argnames=("diag_b", "block_rows", "feature_tile", "interpret"),
)
def fused_slab_matmul(
    diag_bits_t: jax.Array,  # [B/16, R] uint16, block-local columns
    hot_bits_t: jax.Array,  # [K/16, R] uint16, global hot columns
    x: jax.Array,  # [R, D] (diag operand, sliced per block)
    x_hot: jax.Array,  # [K, D] (gathered hot table)
    diag_b: int,
    block_rows: int = 512,
    feature_tile: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """out[R, D] = blockdiag(diag)^T @ x + hot^T @ x_hot, one row pass."""
    dw16, r = diag_bits_t.shape
    b = dw16 * 16
    hw16, _ = hot_bits_t.shape
    k = hw16 * 16
    t, d = x_hot.shape
    assert diag_bits_t.dtype == jnp.uint16 and hot_bits_t.dtype == jnp.uint16
    assert b == diag_b and t == k and x.shape[0] == r
    block_rows = min(block_rows, diag_b)
    assert diag_b % block_rows == 0 and r % block_rows == 0

    dp8 = _round_up(max(d, 1), 8)
    if dp8 <= max(feature_tile, 128):
        td = dp = dp8
    else:
        td = _round_up(feature_tile, 128)
        dp = _round_up(d, td)
    if dp != d:
        x = jnp.pad(x, ((0, 0), (0, dp - d)))
        x_hot = jnp.pad(x_hot, ((0, 0), (0, dp - d)))
    grid = (r // block_rows, dp // td)
    bpd = diag_b // block_rows

    dpow2 = _pow2_col(b, dw16)
    hpow2 = _pow2_col(k, hw16)
    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((r, dp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (dw16, block_rows), lambda i, j: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (hw16, block_rows), lambda i, j: (0, i), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((k, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (b, td), lambda i, j: (i // bpd, j), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((k, td), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block_rows, td), lambda i, j: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * (b + k) * dp,
            bytes_accessed=r * (dw16 + hw16) * 2 * (dp // td)
            + (r + t) * dp * 4 + r * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(diag_bits_t, dpow2, hot_bits_t, hpow2, x, x_hot)
    return out[:, :d] if dp != d else out


def _resid_kernel(t2b_ref, mask_ref, shift_ref, rows_ref, out_ref):
    """One grid step = one residual tile: unpack the [OB, S] multi-hot
    mask, contract the slot axis on the MXU, accumulate into the tile's
    output block.  Tiles are grouped per block (t2b sorted), so the output
    block stays resident in VMEM across its tiles and flushes once."""
    t = pl.program_id(0)
    prev = t2b_ref[jnp.maximum(t - 1, 0)]
    first = jnp.logical_or(t == 0, t2b_ref[t] != prev)

    a_t = _unpack_tile_t(mask_ref, shift_ref, rows_ref.dtype)  # [OB, S]

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # out[OB, D] += a_t @ rows ([OB, S] x [S, D])
    out_ref[:] += jnp.dot(
        a_t, rows_ref[:],
        preferred_element_type=jnp.float32,
        precision=_precision(rows_ref.dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("num_rows", "res_ob", "interpret")
)
def residual_combine(
    rows: jax.Array,  # [M_pad, D] gathered slot rows (pad slots: any value)
    mask_t: jax.Array,  # [OB/32, M_pad] uint32 multi-hot, transposed (0 on pads)
    t2b: jax.Array,  # [T] int32 tile -> out-block, sorted ascending
    num_rows: int,
    res_ob: int,
    interpret: bool = False,
) -> jax.Array:
    """out[num_rows, D] f32: residual-tier combine, fully fused.

    Replaces the XLA chain unpack -> [T, S, OB] one-hot einsum ->
    segment_sum, which materializes the unpacked mask (T·S·OB·4 bytes —
    ~0.9 GB of HBM round-trip at amazon0505 scale) between ops.  Here the
    unpack lives in VMEM inside the grid step (the same fusion the CUDA
    reference gets from accumulating in shared memory,
    GNNAdvisor_kernel.cu:186-259).

    Blocks with no residual tiles are never visited by the grid; their
    rows are zeroed by the caller (``hybrid_agg._residual_aggregate``)
    via a visited-block select.
    """
    m_pad, d = rows.shape
    t = t2b.shape[0]
    s = m_pad // max(t, 1)
    words = mask_t.shape[0]
    assert words * 32 == res_ob and t * s == m_pad
    n_blocks = num_rows // res_ob

    dp = _round_up(max(d, 1), 8)
    if dp != d:
        rows = jnp.pad(rows, ((0, 0), (0, dp - d)))

    shift_col = (jnp.arange(res_ob, dtype=jnp.uint32) // jnp.uint32(words))[:, None]
    out = pl.pallas_call(
        _resid_kernel,
        out_shape=jax.ShapeDtypeStruct((num_rows, dp), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec(
                    (words, s), lambda i, t2b_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (res_ob, 1), lambda i, t2b_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (s, dp), lambda i, t2b_ref: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (res_ob, dp), lambda i, t2b_ref: (t2b_ref[i], 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * res_ob * dp,
            bytes_accessed=m_pad * (words * 4 + dp * 4) + n_blocks * res_ob * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(t2b, mask_t, shift_col, rows)
    return out[:, :d] if dp != d else out


# ---------------------------------------------------------------------------
# Transposed (feature-on-sublanes) kernels — the v3 layout.
#
# Measured motivation (bench/stepprobe.py + bench/fixprobe.py, v5e): with
# features stored row-major [R, D], every array narrower than 128 lanes is
# physically padded to 128 lanes by the TPU's (8, 128) tiling, and the
# row-major slab kernels cost ~3.6 ns/row FIXED + ~8 ps/slot.  Storing
# features TRANSPOSED ([D, R], graph rows on the lane axis) makes every
# stream exact-bytes and lets the dot run x_t[D, K] @ unpack(bits)[K, cols]:
# measured ~2.2 ns/row fixed + ~0.8 ps/slot — 3-4x faster at practical
# tier widths.  Gathers cost the same on either axis (measured), so the
# residual tier loses nothing.  These kernels power the transposed hybrid
# pipeline (ops/hybrid_agg.py with transposed=True).
# ---------------------------------------------------------------------------


def _feature_tiles_t(d: int, feature_tile: int):
    """Sublane tiling for the feature axis of transposed operands.

    Multiples of 16 cover both f32 (8-row tiles) and bf16 (16-row tiles).
    ``feature_tile`` is the dimWorker analog and genuinely binds: explicit
    small values force a feature grid (the s7-4_2 study's pathological
    arms), while the decider's auto value covers the whole dim in one tile
    (Mosaic's full-dim exemption)."""
    dp16 = _round_up(max(d, 1), 16)
    td = min(dp16, max(_round_up(feature_tile, 16), 16))
    if td == dp16:
        return dp16, dp16
    return td, _round_up(d, td)


def _slab_kernel_t(bits_ref, pow2_ref, xt_ref, out_ref):
    """One grid step: out[td, bc] = x_t[td, K] @ unpack(bits)[K, bc]."""
    a_t = _unpack_tile_t16(bits_ref, pow2_ref, xt_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        xt_ref[:], a_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(xt_ref.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "table_block_cols", "block_cols", "feature_tile", "interpret", "vma",
    ),
)
def slab_matmul_t(
    bits_t: jax.Array,  # [K/16, R] uint16, transposed bit-major
    x_t: jax.Array,  # [D, K] (hot) or [D, R] (diagonal)
    table_block_cols: int | None = None,
    block_cols: int = 512,
    feature_tile: int = 128,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> jax.Array:
    """out[D, R] f32 = x_t @ unpack(bits_t) (global or block-local table).

    ``vma``: varying-mesh-axes annotation for the output when called
    inside a ``shard_map`` with ``check_vma=True`` (pallas_call cannot
    infer it — jax 0.9 requires it on ``out_shape``)."""
    w16, r = bits_t.shape
    k = w16 * 16
    d, t = x_t.shape
    assert bits_t.dtype == jnp.uint16, "transposed slabs are uint16"
    if table_block_cols is None:
        assert t == k, f"hot table cols {t} != slab K {k}"
    else:
        assert table_block_cols == k, (
            f"diag block {table_block_cols} != slab K {k}"
        )
        assert t == r, f"diag x cols {t} != slab cols {r}"
        assert table_block_cols % block_cols == 0, (
            f"block_cols {block_cols} must divide diag block {table_block_cols}"
        )
    assert r % block_cols == 0, f"cols {r} not a multiple of {block_cols}"

    td, dp = _feature_tiles_t(d, feature_tile)
    if dp != d:
        x_t = jnp.pad(x_t, ((0, dp - d), (0, 0)))
    grid = (r // block_cols, dp // td)

    if table_block_cols is None:
        x_index = lambda i, j: (j, 0)
    else:
        blocks_per_diag = table_block_cols // block_cols
        x_index = lambda i, j: (j, i // blocks_per_diag)

    out = pl.pallas_call(
        _slab_kernel_t,
        out_shape=jax.ShapeDtypeStruct((dp, r), jnp.float32, vma=vma),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (w16, block_cols), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((k, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((td, k), x_index, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (td, block_cols), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * k * dp,
            bytes_accessed=r * w16 * 2 * (dp // td) + t * dp * 4 + r * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(bits_t, _pow2_col(k, w16), x_t)
    return out[:d] if dp != d else out


def _fused_kernel_t(db_ref, dpow2_ref, hb_ref, hpow2_ref, xt_ref, xht_ref,
                    out_ref):
    """One grid step: both slabs unpacked, two MXU contractions, one write."""
    da = _unpack_tile_t16(db_ref, dpow2_ref, xt_ref.dtype)
    ha = _unpack_tile_t16(hb_ref, hpow2_ref, xht_ref.dtype)
    prec_d = _precision(xt_ref.dtype)
    out_ref[:] = jax.lax.dot_general(
        xt_ref[:], da, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec_d,
    ) + jax.lax.dot_general(
        xht_ref[:], ha, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec_d,
    )


@functools.partial(
    jax.jit,
    static_argnames=("diag_b", "block_cols", "feature_tile", "interpret", "vma"),
)
def fused_slab_matmul_t(
    diag_bits_t: jax.Array,  # [B/16, R] uint16, block-local columns
    hot_bits_t: jax.Array,  # [K/16, R] uint16, global hot columns
    x_t: jax.Array,  # [D, R] (diag operand, sliced per block)
    x_hot_t: jax.Array,  # [D, K] (gathered hot table)
    diag_b: int,
    block_cols: int = 512,
    feature_tile: int = 128,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> jax.Array:
    """out[D, R] = x_t @ blockdiag(diag) + x_hot_t @ hot, one column pass.
    ``vma``: see slab_matmul_t."""
    dw16, r = diag_bits_t.shape
    b = dw16 * 16
    hw16, _ = hot_bits_t.shape
    k = hw16 * 16
    d, t = x_hot_t.shape
    assert diag_bits_t.dtype == jnp.uint16 and hot_bits_t.dtype == jnp.uint16
    assert b == diag_b and t == k and x_t.shape[1] == r
    block_cols = min(block_cols, diag_b)
    assert diag_b % block_cols == 0 and r % block_cols == 0

    td, dp = _feature_tiles_t(d, feature_tile)
    if dp != d:
        x_t = jnp.pad(x_t, ((0, dp - d), (0, 0)))
        x_hot_t = jnp.pad(x_hot_t, ((0, dp - d), (0, 0)))
    grid = (r // block_cols, dp // td)
    bpd = diag_b // block_cols

    dpow2 = _pow2_col(b, dw16)
    hpow2 = _pow2_col(k, hw16)
    out = pl.pallas_call(
        _fused_kernel_t,
        out_shape=jax.ShapeDtypeStruct((dp, r), jnp.float32, vma=vma),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (dw16, block_cols), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((b, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (hw16, block_cols), lambda i, j: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((k, 1), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (td, b), lambda i, j: (j, i // bpd), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((td, k), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (td, block_cols), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * r * (b + k) * dp,
            bytes_accessed=r * (dw16 + hw16) * 2 * (dp // td)
            + (r + t) * dp * 4 + r * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(diag_bits_t, dpow2, hot_bits_t, hpow2, x_t, x_hot_t)
    return out[:d] if dp != d else out


def _resid_kernel_t(t2b_ref, mask_ref, pow2_ref, rows_ref, out_ref):
    """One grid step = one residual tile: unpack the [S, OB] multi-hot mask
    (slot-major bit layout), contract the slot axis on the MXU, accumulate
    into the tile's output block (tiles grouped per block, t2b sorted)."""
    i = pl.program_id(1)
    prev = t2b_ref[jnp.maximum(i - 1, 0)]
    first = jnp.logical_or(i == 0, t2b_ref[i] != prev)

    a = _unpack_tile_t16(mask_ref, pow2_ref, rows_ref.dtype)  # [S, OB]

    @pl.when(first)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jax.lax.dot_general(
        rows_ref[:], a, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_precision(rows_ref.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "res_ob", "feature_tile", "interpret", "vma"),
)
def residual_combine_t(
    rows_t: jax.Array,  # [D, M_pad] gathered slot rows (pad slots: any value)
    mask_s: jax.Array,  # [S/16, T*OB] uint16 multi-hot, slot-major (0 on pads)
    t2b: jax.Array,  # [T] int32 tile -> out-block, sorted ascending
    num_rows: int,
    res_ob: int,
    feature_tile: int = 128,
    interpret: bool = False,
    vma: frozenset | None = None,
) -> jax.Array:
    """out[D, num_rows] f32: residual-tier combine, transposed + fused.
    ``vma``: see slab_matmul_t.

    The slot-major mask layout stores slot s of a tile in word ``s % S16``
    bit ``s // S16`` with the tile's output rows on the lane axis, so one
    repeat + AND/select unpack (``_unpack_tile_t16``) yields the [S, OB]
    operand the transposed MXU contraction wants — no in-kernel transpose.
    """
    d, m_pad = rows_t.shape
    words, lanes = mask_s.shape
    s = words * 16
    t = t2b.shape[0]
    assert mask_s.dtype == jnp.uint16, "slot-major masks are uint16"
    assert lanes == t * res_ob and t * s == m_pad
    n_blocks = num_rows // res_ob

    td, dp = _feature_tiles_t(d, feature_tile)
    if dp != d:
        rows_t = jnp.pad(rows_t, ((0, dp - d), (0, 0)))

    out = pl.pallas_call(
        _resid_kernel_t,
        out_shape=jax.ShapeDtypeStruct((dp, num_rows), jnp.float32, vma=vma),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(dp // td, t),
            in_specs=[
                pl.BlockSpec(
                    (words, res_ob), lambda j, i, t2b_ref: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (s, 1), lambda j, i, t2b_ref: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (td, s), lambda j, i, t2b_ref: (j, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (td, res_ob), lambda j, i, t2b_ref: (j, t2b_ref[i]),
                memory_space=pltpu.VMEM,
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * res_ob * dp,
            bytes_accessed=m_pad * (words * 2 // max(s // res_ob, 1) + dp * 4)
            + n_blocks * res_ob * dp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(t2b, mask_s, _pow2_col(s, words), rows_t)
    return out[:d] if dp != d else out


def pack_slab_bits(rows: "np.ndarray", cols: "np.ndarray", num_rows: int, k: int):
    """Host-side slab builder, row-major [R, K/32] (the oracle/test view).
    Column j -> word j % (K/32), bit j // (K/32).  Device layouts store
    the transpose (see module docstring); use ``transpose_slab``."""
    import numpy as np

    w32 = k // 32
    bits = np.zeros((num_rows, w32), dtype=np.uint32)
    word = cols % w32
    bit = (cols // w32).astype(np.uint32)
    np.bitwise_or.at(bits, (rows, word), np.uint32(1) << bit)
    return bits


def transpose_slab(bits: "np.ndarray"):
    """[R, K/32] row-major uint32 oracle view -> [K/16, R] uint16 device
    layout (column j -> word j % W16, bit j // W16).  Test/probe helper;
    production builders pack the device layout directly
    (``pack_slab_bits_t``)."""
    import numpy as np

    r, w32 = bits.shape
    k = w32 * 32
    w16 = k // 16
    j = np.arange(k)
    dense = (
        (bits[:, j % w32] >> (j // w32).astype(np.uint32)) & np.uint32(1)
    ).astype(np.uint16)  # [R, K]
    out = np.zeros((w16, r), dtype=np.uint16)
    for b in range(16):
        out |= dense[:, b * w16 : (b + 1) * w16].T << np.uint16(b)
    return out


def pack_slab_bits_t(rows: "np.ndarray", cols: "np.ndarray", num_rows: int, k: int):
    """Host-side device-layout slab builder: [K/16, R] uint16, bit-major —
    column j -> word j % (K/16), bit j // (K/16) (see ``_unpack_tile_t16``).
    Built directly in the transposed orientation with one per-edge OR (a
    row-major build + strided transpose is cache-hostile at 10M+ edges)."""
    import numpy as np

    w16 = k // 16
    bits = np.zeros((w16, num_rows), dtype=np.uint16)
    np.bitwise_or.at(
        bits, (cols % w16, rows), np.uint16(1) << (cols // w16).astype(np.uint16)
    )
    return bits


def unpack_slab(bits: "np.ndarray", k: int):
    """Oracle unpack (tests): row-major [R, K/32] uint32 → [R, K] 0/1 f32."""
    import numpy as np

    w32 = k // 32
    j = np.arange(k)
    return (
        (bits[:, j % w32] >> (j // w32).astype(np.uint32)) & np.uint32(1)
    ).astype(np.float32)

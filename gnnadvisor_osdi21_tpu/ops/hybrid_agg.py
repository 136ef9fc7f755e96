"""Device-side hybrid diagonal/hot/residual aggregation (see
graphs/hybrid.py for the layout rationale and the measured TPU cost model
it optimizes).

``HybridTensors`` is the device pytree; ``hybrid_aggregate`` is the
forward kernel:

- diagonal tier: per-row-block Pallas bit-slab matmul against the block's
  own contiguous x slice (zero gathers),
- hot tier: Pallas bit-slab matmul against the gathered ``x[hot_ids]``
  table (one tiny K-row gather),
- residual tier: per-edge gather + batched one-hot MXU einsum + ONE
  fat-row ``segment_sum`` over tiles (scatter cost is per row and tile
  rows are ``res_ob·D`` wide, so the scatter is ~free).

Zero per-edge scatters anywhere; every reduction is deterministic.  All
arrays live in the padded row space [num_rows]; models run entirely in
that space and the loss masks padding rows out.

Kernel geometry (``block_rows``, ``feature_tile``) comes from the decider
(tuner/decider.py) — the warpPerBlock/sharedMem and dimWorker analogs —
and is per-layer meta on the pytree, so the two GCN layers can run the
same layout with different geometry (the set_input/set_hidden analog,
param.py:122-141).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from gnnadvisor_osdi21_tpu.graphs.hybrid import HybridGraph


@dataclasses.dataclass(frozen=True)
class HybridTensors:
    degrees: jax.Array  # [R] f32
    row_mask: jax.Array  # [R] f32
    # bit arrays stored transposed ([words, rows/slots]) — see
    # spmm_pallas module docstring (128-lane minor-dim padding)
    diag_bits: Optional[jax.Array]  # [B/16, R] uint16 or None
    hot_bits: Optional[jax.Array]  # [K/16, R] uint16 or None
    hot_ids: Optional[jax.Array]  # [K] int32 or None
    res_gather: Optional[jax.Array]  # [Ud] int32 unique dst rows (stage 1)
    res_dst: Optional[jax.Array]  # [M_pad] int32 into res_gather (stage 2)
    res_mask: Optional[jax.Array]  # [res_ob/32, M_pad] uint32 multi-hot
    res_mask_s: Optional[jax.Array]  # [res_tile/16, T*res_ob] uint16 slot-major
    res_t2b: Optional[jax.Array]  # [T] int32 tile -> out-block
    # static layout
    num_rows: int = 0
    real_nodes: int = 0
    diag_b: int = 0
    hot_k: int = 0
    res_tile: int = 128
    res_ob: int = 256
    # static kernel geometry (decider-owned, per layer)
    block_rows: int = 512
    feature_tile: int = 128
    # compute dtype for slab dots + residual einsum (accumulation is
    # always f32): "bfloat16" shaves ~20% off slab time at a ~0.4%
    # relative rounding cost; "float32" matches the oracle exactly
    agg_dtype: str = "float32"
    # transposed pipeline (v3): features live [D, R] with graph rows on
    # the 128-lane axis, so every stream is exact-bytes (no 8-16x lane
    # padding on narrow feature dims) — measured 3-4x faster slab passes
    # (bench/fixprobe.py).  When True, hybrid_aggregate takes and returns
    # [D, R] arrays and the models run transposed end-to-end.
    transposed: bool = False
    # every res_ob block has >=1 residual tile -> skip the visited select
    res_covers_all: bool = False
    # model-stack GEMM compute dtype (ops.aggregate._gemm; opt-in bf16)
    gemm_dtype: str = "float32"

    @property
    def method(self) -> str:
        return "hybrid"


jax.tree_util.register_dataclass(
    HybridTensors,
    data_fields=[
        "degrees", "row_mask", "diag_bits", "hot_bits", "hot_ids",
        "res_gather", "res_dst", "res_mask", "res_mask_s", "res_t2b",
    ],
    meta_fields=[
        "num_rows", "real_nodes", "diag_b", "hot_k", "res_tile", "res_ob",
        "block_rows", "feature_tile", "agg_dtype", "transposed",
        "res_covers_all", "gemm_dtype",
    ],
)


def build_hybrid_tensors(
    hg: HybridGraph,
    device=None,
    block_rows: int = 512,
    feature_tile: int = 128,
    agg_dtype: str = "float32",
    transposed: bool = False,
    agg_feature_dim: int | None = None,
    gemm_dtype: str = "float32",
) -> HybridTensors:
    from gnnadvisor_osdi21_tpu.graphs.hybrid import RES_SINGLE_MAX_CELLS

    put = lambda a: jax.device_put(jnp.asarray(a), device)
    has_res = hg.res_dst.size > 0
    # only the orientation the selected kernel reads goes on device; the
    # transposed TPU path needs the slot-major mask, the row-major path
    # (and the CPU reference fallback) the out-row-major one
    need_rowmajor_mask = has_res and (not transposed or not _on_tpu())
    need_slotmajor_mask = has_res and transposed and _on_tpu()
    # single-stage residual gather (hg.res_single): precompose the chain
    # so res_dst holds full-row ids and res_gather stays off-device; the
    # kernels branch on res_gather is None.  ``agg_feature_dim`` — the
    # width THIS layer's aggregate runs at (hidden/classes for GCN,
    # input/hidden for GIN) — gates the formulation per layer: wide rows
    # over long slot streams lose the single-stage overlap in epoch
    # context (RES_SINGLE_MAX_CELLS, measured r5).
    single = has_res and hg.res_single and (
        agg_feature_dim is None
        or hg.num_res_slots * agg_feature_dim <= RES_SINGLE_MAX_CELLS
    )
    return HybridTensors(
        degrees=put(hg.degrees),
        row_mask=put(hg.row_mask),
        diag_bits=put(hg.diag_bits) if hg.diag_b else None,
        hot_bits=put(hg.hot_bits) if hg.hot_k else None,
        hot_ids=put(hg.hot_ids) if hg.hot_k else None,
        res_gather=put(hg.res_gather) if has_res and not single else None,
        res_dst=put(hg.res_gather[hg.res_dst] if single else hg.res_dst)
        if has_res else None,
        res_mask=put(hg.res_mask) if need_rowmajor_mask else None,
        res_mask_s=put(hg.res_mask_s) if need_slotmajor_mask else None,
        res_t2b=put(hg.res_t2b) if has_res else None,
        num_rows=hg.num_rows,
        real_nodes=hg.real_nodes,
        diag_b=hg.diag_b,
        hot_k=hg.hot_k,
        res_tile=hg.res_tile,
        res_ob=hg.res_ob,
        block_rows=_sanitize_block_rows(block_rows, hg.diag_b),
        feature_tile=feature_tile,
        agg_dtype=agg_dtype,
        transposed=transposed,
        res_covers_all=hg.res_covers_all,
        gemm_dtype=gemm_dtype,
    )


def with_geometry(
    ht: HybridTensors, block_rows: int, feature_tile: int
) -> HybridTensors:
    """Same layout (shared device arrays), different kernel geometry —
    the per-layer set_input/set_hidden analog."""
    br = _sanitize_block_rows(block_rows, ht.diag_b)
    if br == ht.block_rows and feature_tile == ht.feature_tile:
        return ht
    return dataclasses.replace(ht, block_rows=br, feature_tile=feature_tile)


def _sanitize_block_rows(block_rows: int, diag_b: int) -> int:
    """Clamp to a power of two in [64, limit] where the limit is 512 (the
    row-alignment guarantee) unless a larger diag block raises it: num_rows
    is a multiple of max(diag_b, 512), so any power of two up to diag_b
    also divides num_rows."""
    limit = min(max(diag_b, 512), 2048)
    b = 64
    while b * 2 <= min(block_rows, limit):
        b *= 2
    return b


def _on_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _diag_aggregate(x: jax.Array, ht: HybridTensors) -> jax.Array:
    """Block-diagonal tier: one slab matmul per row block, block-local x."""
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas

    if _on_tpu():
        return spmm_pallas.diag_slab_matmul(
            ht.diag_bits, x, ht.diag_b,
            block_rows=ht.block_rows, feature_tile=ht.feature_tile,
        )
    # Reference path (CPU tests): explicit unpack of the transposed slab
    # (uint16 device layout: column j -> word j % W16, bit j // W16).
    # Dots run with f32 operands: XLA:CPU's DotThunk cannot execute
    # bf16 x bf16 -> f32 at some shapes (jax 0.9), and f32 products of
    # bf16-valued inputs are bit-identical to the bf16-operand MXU
    # contract (each product is exactly representable; accumulation is
    # f32 either way).
    b = ht.diag_b
    nb = ht.num_rows // b
    w16 = b // 16
    j = jnp.arange(b)
    a = ((ht.diag_bits[j % w16, :].T >> (j // w16).astype(jnp.uint16)[None, :])
         & 1).astype(jnp.float32)  # [R, B]
    return jnp.einsum(
        "gbc,gcd->gbd",
        a.reshape(nb, b, b),
        x.astype(jnp.float32).reshape(nb, b, -1),
        preferred_element_type=jnp.float32,
    ).reshape(ht.num_rows, -1)


def _hot_aggregate(x: jax.Array, ht: HybridTensors) -> jax.Array:
    """Hot tier: out = unpack(hot_bits) @ x[hot_ids] — global-table MXU."""
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas

    x_hot = jnp.take(x, ht.hot_ids, axis=0)  # [K, D], tiny
    if _on_tpu():
        return spmm_pallas.hot_slab_matmul(
            ht.hot_bits, x_hot,
            block_rows=ht.block_rows, feature_tile=ht.feature_tile,
        )
    k = ht.hot_k
    w16 = k // 16
    j = jnp.arange(k)
    # f32 operands: see _diag_aggregate's CPU-branch note
    a = ((ht.hot_bits[j % w16, :].T >> (j // w16).astype(jnp.uint16)[None, :])
         & 1).astype(jnp.float32)  # [R, K]
    return jnp.matmul(
        a, x_hot.astype(jnp.float32), preferred_element_type=jnp.float32
    )


def _residual_aggregate(x: jax.Array, ht: HybridTensors) -> jax.Array:
    """Residual tier: gather one row per unique (block, dst) pair, then a
    fused Pallas combine (mask unpack + MXU contraction + per-block
    accumulation in one kernel — no HBM round-trip for the unpacked
    one-hot, unlike the XLA-composed fallback below)."""
    d = x.shape[1]
    t = ht.res_t2b.shape[0]
    words = ht.res_ob // 32
    n_blocks = ht.num_rows // ht.res_ob
    if ht.res_gather is None:
        # single-stage: one gather from full x (res_dst holds full-row ids).
        # Measured win condition (DESIGN.md §8): the per-row full-table
        # premium (~7 vs ~2.2 ns) is smaller than the dropped gather op's
        # in-context ramp when the slot stream is short — the small-graph
        # regime; build_hybrid prices the choice (res_single).
        rows = jnp.take(x, ht.res_dst, axis=0)  # [M_pad, D]
    else:
        # two-stage gather: compact the unique destinations first
        # (big-table gathers cost ~2x small-table ones), then feed slots
        # from the small table
        compact = jnp.take(x, ht.res_gather, axis=0)
        rows = jnp.take(compact, ht.res_dst, axis=0)  # [M_pad, D]
    if _on_tpu():
        from gnnadvisor_osdi21_tpu.ops import spmm_pallas

        out = spmm_pallas.residual_combine(
            rows, ht.res_mask, ht.res_t2b, ht.num_rows, ht.res_ob
        )
        if ht.res_covers_all:
            return out
        # blocks with no residual tiles are never visited by the kernel
        # grid; select their rows to exact zeros
        visited = jnp.zeros(n_blocks, bool).at[ht.res_t2b].set(
            True, indices_are_sorted=True
        )
        return jnp.where(
            jnp.repeat(visited, ht.res_ob)[:, None], out, 0.0
        ).astype(out.dtype)
    # Reference path (CPU tests): same transposed bit-major mask layout,
    # explicit unpack + einsum + one fat-row segment_sum over tiles.
    # f32 operands: see _diag_aggregate's CPU-branch note.
    rows = rows.astype(jnp.float32).reshape(t, ht.res_tile, d)
    j = jnp.arange(ht.res_ob)
    oh = (
        (ht.res_mask[j % words, :].T.reshape(t, ht.res_tile, ht.res_ob)
         >> (j // words).astype(jnp.uint32)[None, None, :]) & 1
    ).astype(jnp.float32)  # [T, S, OB]
    chunks = jnp.einsum(
        "tso,tsd->tod", oh, rows, preferred_element_type=jnp.float32
    )  # [T, OB, D]
    flat = chunks.reshape(t, ht.res_ob * d)
    blocks = jax.ops.segment_sum(
        flat, ht.res_t2b, num_segments=n_blocks, indices_are_sorted=True
    )
    return blocks.reshape(ht.num_rows, d)


def _tiers_rowmajor(x: jax.Array, ht: HybridTensors) -> jax.Array:
    """Row-major tier composition (no degree scaling): fused slab pass on
    TPU, per-tier paths otherwise."""
    out = None
    if ht.diag_b and ht.hot_k and _on_tpu():
        # one fused row pass: the slab cost law is rows·(a + b·(B+K)) with
        # the fixed per-row term a dominating, so paying it once for both
        # slabs saves ~40% of the slab time (measured)
        from gnnadvisor_osdi21_tpu.ops import spmm_pallas

        x_hot = jnp.take(x, ht.hot_ids, axis=0)
        out = spmm_pallas.fused_slab_matmul(
            ht.diag_bits, ht.hot_bits, x, x_hot, ht.diag_b,
            block_rows=ht.block_rows, feature_tile=ht.feature_tile,
        )
    else:
        if ht.diag_b:
            out = _diag_aggregate(x, ht)
        if ht.hot_k:
            h = _hot_aggregate(x, ht)
            out = h if out is None else out + h
    if ht.res_dst is not None:
        r = _residual_aggregate(x, ht)
        out = r if out is None else out + r
    if out is None:
        out = jnp.zeros(x.shape, jnp.float32)
    return out


def _tiers_transposed(x_t: jax.Array, ht: HybridTensors) -> jax.Array:
    """Transposed tier composition ([D, R] in/out, no degree scaling).

    On TPU this runs the v3 exact-bytes kernels (spmm_pallas
    *_t variants); off-TPU it delegates to the row-major reference path at
    the boundary (tests exercise the same wiring, the Pallas kernels get
    their own interpret-mode tests)."""
    if not _on_tpu():
        return _tiers_rowmajor(x_t.T, ht).T
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas

    out = None
    if ht.diag_b and ht.hot_k:
        x_hot_t = jnp.take(x_t, ht.hot_ids, axis=1)
        out = spmm_pallas.fused_slab_matmul_t(
            ht.diag_bits, ht.hot_bits, x_t, x_hot_t, ht.diag_b,
            block_cols=ht.block_rows, feature_tile=ht.feature_tile,
        )
    else:
        if ht.diag_b:
            out = spmm_pallas.slab_matmul_t(
                ht.diag_bits, x_t, table_block_cols=ht.diag_b,
                block_cols=min(ht.block_rows, ht.diag_b),
                feature_tile=ht.feature_tile,
            )
        if ht.hot_k:
            x_hot_t = jnp.take(x_t, ht.hot_ids, axis=1)
            h = spmm_pallas.slab_matmul_t(
                ht.hot_bits, x_hot_t,
                block_cols=ht.block_rows, feature_tile=ht.feature_tile,
            )
            out = h if out is None else out + h
    if ht.res_dst is not None:
        r = residual_tier_t(x_t, ht)
        out = r if out is None else out + r
    if out is None:
        out = jnp.zeros(x_t.shape, jnp.float32)
    return out


def residual_tier_t(
    src_t: jax.Array, ht: HybridTensors, vma: frozenset | None = None
) -> jax.Array:
    """Transposed residual tier over an arbitrary gather source
    ``src_t [D, table]`` (the node features single-chip; the halo table on
    the distributed path — parallel/dist_hybrid.py shares this helper,
    passing ``vma`` so the Pallas combine satisfies check_vma=True)."""
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas

    if ht.res_gather is None:
        # single-stage (see _residual_aggregate): res_dst holds full-table
        # column ids, one gather op instead of two
        rows_t = jnp.take(src_t, ht.res_dst, axis=1)  # [D, M_pad]
    else:
        compact = jnp.take(src_t, ht.res_gather, axis=1)  # [D, Ud]
        rows_t = jnp.take(compact, ht.res_dst, axis=1)  # [D, M_pad]
    r = spmm_pallas.residual_combine_t(
        rows_t, ht.res_mask_s, ht.res_t2b, ht.num_rows, ht.res_ob,
        feature_tile=ht.feature_tile, vma=vma,
    )
    if not ht.res_covers_all:
        # blocks with no residual tiles were never visited by the kernel
        # grid; select their rows to exact zeros
        n_blocks = ht.num_rows // ht.res_ob
        visited = jnp.zeros(n_blocks, bool).at[ht.res_t2b].set(
            True, indices_are_sorted=True
        )
        r = jnp.where(jnp.repeat(visited, ht.res_ob)[None, :], r, 0.0)
    return r


def hybrid_aggregate(x: jax.Array, ht: HybridTensors, norm: bool) -> jax.Array:
    """out[s] = Σ_{d∈N(s)} w_sd · x[d] over the three-tier layout.

    Layout contract follows ``ht.transposed``: row-major ``[R, D]`` in/out
    when False, transposed ``[D, R]`` (rows on lanes) when True.

    GCN weighting (``norm``): pre-scale x rows by sqrt-degree, post-scale
    output rows — both dense — so no tier touches per-edge weights
    (the degree product factors: deg[s]·deg[d]·x[d] = deg[s]·(deg·x)[d]).
    """
    out_dtype = x.dtype
    if ht.transposed:
        if norm:
            x = x * ht.degrees[None, :].astype(x.dtype)
        out = _tiers_transposed(x.astype(ht.agg_dtype), ht)
        if norm:
            out = out * ht.degrees[None, :].astype(out.dtype)
        return out.astype(out_dtype)
    if norm:
        x = x * ht.degrees[:, None].astype(x.dtype)
    out = _tiers_rowmajor(x.astype(ht.agg_dtype), ht)
    if norm:
        out = out * ht.degrees[:, None].astype(out.dtype)
    return out.astype(out_dtype)

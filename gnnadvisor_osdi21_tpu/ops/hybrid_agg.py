"""Device-side hybrid hot/cold aggregation (see graphs/hybrid.py for the
layout rationale and the measured TPU cost model it optimizes).

``HybridTensors`` is the device pytree; ``hybrid_aggregate`` is the forward
kernel: hot bit-slab MXU matmul (Pallas on TPU, unpacked-XLA elsewhere) +
per-bucket block-packed gathers with c×c-bit mask matmuls, concatenated —
zero scatters.

All arrays live in the padded row space [num_rows]; models run entirely in
that space and the loss masks padding rows out.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gnnadvisor_osdi21_tpu.graphs.hybrid import HybridGraph


@dataclasses.dataclass(frozen=True)
class HybridTensors:
    degrees: jax.Array  # [R] f32
    row_mask: jax.Array  # [R] f32
    hot_bits: Optional[jax.Array]  # [R, K/32] uint32 or None
    hot_ids: Optional[jax.Array]  # [K] int32 or None
    block_dst: Tuple[jax.Array, ...]  # per bucket [np, w] int32 dst-pack ids
    block_mask: Tuple[jax.Array, ...]  # per bucket [np, w, c] uint32
    # static
    num_rows: int = 0
    real_nodes: int = 0
    pack_c: int = 1
    hot_k: int = 0
    bucket_packs: Tuple[int, ...] = ()
    cold_mode: str = "node"
    agg_dtype: str = "float32"  # "bfloat16" halves gather bandwidth

    @property
    def method(self) -> str:
        return "hybrid"


jax.tree_util.register_dataclass(
    HybridTensors,
    data_fields=[
        "degrees",
        "row_mask",
        "hot_bits",
        "hot_ids",
        "block_dst",
        "block_mask",
    ],
    meta_fields=[
        "num_rows", "real_nodes", "pack_c", "hot_k", "bucket_packs",
        "cold_mode", "agg_dtype",
    ],
)


def build_hybrid_tensors(
    hg: HybridGraph, device=None, agg_dtype: str = "float32"
) -> HybridTensors:
    put = lambda a: jax.device_put(jnp.asarray(a), device)
    return HybridTensors(
        degrees=put(hg.degrees),
        row_mask=put(hg.row_mask),
        hot_bits=put(hg.hot_bits) if hg.hot_k else None,
        hot_ids=put(hg.hot_ids) if hg.hot_k else None,
        block_dst=tuple(put(b.block_dst) for b in hg.buckets),
        block_mask=tuple(put(b.block_mask) for b in hg.buckets),
        num_rows=hg.num_rows,
        real_nodes=hg.real_nodes,
        pack_c=hg.pack_c,
        hot_k=hg.hot_k,
        bucket_packs=tuple(b.num_packs for b in hg.buckets),
        cold_mode=hg.cold_mode,
        agg_dtype=agg_dtype,
    )


def _hot_aggregate(x: jax.Array, ht: HybridTensors) -> jax.Array:
    """out_hot = unpack(hot_bits) @ x[hot_ids] — MXU path."""
    from gnnadvisor_osdi21_tpu.ops import spmm_pallas

    x_hot = jnp.take(x, ht.hot_ids, axis=0)  # [K, D], tiny
    if jax.default_backend() in ("tpu", "axon"):
        return spmm_pallas.hot_slab_matmul(ht.hot_bits, x_hot)
    # Reference path (CPU tests): explicit unpack, same bit-major layout.
    k = ht.hot_k
    w32 = k // 32
    j = jnp.arange(k)
    a = ((ht.hot_bits[:, j % w32] >> (j // w32).astype(jnp.uint32)) & 1).astype(
        x.dtype
    )
    return a @ x_hot


def _cold_aggregate(x: jax.Array, ht: HybridTensors) -> jax.Array:
    """Per-bucket block gather + bitmask reduction (zero scatters).

    "pack" mode: c×c blocks, einsum over (slot, dst-offset) — max dedup.
    "node" mode: c×1 blocks, one c-bit word broadcast across lane groups —
    the mask costs ~1 native VPU op per gathered row (the lane dimension
    stays at the native c·D width through every heavy op).
    """
    c = ht.pack_c
    d = x.shape[1]
    xp = x.reshape(ht.num_rows // c, c * d)
    outs = []
    if ht.cold_mode == "pack":
        off = jnp.arange(c, dtype=jnp.uint32)[None, None, None, :]
        for bd, bm, npk in zip(ht.block_dst, ht.block_mask, ht.bucket_packs):
            w = bd.shape[1]
            rows = jnp.take(xp, bd.reshape(-1), axis=0).reshape(npk, w, c, d)
            bits = ((bm[:, :, :, None] >> off) & 1).astype(x.dtype)  # [np,w,i,j]
            out = jnp.einsum(
                "pwij,pwjd->pid", bits, rows, preferred_element_type=jnp.float32
            )
            outs.append(out.reshape(npk * c, d).astype(x.dtype))
    else:  # node
        group = (jnp.arange(c * d, dtype=jnp.uint32) // d)[None, None, None, :]
        for bd, bm, npk in zip(ht.block_dst, ht.block_mask, ht.bucket_packs):
            w = bd.shape[2]
            rows = jnp.take(xp, bd.reshape(-1), axis=0).reshape(npk, c, w, c * d)
            m = ((bm[:, :, :, None] >> group) & 1).astype(x.dtype)
            s = (rows * m).sum(axis=2, dtype=jnp.float32)  # [np, c, c*d]
            out = s.reshape(npk, c, c, d).sum(axis=2)
            outs.append(out.reshape(npk * c, d))
    return jnp.concatenate(outs, axis=0)


def hybrid_aggregate(x: jax.Array, ht: HybridTensors, norm: bool) -> jax.Array:
    """out[s] = Σ_{d∈N(s)} w_sd · x[d] over the hybrid layout.

    GCN weighting (``norm``): pre-scale x rows by sqrt-degree, post-scale
    output rows — both dense — so neither path touches per-edge weights
    (the degree product factors: deg[s]·deg[d]·x[d] = deg[s]·(deg·x)[d]).
    """
    out_dtype = x.dtype
    if norm:
        x = x * ht.degrees[:, None].astype(x.dtype)
    # Optionally run the memory-bound gather paths at bf16 (accumulation
    # stays f32): halves HBM bytes on the dominant cost.
    x = x.astype(ht.agg_dtype)
    out = _cold_aggregate(x, ht)
    if ht.hot_k:
        out = out + _hot_aggregate(x, ht).astype(out.dtype)
    if norm:
        out = out * ht.degrees[:, None].astype(out.dtype)
    return out.astype(out_dtype)

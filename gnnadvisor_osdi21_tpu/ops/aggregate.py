"""Production aggregation ops with custom VJPs.

These are the TPU-native replacements for the five CUDA entry points
(SAG / GCN fwd+bwd / GIN fwd+bwd, GNNAdvisor_kernel.cu:110-814) and their
autograd wrappers (gnn_conv.py:7-126):

- forward aggregation dispatches over the path chosen by the decider
  (``GraphTensors.method``): padded-ELL gather + sorted segment-sum,
  dense MXU matmul, per-edge COO segment-sum, or a Pallas kernel;
- each op carries a ``jax.custom_vjp`` whose backward applies the **same
  forward aggregation** to the cotangent (exact for undirected graphs) —
  exactly the reference's backward structure (gnn_conv.py:23-27,
  GNNAdvisor_kernel.cu:448-473, :722-738).  This matters on TPU: the
  default autodiff of a gather is a scatter-add, which XLA serializes;
  our custom bwd replaces it with the same fast gather/segment kernel.

All reductions are deterministic (no atomics; the sorted two-level segment
reduction replaces ``atomicAdd_F``, GNNAdvisor_kernel.cu:12-17).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gnnadvisor_osdi21_tpu.ops.graph_tensors import GraphTensors


# ---------------------------------------------------------------------------
# Forward aggregation paths.
# ---------------------------------------------------------------------------


# Max bytes of materialized [parts, part_size, D] gather scratch per step.
# Above this the ELL pass chunks over part blocks with lax.map — large
# part sizes (the 512-wide end of the s7-4_1 study grid) would otherwise
# materialize >10 GB of padded gathers and OOM the 16 GB HBM.
_ELL_SCRATCH_BUDGET = 1 << 30


def _ell_part_sums(
    x: jax.Array, cols: jax.Array, lens: jax.Array, degrees, norm: bool
) -> jax.Array:
    """Per-part masked (weighted) sum over the partSize axis: the analog of
    a warp accumulating its part into shared memory
    (GNNAdvisor_kernel.cu:383-406)."""
    num_parts, part_size = cols.shape
    gathered = jnp.take(x, cols.reshape(-1), axis=0, indices_are_sorted=False).reshape(
        num_parts, part_size, -1
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_parts, part_size), 1)
    mask = lane < lens[:, None]
    if norm:
        w = jnp.where(mask, degrees[cols], 0.0)
    else:
        w = mask.astype(x.dtype)
    return jnp.einsum(
        "psd,ps->pd", gathered, w.astype(x.dtype), preferred_element_type=jnp.float32
    ).astype(x.dtype)


def _ell_aggregate(x: jax.Array, gt: GraphTensors, norm: bool) -> jax.Array:
    """Padded neighbor-group aggregation (the warp-per-part analog).

    Stage 1 — per-part masked (weighted) sum (``_ell_part_sums``), chunked
    over part blocks when the padded gather scratch would exceed the VMEM/HBM
    budget.  Stage 2 — sorted segment-sum of part partials into owner nodes:
    the deterministic analog of the atomic flush (:409-413).  The
    ``deg[src]`` factor is applied once per node at the end instead of per
    edge (algebraically identical, saves a gather).
    """
    num_parts, part_size = gt.part_cols.shape
    d = x.shape[1]
    if num_parts * part_size * d * 4 <= _ELL_SCRATCH_BUDGET:
        part_sums = _ell_part_sums(x, gt.part_cols, gt.part_lens, gt.degrees, norm)
    else:
        chunk = max(_ELL_SCRATCH_BUDGET // (part_size * d * 4), 1)
        n_chunks = -(-num_parts // chunk)
        pad = n_chunks * chunk - num_parts
        # padded parts point at row 0 with length 0: zero contribution
        cols = jnp.pad(gt.part_cols, ((0, pad), (0, 0)))
        lens = jnp.pad(gt.part_lens, (0, pad))

        def step(args):
            cols_c, lens_c = args
            return _ell_part_sums(x, cols_c, lens_c, gt.degrees, norm)

        part_sums = jax.lax.map(
            step,
            (
                cols.reshape(n_chunks, chunk, part_size),
                lens.reshape(n_chunks, chunk),
            ),
        ).reshape(n_chunks * chunk, -1)[:num_parts]
    out = jax.ops.segment_sum(
        part_sums, gt.part2node, num_segments=gt.num_nodes, indices_are_sorted=True
    )
    if norm:
        out = out * gt.degrees[:, None].astype(out.dtype)
    return out


def _dense_aggregate(x: jax.Array, gt: GraphTensors, norm: bool) -> jax.Array:
    """Whole-adjacency MXU matmul: out = D_s · A · D_s · x (or plain A·x).

    No CUDA analog — on TPU, small graphs are fastest as one dense matmul on
    the systolic array (N ≤ a few thousand ⇒ A fits easily and the MXU is
    ~100% utilized even at hidden=16 because the N×N side dominates).
    """
    a = gt.dense_adj
    if norm:
        xw = x * gt.degrees[:, None].astype(x.dtype)
        out = jnp.matmul(a, xw.astype(a.dtype), preferred_element_type=jnp.float32)
        return (out * gt.degrees[:, None]).astype(x.dtype)
    out = jnp.matmul(a, x.astype(a.dtype), preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _coo_aggregate(x: jax.Array, gt: GraphTensors, norm: bool) -> jax.Array:
    """Naive per-edge path — the Gunrock-SpMM-shaped baseline
    (Gunrock/app/spmm/spmm_enactor.cuh:92-105), atomics replaced by a
    sorted segment-sum."""
    vals = x[gt.coo_dst]
    if norm:
        w = gt.degrees[gt.coo_src] * gt.degrees[gt.coo_dst]
        vals = vals * w[:, None].astype(vals.dtype)
    return jax.ops.segment_sum(
        vals, gt.coo_src, num_segments=gt.num_nodes, indices_are_sorted=True
    )


def _dispatch_aggregate(x: jax.Array, gt, norm: bool) -> jax.Array:
    if gt.method == "hybrid":
        from gnnadvisor_osdi21_tpu.ops.hybrid_agg import hybrid_aggregate

        return hybrid_aggregate(x, gt, norm)
    if gt.method == "ell":
        return _ell_aggregate(x, gt, norm)
    if gt.method == "dense":
        return _dense_aggregate(x, gt, norm)
    if gt.method == "coo":
        return _coo_aggregate(x, gt, norm)
    raise ValueError(f"unknown aggregation method: {gt.method}")


def _zero_cotangent(tree):
    """Zero cotangents for a pytree that may contain integer leaves."""

    def zero(leaf):
        if leaf is None:
            return None
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            return jnp.zeros_like(leaf)
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)

    return jax.tree.map(zero, tree)


# ---------------------------------------------------------------------------
# Public ops (custom VJP).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def aggregate(x: jax.Array, gt: GraphTensors, norm: bool = False) -> jax.Array:
    """out[s] = Σ_{d∈N(s)} w_sd · x[d]; w = deg[s]·deg[d] if ``norm`` else 1."""
    return _dispatch_aggregate(x, gt, norm)


def _aggregate_fwd(x, gt, norm):
    return _dispatch_aggregate(x, gt, norm), gt


def _aggregate_bwd(norm, gt, g):
    # Undirected-graph assumption, as in the reference (gnn_conv.py:23-27):
    # the adjoint of the aggregation is the same aggregation.
    dx = _dispatch_aggregate(g, gt, norm)
    return dx, _zero_cotangent(gt)


aggregate.defvjp(_aggregate_fwd, _aggregate_bwd)


def sag(x: jax.Array, gt: GraphTensors) -> jax.Array:
    """Scatter-And-Gather: plain neighbor sum (ScatterAndGather,
    gnn_conv.py:7-28)."""
    return aggregate(x, gt, False)


def is_transposed(gt) -> bool:
    """True when the graph tensors use the transposed feature layout
    ([D, R], graph rows on the 128-lane axis — hybrid_agg.HybridTensors
    v3).  Ops and models adapt their matmul orientation to it."""
    return bool(getattr(gt, "transposed", False))


def _gemm(a: jax.Array, b: jax.Array, gt) -> jax.Array:
    """Model-stack GEMM at the tensors' ``gemm_dtype``.

    Default f32 keeps the reference's cuBLAS contract; "bfloat16" casts
    the operands (f32 accumulation via preferred_element_type) — an
    opt-in production lever: the dense stack is ~40% of a Type III GCN
    epoch, and bf16 halves its operand bytes at ~3e-3 relative rounding
    on the activations (params/optimizer stay f32)."""
    dt = getattr(gt, "gemm_dtype", "float32")
    if dt == "float32":
        return a @ b
    return jnp.matmul(
        a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32
    )


@jax.custom_vjp
def gcn_conv(x: jax.Array, weight: jax.Array, gt: GraphTensors) -> jax.Array:
    """Fused GCN layer: Agg(X @ W) with deg[s]·deg[d] weighting
    (GNNAFunction, gnn_conv.py:31-78).

    Transposed layout: x is [D, R], the GEMM becomes W^T @ X_t, and the
    aggregation runs the transposed kernels — same math, exact bytes."""
    h = _gemm(weight.T, x, gt) if is_transposed(gt) else _gemm(x, weight, gt)
    return _dispatch_aggregate(h, gt, True)


def _gcn_conv_fwd(x, weight, gt):
    h = _gemm(weight.T, x, gt) if is_transposed(gt) else _gemm(x, weight, gt)
    return _dispatch_aggregate(h, gt, True), (x, weight, gt)


def _gcn_conv_bwd(res, g):
    x, weight, gt = res
    d_ip = _dispatch_aggregate(g, gt, True)
    if is_transposed(gt):
        dx = _gemm(weight, d_ip, gt)  # [Din, R]
        dw = _gemm(x, d_ip.T, gt)  # [Din, H]
    else:
        dx = _gemm(d_ip, weight.T, gt)
        dw = _gemm(x.T, d_ip, gt)
    return dx, dw, _zero_cotangent(gt)


gcn_conv.defvjp(_gcn_conv_fwd, _gcn_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def gin_conv(
    x: jax.Array, weight: jax.Array, gt: GraphTensors, epsilon: float = 0.5
) -> jax.Array:
    """Fused GIN layer: (ε · Agg(X)) @ W, no normalization, no explicit
    self-term, ε=0.5 default (GNNAFunction_GIN, gnn_conv.py:101-126;
    GNNAdvisor_kernel.cu:559-617)."""
    x_agg = epsilon * _dispatch_aggregate(x, gt, False)
    return (
        _gemm(weight.T, x_agg, gt) if is_transposed(gt)
        else _gemm(x_agg, weight, gt)
    )


def _gin_conv_fwd(x, weight, gt, epsilon):
    x_agg = epsilon * _dispatch_aggregate(x, gt, False)
    # Save X_agg, not X — the reference's memory trick (gnn_conv.py:109).
    out = (
        _gemm(weight.T, x_agg, gt) if is_transposed(gt)
        else _gemm(x_agg, weight, gt)
    )
    return out, (x_agg, weight, gt)


def _gin_conv_bwd(epsilon, res, g):
    x_agg, weight, gt = res
    if is_transposed(gt):
        dw = _gemm(x_agg, g.T, gt)  # [Din, H]
        d_ip = _gemm(weight, g, gt)  # [Din, R]
    else:
        dw = _gemm(x_agg.T, g, gt)
        d_ip = _gemm(g, weight.T, gt)
    dx = epsilon * _dispatch_aggregate(d_ip, gt, False)
    return dx, dw, _zero_cotangent(gt)


gin_conv.defvjp(_gin_conv_fwd, _gin_conv_bwd)

"""5-layer GIN, matching the reference's inline ``Net`` (GNNA_main.py:154-171).

Each layer is a single-weight GIN convolution (GINConv, gnn_conv.py:128-147)
with ε=0.5, no MLP, no bias, no explicit self-term — aggregation is
``(ε · Σ_neighbors x) @ W`` (GNNAdvisor_kernel.cu:559-617).  ReLU between
layers, log_softmax at the end.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from gnnadvisor_osdi21_tpu.models.gcn import _uniform_weight
from gnnadvisor_osdi21_tpu.ops.aggregate import gin_conv
from gnnadvisor_osdi21_tpu.ops.graph_tensors import GraphTensors

NUM_LAYERS = 5


def init_gin(key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32):
    keys = jax.random.split(key, NUM_LAYERS)
    dims = [in_dim] + [hidden] * (NUM_LAYERS - 1) + [num_classes]
    return {
        f"conv{i + 1}": _uniform_weight(keys[i], dims[i], dims[i + 1], dtype)
        for i in range(NUM_LAYERS)
    }


def gin_apply(
    params,
    x: jax.Array,
    gts: Sequence[GraphTensors],
    epsilon: float = 0.5,
) -> jax.Array:
    """Forward pass → log-probabilities [N, classes] (or [classes, N] in
    the transposed feature layout)."""
    from gnnadvisor_osdi21_tpu.ops.aggregate import is_transposed

    gt_input, gt_hidden = gts[0], gts[-1]
    h = x
    for i in range(NUM_LAYERS):
        gt = gt_input if i == 0 else gt_hidden
        h = gin_conv(h, params[f"conv{i + 1}"], gt, epsilon)
        if i < NUM_LAYERS - 1:
            h = jax.nn.relu(h)
    return jax.nn.log_softmax(h, axis=0 if is_transposed(gt_input) else 1)

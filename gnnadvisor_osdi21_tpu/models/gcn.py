"""2-layer GCN, matching the reference's inline ``Net`` (GNNA_main.py:142-153).

Layers are bias-free single-weight GCN convolutions with uniform
``±1/sqrt(out_dim)`` init (GCNConv, gnn_conv.py:80-98); forward is
``log_softmax(conv2(relu(conv1(x))))``.  The per-layer parameter switch the
reference does with ``inputInfo.set_input()/set_hidden()`` (param.py:122-141)
is expressed here by passing a (possibly distinct) ``GraphTensors`` per layer.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from gnnadvisor_osdi21_tpu.ops.aggregate import gcn_conv
from gnnadvisor_osdi21_tpu.ops.graph_tensors import GraphTensors


def _uniform_weight(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> jax.Array:
    stdv = 1.0 / jnp.sqrt(jnp.asarray(out_dim, dtype=jnp.float32))
    return jax.random.uniform(
        key, (in_dim, out_dim), dtype=dtype, minval=-stdv, maxval=stdv
    )


def init_gcn(key, in_dim: int, hidden: int, num_classes: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": _uniform_weight(k1, in_dim, hidden, dtype),
        "conv2": _uniform_weight(k2, hidden, num_classes, dtype),
    }


def gcn_apply(
    params, x: jax.Array, gts: Sequence[GraphTensors]
) -> jax.Array:
    """Forward pass → log-probabilities [N, classes] (or [classes, N] in
    the transposed feature layout — see ops.aggregate.is_transposed).

    ``gts`` = (input-layer graph tensors, hidden-layer graph tensors); pass
    the same object twice when the decider chose identical configs.
    """
    from gnnadvisor_osdi21_tpu.ops.aggregate import is_transposed

    gt_input, gt_hidden = gts[0], gts[-1]
    h = jax.nn.relu(gcn_conv(x, params["conv1"], gt_input))
    out = gcn_conv(h, params["conv2"], gt_hidden)
    return jax.nn.log_softmax(out, axis=0 if is_transposed(gt_input) else 1)

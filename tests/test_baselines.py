"""Cross-framework equivalence: the torch baseline (an independent stack,
torch autograd + index_add_ scatter message passing) must produce the same
forward as the JAX models given identical weights — the strongest
correctness oracle available without the reference's CUDA kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from gnnadvisor_osdi21_tpu.baselines.torch_baseline import forward_numpy
from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
from gnnadvisor_osdi21_tpu.models import gcn_apply, gin_apply, init_gcn, init_gin
from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors


@pytest.fixture(scope="module")
def graph():
    return synthesize_graph(500, 4000, num_features=12, num_classes=4,
                            kind="powerlaw", seed=9)


@pytest.mark.parametrize("model", ["gcn", "gin"])
def test_torch_baseline_matches_jax_models(graph, model):
    g = graph
    x = np.random.default_rng(0).standard_normal(
        (g.num_nodes, 12), dtype=np.float32
    )
    gt = build_graph_tensors(g, method="ell", part_size=4)
    if model == "gcn":
        params = init_gcn(jax.random.PRNGKey(1), 12, 8, 4)
        ws = [np.asarray(params["conv1"]), np.asarray(params["conv2"])]
        ours = gcn_apply(params, jnp.asarray(x), (gt, gt))
    else:
        params = init_gin(jax.random.PRNGKey(1), 12, 8, 4)
        ws = [np.asarray(params[f"conv{i + 1}"]) for i in range(5)]
        ours = gin_apply(params, jnp.asarray(x), (gt, gt))
    theirs = forward_numpy(g, x, ws, model)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-3, atol=2e-3)


def test_torch_baseline_trains():
    from gnnadvisor_osdi21_tpu.baselines import torch_baseline as tb

    g = synthesize_graph(300, 2000, num_features=8, num_classes=3, seed=2)
    from gnnadvisor_osdi21_tpu.ops.reference import csr_to_coo

    src = torch.from_numpy(
        np.asarray(csr_to_coo(g.row_pointers, g.column_index), dtype=np.int64)
    )
    dst = torch.from_numpy(np.asarray(g.column_index, dtype=np.int64))
    deg = torch.from_numpy(np.asarray(g.degrees, dtype=np.float32))
    x = torch.from_numpy(g.init_embedding(8))
    y = torch.from_numpy(g.init_labels(3).astype(np.int64))
    ws = tb._init_weights("gcn", 8, 8, 3)
    opt = torch.optim.Adam(ws, lr=0.01)
    losses = []
    for _ in range(20):
        opt.zero_grad()
        loss = torch.nn.functional.nll_loss(
            tb.forward(ws, x, src, dst, deg, "gcn"), y
        )
        loss.backward()
        opt.step()
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

"""Torch GNN baseline — the second independent comparator stack.

The reference evaluates against TWO independent framework stacks,
``dgl_baseline/`` and ``pyg_baseline/`` (SURVEY.md §2.1 #20-21;
dgl_baseline/dgl_main.py, pyg_baseline/pyg_main.py).  ``jax_naive``
plays the DGL role on the TPU; this module plays the PyG role with a
genuinely different framework: torch (CPU build in this container) with
PyG-style ``index_select`` + ``index_add_`` (scatter-add) message
passing and torch autograd — zero shared code or compiler with the
tuned stack.

Besides the perf table role, it is a cross-framework correctness oracle:
``forward_numpy`` exposes the torch forward for equivalence tests against
the JAX models (tests/test_baselines.py).

Usage: python -m gnnadvisor_osdi21_tpu.baselines.torch_baseline [gcn|gin] [--quick]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _layers(model: str, dim: int, hidden: int, classes: int):
    if model == "gcn":
        return [(dim, hidden), (hidden, classes)]
    return [(dim, hidden), (hidden, hidden), (hidden, hidden),
            (hidden, hidden), (hidden, classes)]


def _init_weights(model, dim, hidden, classes, seed=0):
    """Same ±1/sqrt(out_dim) uniform init family as the reference's
    nn.Parameter reset (GNNAdvisor/gnn_conv.py param reset semantics)."""
    import torch

    gen = torch.Generator().manual_seed(seed)
    ws = []
    for i, o in _layers(model, dim, hidden, classes):
        bound = 1.0 / np.sqrt(o)
        w = torch.empty(i, o).uniform_(-bound, bound, generator=gen)
        ws.append(torch.nn.Parameter(w))
    return ws


def _aggregate(h, src, dst, weight=None):
    """out[s] += w_sd · h[d] — gather + index_add_ (the torch scatter-add
    idiom PyG's MessagePassing lowers to)."""
    import torch

    msg = h.index_select(0, dst)
    if weight is not None:
        msg = msg * weight[:, None]
    out = torch.zeros_like(h)
    out.index_add_(0, src, msg)
    return out


def forward(ws, x, src, dst, deg, model: str, eps: float = 0.5):
    import torch

    if model == "gcn":
        w_edge = deg[src] * deg[dst]
        h = torch.relu(_aggregate(x @ ws[0], src, dst, w_edge))
        h = _aggregate(h @ ws[1], src, dst, w_edge)
        return torch.log_softmax(h, dim=1)
    h = x
    for i, w in enumerate(ws):
        h = eps * _aggregate(h, src, dst) @ w
        if i < len(ws) - 1:
            h = torch.relu(h)
    return torch.log_softmax(h, dim=1)


def forward_numpy(graph, x: np.ndarray, ws_np, model: str) -> np.ndarray:
    """Cross-framework oracle hook: run the torch forward on NumPy inputs."""
    import torch

    from gnnadvisor_osdi21_tpu.ops.reference import csr_to_coo

    src = torch.from_numpy(
        np.asarray(csr_to_coo(graph.row_pointers, graph.column_index), dtype=np.int64)
    )
    dst = torch.from_numpy(np.asarray(graph.column_index, dtype=np.int64))
    deg = torch.from_numpy(np.asarray(graph.degrees, dtype=np.float32))
    ws = [torch.from_numpy(np.asarray(w, dtype=np.float32)) for w in ws_np]
    with torch.no_grad():
        out = forward(ws, torch.from_numpy(np.asarray(x, dtype=np.float32)),
                      src, dst, deg, model)
    return out.numpy()


def run(dataset: str, model: str, epochs: int) -> float:
    import torch

    from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, get_dataset
    from gnnadvisor_osdi21_tpu.ops.reference import csr_to_coo

    _, _, dim, classes, _, _ = DATASETS[dataset]
    g = get_dataset(dataset)
    src = torch.from_numpy(
        np.asarray(csr_to_coo(g.row_pointers, g.column_index), dtype=np.int64)
    )
    dst = torch.from_numpy(np.asarray(g.column_index, dtype=np.int64))
    deg = torch.from_numpy(np.asarray(g.degrees, dtype=np.float32))
    x = torch.from_numpy(g.init_embedding(dim))
    y = torch.from_numpy(g.init_labels(classes).astype(np.int64))
    hidden = 16 if model == "gcn" else 64
    ws = _init_weights(model, dim, hidden, classes)
    opt = torch.optim.Adam(ws, lr=0.01)

    def epoch():
        opt.zero_grad()
        loss = torch.nn.functional.nll_loss(forward(ws, x, src, dst, deg, model), y)
        loss.backward()
        opt.step()
        return loss

    for _ in range(10):
        loss = epoch()
    t0 = time.perf_counter()
    for _ in range(epochs):
        loss = epoch()
    float(loss)
    return (time.perf_counter() - t0) * 1e3 / epochs


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    model = argv[0] if argv and not argv[0].startswith("-") else "gcn"
    quick = "--quick" in argv
    from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, QUICK

    roster = QUICK if quick else list(DATASETS)
    if "--dataset" in argv:  # single-config mode (resumable campaigns)
        roster = [argv[argv.index("--dataset") + 1]]
    epochs = 50 if quick else 200
    if "--epochs" in argv:
        epochs = int(argv[argv.index("--epochs") + 1])
    for name in roster:
        print(f"Namespace(dataset='{name}', baseline='torch')")
        ms = run(name, model, epochs)
        print(f"Time (ms): {ms:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

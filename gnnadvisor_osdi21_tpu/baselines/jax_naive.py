"""Naive pure-JAX GNN baseline — the sibling-stack comparator.

Plays the role of the reference's ``dgl_baseline/`` and ``pyg_baseline/``
(SURVEY.md §2.1 #20-21): an independent, framework-idiomatic implementation
of the same 2-layer GCN / 5-layer GIN workloads, with *none* of this
framework's layout or kernel machinery — per-edge COO gather +
``segment_sum`` aggregation, default autodiff (so the backward is XLA's
scatter-add), standard training loop.  Speedups of the tuned stack over
this baseline on identical hardware are the TPU analog of the
GNNAdvisor-vs-DGL tables.

Usage: python -m gnnadvisor_osdi21_tpu.baselines.jax_naive [gcn|gin] [--quick]
"""

from __future__ import annotations

import sys
import time


def gcn_layer(x, w, coo_src, coo_dst, degrees, n):
    import jax

    h = x @ w
    vals = h[coo_dst] * (degrees[coo_src] * degrees[coo_dst])[:, None]
    return jax.ops.segment_sum(vals, coo_src, num_segments=n, indices_are_sorted=True)


def gin_layer(x, w, coo_src, coo_dst, n, eps=0.5):
    import jax

    agg = eps * jax.ops.segment_sum(
        x[coo_dst], coo_src, num_segments=n, indices_are_sorted=True
    )
    return agg @ w


def run(dataset: str, model: str, epochs: int) -> float:
    from gnnadvisor_osdi21_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from gnnadvisor_osdi21_tpu.bench.datasets import DATASETS, get_dataset
    from gnnadvisor_osdi21_tpu.models import init_gcn, init_gin
    from gnnadvisor_osdi21_tpu.ops import reference

    _, _, dim, classes, _, _ = DATASETS[dataset]
    g = get_dataset(dataset)
    n = g.num_nodes
    src = jnp.asarray(reference.csr_to_coo(g.row_pointers, g.column_index))
    dst = jnp.asarray(g.column_index)
    deg = jnp.asarray(g.degrees)
    x = jnp.asarray(g.init_embedding(dim))
    y = jnp.asarray(g.init_labels(classes))
    hidden = 16 if model == "gcn" else 64

    if model == "gcn":
        params = init_gcn(jax.random.PRNGKey(0), dim, hidden, classes)

        def fwd(p, x_):
            h = jax.nn.relu(gcn_layer(x_, p["conv1"], src, dst, deg, n))
            return jax.nn.log_softmax(gcn_layer(h, p["conv2"], src, dst, deg, n), 1)

    else:
        params = init_gin(jax.random.PRNGKey(0), dim, hidden, classes)

        def fwd(p, x_):
            h = x_
            for i in range(5):
                h = gin_layer(h, p[f"conv{i + 1}"], src, dst, n)
                if i < 4:
                    h = jax.nn.relu(h)
            return jax.nn.log_softmax(h, 1)

    opt = optax.adam(0.01)
    opt_state = opt.init(params)

    def loss_fn(p, x_, y_):
        lp = fwd(p, x_)
        return -jnp.take_along_axis(lp, y_[:, None].astype(jnp.int32), 1).mean()

    @jax.jit
    def step(p, s, x_, y_):
        loss, grads = jax.value_and_grad(loss_fn)(p, x_, y_)
        upd, s = opt.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    for _ in range(10):
        params, opt_state, loss = step(params, opt_state, x, y)
    float(loss)  # host fetch = reliable fence (see train.py)
    t0 = time.perf_counter()
    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state, x, y)
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
        print(f"Namespace(dataset='{name}', baseline='jax_naive')")
        ms = run(name, model, epochs)
        print(f"Time (ms): {ms:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

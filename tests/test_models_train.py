"""End-to-end model/training tests (reference GNNA_main.py protocol)."""

import jax
import numpy as np
import pytest

from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
from gnnadvisor_osdi21_tpu.train import train_and_time
from gnnadvisor_osdi21_tpu.tuner.decider import InputProperty


@pytest.mark.parametrize("model,hidden", [("gcn", 16), ("gin", 64)])
def test_training_decreases_loss(small_graph, model, hidden):
    g = small_graph
    gt = build_graph_tensors(g, method="ell", part_size=4)
    x = jax.numpy.asarray(g.init_embedding(16, seed=0))
    y = jax.numpy.asarray(g.init_labels(g.num_classes))
    res = train_and_time(
        model, (gt, gt), x, y, hidden=hidden, num_classes=g.num_classes,
        num_epochs=30, dry_run=5,
    )
    assert np.isfinite(res["final_loss"])
    # All-ones labels: the model should fit them nearly perfectly.
    assert res["final_loss"] < 0.5


def test_decider_pipeline_end_to_end(skewed_graph):
    """Auto decider → tensors → 2-layer GCN forward, no manual params."""
    prop = InputProperty(skewed_graph, hidden_dim=16).decider()
    assert prop.layer_input is not None
    gts = prop.build_tensors()
    x = jax.numpy.asarray(prop.graph.init_embedding(prop.graph.num_features))
    y = jax.numpy.asarray(prop.graph.init_labels(prop.graph.num_classes))
    res = train_and_time(
        "gcn", gts, x, y, hidden=16, num_classes=prop.graph.num_classes,
        num_epochs=5, dry_run=2,
    )
    assert np.isfinite(res["final_loss"])


def test_dense_and_ell_models_agree(small_graph):
    """Same params, same graph ⇒ dense-MXU and ELL paths give the same
    log-probs (per-layer activation parity, SURVEY.md §4)."""
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.models import gcn_apply, init_gcn

    g = small_graph
    params = init_gcn(jax.random.PRNGKey(0), 16, 16, g.num_classes)
    x = jnp.asarray(g.init_embedding(16, seed=1))
    gt_ell = build_graph_tensors(g, method="ell", part_size=4)
    gt_dense = build_graph_tensors(g, method="dense")
    out_ell = gcn_apply(params, x, (gt_ell, gt_ell))
    out_dense = gcn_apply(params, x, (gt_dense, gt_dense))
    np.testing.assert_allclose(
        np.asarray(out_ell), np.asarray(out_dense), rtol=1e-3, atol=1e-4
    )


def test_accuracy_helper(small_graph):
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.train import accuracy

    lp = jnp.log(jnp.asarray([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]]))
    y = jnp.asarray([0, 1, 1])
    assert float(accuracy(lp, y)) == pytest.approx(2 / 3)
    mask = jnp.asarray([1.0, 1.0, 0.0])
    assert float(accuracy(lp, y, mask)) == pytest.approx(1.0)


def test_scan_chunking_respects_exec_budget(small_graph, monkeypatch):
    """A tiny _MAX_EXEC_S must force multi-chunk scans (the TPU-worker
    watchdog guard) while still training to the protocol's epoch count."""
    from gnnadvisor_osdi21_tpu import train as train_mod

    monkeypatch.setattr(train_mod, "_MAX_EXEC_S", 1e-9)  # chunk == 1 epoch
    g = small_graph
    gt = build_graph_tensors(g, method="ell", part_size=4)
    x = jax.numpy.asarray(g.init_embedding(16, seed=0))
    y = jax.numpy.asarray(g.init_labels(g.num_classes))
    res = train_and_time(
        "gcn", (gt, gt), x, y, hidden=8, num_classes=g.num_classes,
        num_epochs=7, dry_run=2, use_scan=True,
    )
    # chunk == 1 epoch; the tiny-run oversampling may take extra timed
    # executions (the protocol count is a floor, not an exact number)
    assert res["num_epochs"] >= 7
    # step accounting stays exact: 2x2 warmup epochs + every timed epoch
    # (chunk2 = 1 // 8 = 0, so no second-point program at this chunk size)
    assert res["step"] == 4 + res["num_epochs"]
    assert np.isfinite(res["final_loss"])


def test_accuracy_helper_transposed():
    import jax.numpy as jnp

    from gnnadvisor_osdi21_tpu.train import accuracy

    lp = jnp.log(jnp.asarray([[0.9, 0.2, 0.4], [0.1, 0.8, 0.6]]))  # [C, N]
    y = jnp.asarray([0, 1, 0])
    assert float(accuracy(lp, y, transposed=True)) == pytest.approx(2 / 3)

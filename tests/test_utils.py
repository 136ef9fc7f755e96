"""Checkpoint + profiling utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gnnadvisor_osdi21_tpu.models import init_gcn
from gnnadvisor_osdi21_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from gnnadvisor_osdi21_tpu.utils.profiling import spmm_roofline


def test_checkpoint_roundtrip(tmp_path):
    params = init_gcn(jax.random.PRNGKey(0), 8, 4, 3)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, params, opt_state, step=42)

    params2 = init_gcn(jax.random.PRNGKey(1), 8, 4, 3)  # different values
    p, s, step = load_checkpoint(path, params2, opt.init(params2))
    assert step == 42
    for k in params:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(params[k]))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        s, opt_state,
    )


def test_checkpoint_params_only(tmp_path):
    params = {"w": jnp.ones((3, 3))}
    path = str(tmp_path / "p.npz")
    save_checkpoint(path, params)
    p, s, step = load_checkpoint(path, {"w": jnp.zeros((3, 3))})
    assert s is None and step == 0
    np.testing.assert_array_equal(np.asarray(p["w"]), np.ones((3, 3)))


def test_roofline_math():
    r = spmm_roofline(1e-3, nnz=1_000_000, dim=16, num_nodes=100_000)
    assert r.bytes_accessed == (1_100_000) * 16 * 4
    assert 0 < r.hbm_fraction < 1
    assert "GB/s" in str(r)


def test_train_resume_equivalence(tmp_path):
    """N epochs straight == N/2 epochs + checkpoint + resume + N/2 epochs
    (the --save_ckpt/--resume CLI path)."""
    from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph
    from gnnadvisor_osdi21_tpu.ops.graph_tensors import build_graph_tensors
    from gnnadvisor_osdi21_tpu.train import train_and_time

    g = synthesize_graph(200, 1500, num_features=8, num_classes=4, seed=3)
    gt = build_graph_tensors(g, method="dense")
    x = jnp.asarray(g.init_embedding(8))
    y = jnp.asarray(g.init_labels(4))
    kw = dict(hidden=8, num_classes=4, dry_run=0, use_scan=False, seed=11)

    straight = train_and_time("gcn", (gt, gt), x, y, num_epochs=20, **kw)

    ck = str(tmp_path / "half.ckpt.npz")
    half = train_and_time("gcn", (gt, gt), x, y, num_epochs=10,
                          save_ckpt=ck, **kw)
    resumed = train_and_time("gcn", (gt, gt), x, y, num_epochs=10,
                             resume=ck, **kw)

    assert resumed["step"] == 20
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        straight["params"], resumed["params"],
    )
    assert abs(straight["final_loss"] - resumed["final_loss"]) < 1e-5

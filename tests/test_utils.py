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

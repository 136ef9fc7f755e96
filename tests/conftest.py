"""Test env: CPU backend with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh, per SURVEY.md §4's multi-host test strategy)."""

import os
import sys

# The container exports JAX_PLATFORMS=axon (real TPU through a tunnel) and a
# sitecustomize that re-registers the axon plugin, so a plain env override is
# not enough — force the CPU backend through the config API before any
# backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from gnnadvisor_osdi21_tpu.graphs.loader import synthesize_graph  # noqa: E402


@pytest.fixture(scope="session")
def small_graph():
    """A small symmetric community graph (undirected, like the reference's
    evaluation graphs)."""
    g = synthesize_graph(200, 1600, kind="community", seed=3)
    # Symmetrize: the reference's graphs are undirected; its backward pass
    # assumes A == A^T (gnn_conv.py:23-27).
    ei = np.concatenate([g.edge_index, g.edge_index[::-1]], axis=1)
    from gnnadvisor_osdi21_tpu.graphs.loader import _from_edges

    return _from_edges(ei[0], ei[1], g.num_nodes, g.num_features, g.num_classes)


@pytest.fixture(scope="session")
def skewed_graph():
    """Power-law graph with degree skew (exercises part padding)."""
    return synthesize_graph(500, 5000, kind="powerlaw", seed=7)


@pytest.fixture(autouse=True)
def _isolated_probe_cache(tmp_path, monkeypatch):
    """Probe verdicts written during tests (fake timers!) must never land
    in the repo-level data/.probe_cache.json."""
    monkeypatch.setenv("GNNADVISOR_CACHE_DIR", str(tmp_path))

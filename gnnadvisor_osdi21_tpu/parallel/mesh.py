"""Mesh construction + jax.distributed init helpers.

The reference has no distributed layer (GNNA_main.py:53 asserts one GPU);
this is new TPU-native capability: a 1-D ``"graph"`` mesh over which node
row-blocks are sharded.  On a multi-host pod slice, call
``initialize_distributed()`` first (jax.distributed handles the rendezvous);
on a single host the mesh simply spans local devices.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GRAPH_AXIS = "graph"


def initialize_distributed(**kwargs) -> None:
    """Multi-host init (no-op if already initialized or single-process)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process environment


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if len(devices) < num_devices:
            raise ValueError(
                f"need {num_devices} devices, have {len(devices)} "
                "(for CPU testing set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
            )
        devices = devices[:num_devices]
    return Mesh(devices, (GRAPH_AXIS,))


def sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))

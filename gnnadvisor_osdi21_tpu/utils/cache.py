"""Persistent XLA compilation cache.

TPU compiles in this environment go through a remote compiler at
~2-20 min per fresh program; the persistent cache turns every repeat
(bench grids, studies, subprocess fan-outs) into a ~2 s reload.  Call
``enable_compile_cache()`` before the first jit — all CLI/bench entry
points do.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.environ.get(
    "GNNADVISOR_TPU_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"),
)


def enable_compile_cache(directory: str | None = None) -> str:
    import jax

    directory = directory or DEFAULT_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception:
        pass
    return directory

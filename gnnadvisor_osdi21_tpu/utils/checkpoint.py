"""Minimal checkpoint/resume (new capability; the reference has none —
SURVEY.md §5 'Checkpoint / resume': runs are 200-epoch throwaways).

Stores params + opt_state pytrees as a single ``.npz`` keyed by flattened
tree paths — dependency-light and portable; orbax is overkill for the
reference's workloads but the layout here is compatible with swapping it
in later.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, params, opt_state=None, step: int = 0) -> None:
    payload = {f"params:{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        payload.update({f"opt:{k}": v for k, v in _flatten(opt_state).items()})
    payload["__step__"] = np.asarray(step)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)


def load_checkpoint(path: str, params_template, opt_state_template=None):
    """Restore into the given pytree templates; returns
    (params, opt_state, step)."""
    data = np.load(path, allow_pickle=False)

    def restore(template, prefix):
        flat = _flatten(template)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        keys = [
            "/".join(str(p) for p in path)
            for path, _ in jax.tree_util.tree_flatten_with_path(template)[0]
        ]
        new_leaves = [data[f"{prefix}:{k}"] for k in keys]
        del flat
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = restore(params_template, "params")
    opt_state = (
        restore(opt_state_template, "opt") if opt_state_template is not None else None
    )
    return params, opt_state, int(data["__step__"])

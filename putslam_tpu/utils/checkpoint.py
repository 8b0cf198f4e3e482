"""Checkpoint / resume for full SLAM state.

The reference can only dump its graph at end-of-run (g2o text,
graph_g2o.cpp:679-694; partial map text featuresMap.cpp:1297-1347) with no
mid-run resume. Here the whole ``SlamState`` is a pytree of arrays, so
checkpointing is exact and resume is first-class: any step's state can be
serialized and the scan continued bit-identically.

Format: one ``.npz`` with path-flattened arrays (portable, no orbax server
dependencies; orbax can be layered on for multi-host async checkpoints).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_state(path: str, state: Any) -> None:
    """Serialize any array pytree (e.g. models.slam.SlamState) to ``path``."""
    flat = jax.tree_util.tree_flatten_with_path(state)[0]
    arrays = {_path_str(p): np.asarray(v) for p, v in flat}
    np.savez_compressed(path, **arrays)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_state`. ``template`` supplies the
    tree structure (e.g. a freshly-initialized state of the same config)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in flat:
        key = _path_str(p)
        if key not in data:
            raise KeyError(f"checkpoint missing leaf {key!r}")
        arr = data[key]
        if arr.shape != np.shape(tmpl):
            raise ValueError(
                f"checkpoint leaf {key!r} shape {arr.shape} != template "
                f"{np.shape(tmpl)} (config mismatch?)")
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, [l for l in leaves])

"""Per-module checkpoint I/O.

Mirrors the reference layout (one file per submodule in a per-epoch
directory, PoSFeat_model.py:57-81; trainer.py:265-268) with flax msgpack
payloads instead of torch .pth. `<dir>/<module>.msgpack` holds the full
variables tree (params + batch_stats). Loading is template-free
(msgpack_restore), so checkpoints survive refactors of module python code
as long as the tree structure matches.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_numpy_tree(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_module_variables(variables: Dict[str, Any], path_base: str) -> str:
    """Write variables tree to `<path_base>.msgpack`."""
    path = path_base + ".msgpack"
    data = serialization.msgpack_serialize(_to_numpy_tree(variables))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def load_module_variables(
    path_base: str, template: Optional[Dict[str, Any]] = None
) -> Optional[Dict[str, Any]]:
    """Read `<path_base>.msgpack`; returns None if absent.

    If a template is given, the restored tree structure is validated
    against it (same keys, same leaf shapes).
    """
    path = path_base + ".msgpack"
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    if template is not None:
        t_paths = jax.tree.structure(template)
        r_paths = jax.tree.structure(tree)
        if t_paths != r_paths:
            raise ValueError(
                f"checkpoint {path} tree mismatch:\n{r_paths}\nvs template\n{t_paths}"
            )
        mismatch = [
            (p, a.shape, b.shape)
            for (p, a), b in zip(
                jax.tree_util.tree_leaves_with_path(tree),
                jax.tree.leaves(template),
            )
            if a.shape != b.shape
        ]
        if mismatch:
            raise ValueError(f"checkpoint {path} shape mismatch: {mismatch[:5]}")
    return jax.tree.map(jnp.asarray, tree)

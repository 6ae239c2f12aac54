"""Checkpoint/resume for optimization state.

Reference: the renderer itself is stateless (re-render from seed,
SURVEY §5.4); optimization state lives in Python
(Optimizer.variables/state, ad/optimizers.py:10-31).  Here: orbax-backed
checkpointing of arbitrary param/optimizer pytrees, with a plain-npz
fallback — covers the lens-design runs and inverse-rendering loops.
"""
from __future__ import annotations

import os

import numpy as np
import jax


def save_checkpoint(path: str, pytree, step: int | None = None):
    """Save a pytree of arrays (params, optimizer state, ...)."""
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, pytree, force=True)
        ckptr.wait_until_finished()
        return path
    except Exception:
        flat, treedef = jax.tree_util.tree_flatten(pytree)
        np.savez(
            path if path.endswith(".npz") else path + ".npz",
            *[np.asarray(x) for x in flat],
            __treedef__=np.asarray(str(treedef)),
            __step__=np.asarray(-1 if step is None else step),
        )
        return path if path.endswith(".npz") else path + ".npz"


def load_checkpoint(path: str, like_pytree):
    """Restore into the structure of ``like_pytree``."""
    try:
        import orbax.checkpoint as ocp

        if os.path.isdir(path):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(os.path.abspath(path), like_pytree)
    except Exception:
        pass
    npz = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz, allow_pickle=False)
    flat, treedef = jax.tree_util.tree_flatten(like_pytree)
    arrays = [data[f"arr_{i}"] for i in range(len(flat))]
    import jax.numpy as jnp

    return treedef.unflatten([jnp.asarray(a) for a in arrays])

"""Scene parameter traversal — the mi.traverse()/SceneParameters analogue.

Reference: src/python/python/util.py:13-292 (``SceneParameters`` dict-like
view with update() propagation; ``traverse()``).

TPU design: the Scene *is* a pytree, so a "parameter view" is just a dict
of keypath-string -> leaf array.  ``update`` rebuilds the scene by
substituting leaves at those paths (objects are immutable values —
parameters_changed becomes reconstruction).  The BVH rebuild the reference
triggers on geometry edits (scene.cpp:481-509) maps to ``refresh_accel``.
"""
from __future__ import annotations

import re

import numpy as np
import jax
import jax.numpy as jnp


def _path_str(keypath) -> str:
    out = []
    for k in keypath:
        if hasattr(k, "name"):
            out.append(str(k.name))
        elif hasattr(k, "idx"):
            out.append(str(k.idx))
        elif hasattr(k, "key"):
            out.append(str(k.key))
        else:
            out.append(re.sub(r"[^\w]", "", str(k)))
    return ".".join(out)


def traverse(scene, include=None):
    """Flatten the scene into {path: leaf}.

    ``include``: optional regex — only matching paths are returned (the
    reference workflow's ``params.keep(...)``).
    """
    leaves = jax.tree_util.tree_flatten_with_path(scene)[0]
    out = {}
    for keypath, leaf in leaves:
        p = _path_str(keypath)
        if include is None or re.search(include, p):
            out[p] = leaf
    return out


def update(scene, params: dict):
    """Return a new scene with the given {path: value} leaves substituted."""

    def repl(keypath, leaf):
        p = _path_str(keypath)
        if p in params:
            new = jnp.asarray(params[p], jnp.float32 if jnp.issubdtype(
                jnp.asarray(params[p]).dtype, jnp.floating) else None)
            return new.astype(leaf.dtype) if hasattr(leaf, "dtype") else new
        return leaf

    return jax.tree_util.tree_map_with_path(repl, scene)


def refresh_accel(scene):
    """Rebuild the host-side BVH after geometry edits
    (Scene::parameters_changed, scene.cpp:481-509)."""
    from ..models.scene import make_scene

    if not scene.use_bvh:
        return scene
    from ..ops import bvh as bvh_mod

    offsets = np.cumsum(
        [0] + [int(m.vertices.shape[0]) for m in scene.meshes]
    )
    faces_np = np.concatenate([
        np.asarray(m.faces) + offsets[i]
        for i, m in enumerate(scene.meshes)
    ])
    verts_np = np.concatenate(
        [np.asarray(m.vertices) for m in scene.meshes]
    )
    return scene.replace(accel=bvh_mod.build_bvh(verts_np, faces_np))


class SceneParameters(dict):
    """Dict view bound to a scene; ``apply()`` returns the updated scene.

    Mirrors the reference's SceneParameters dirty-tracking update flow
    (util.py:148-185) in functional form.
    """

    def __init__(self, scene, include=None):
        super().__init__(traverse(scene, include))
        self._scene = scene

    def keep(self, pattern):
        keys = [k for k in self if not re.search(pattern, k)]
        for k in keys:
            del self[k]
        return self

    def apply(self, rebuild_accel: bool = False):
        scene = update(self._scene, dict(self))
        if rebuild_accel:
            scene = refresh_accel(scene)
        return scene

"""BVH build (host, numpy) + stackless batched traversal (pure JAX).

Replaces the reference's three acceleration backends (Embree
scene_embree.inl, OptiX scene_optix.inl, native kd-tree kdtree.h:371) with a
TPU-shaped design:

- **Build** runs on host in numpy at scene-construction /
  parameters_changed time (the reference also rebuilds its BVH outside the
  differentiable pass, scene.cpp:481-509).  Median-split over centroids,
  fixed max leaf size; nodes flattened in DFS order.
- **Traversal** is stackless via threaded *miss links*: in DFS order the
  "hit" successor of an inner node is `node+1`, and every node stores the
  node to visit when its box is missed (or after a leaf is processed).
  Each wavefront lane carries only a node cursor (int32) — no per-lane
  stack — so the whole traversal is a `lax.while_loop` over SoA state,
  which XLA maps onto the VPU without scatter/gather of stack memory.
- Leaves are padded so every leaf tests exactly LEAF_SIZE triangle slots:
  static shapes, no data-dependent control flow.

The Pallas packet traversal (ops/pallas/traverse.py) is the shipped fast
path built on the same miss-link layout; this module is the correctness
reference (used for parity tests and the pure-JAX fallback) and is
already vector-friendly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core.math import safe_rcp
from ..core.records import PreliminaryIntersection, Ray
from .intersect import ray_triangle

INF = jnp.float32(jnp.inf)
LEAF_SIZE = 4


@pytree
class BVH:
    bbox_lo: jnp.ndarray   # (M, 3)
    bbox_hi: jnp.ndarray   # (M, 3)
    first: jnp.ndarray     # (M,) start into prims for leaves
    count: jnp.ndarray     # (M,) prim count (0 = inner node)
    miss: jnp.ndarray      # (M,) miss link (-1 = exit)
    prims: jnp.ndarray     # (P + LEAF_SIZE,) permuted face ids, padded
    # static refit metadata (refit_bvh; None on legacy instances)
    refit: object = static(None)


def _with_refit_meta(lo, hi, first, count, miss, prims, faces) -> BVH:
    """Assemble a BVH pytree + the static metadata refit_bvh needs."""
    from .pallas.traverse import _StaticObj, _refit_levels

    leaf_nodes, levels = _refit_levels(np.asarray(count),
                                       np.asarray(miss))
    first_np = np.asarray(first)[leaf_nodes]
    count_np = np.asarray(count)[leaf_nodes]
    mc = int(count_np.max()) if len(count_np) else 1
    slots = first_np[:, None] + np.arange(mc)[None, :]   # (nl, mc)
    valid = np.arange(mc)[None, :] < count_np[:, None]
    slots = np.where(valid, slots, 0)
    tri = np.asarray(prims)[slots]                       # (nl, mc)
    tri = np.where(valid, tri, 0)
    vids = np.asarray(faces, np.int64)[tri]              # (nl, mc, 3)
    meta = _StaticObj((leaf_nodes, levels,
                       vids.astype(np.int32), valid))
    return BVH(
        bbox_lo=jnp.asarray(lo), bbox_hi=jnp.asarray(hi),
        first=jnp.asarray(first), count=jnp.asarray(count),
        miss=jnp.asarray(miss), prims=jnp.asarray(prims),
        refit=meta,
    )


def refit_bvh(bvh: BVH, verts) -> BVH:
    """Recompute node boxes from (possibly traced) vertex positions with
    fixed topology — jit-compatible accel refresh for deforming
    geometry (the reference rebuilds in parameters_changed,
    scene.cpp:481; see also traverse.refit_packet_bvh)."""
    if bvh.refit is None:
        return bvh
    leaf_nodes, levels, vids, valid = bvh.refit.v
    nl, mc, _ = vids.shape
    v = verts[vids.reshape(-1)].reshape(nl, mc * 3, 3)
    m = jnp.asarray(np.repeat(valid, 3, axis=1))[..., None]
    big = jnp.float32(3e37)
    leaf_lo = jnp.min(jnp.where(m, v, big), axis=1)
    leaf_hi = jnp.max(jnp.where(m, v, -big), axis=1)
    M = bvh.bbox_lo.shape[0]
    box_lo = jnp.full((M, 3), big).at[leaf_nodes].set(leaf_lo)
    box_hi = jnp.full((M, 3), -big).at[leaf_nodes].set(leaf_hi)
    for nodes, lefts, rights in levels:
        box_lo = box_lo.at[nodes].set(
            jnp.minimum(box_lo[lefts], box_lo[rights]))
        box_hi = box_hi.at[nodes].set(
            jnp.maximum(box_hi[lefts], box_hi[rights]))
    return bvh.replace(bbox_lo=box_lo, bbox_hi=box_hi)


def build_bvh(vertices: np.ndarray, faces: np.ndarray,
              leaf_size: int = LEAF_SIZE, method: str = "auto") -> BVH:
    """Host-side BVH build.

    method='auto' prefers the native C++ binned-SAH builder
    (mitsuba_tpu/native/bvh_builder.cpp — the Embree/kdtree.h:1827
    equivalent) and falls back to the numpy median-split below;
    'median' forces the numpy path.
    """
    if method in ("auto", "sah"):
        from ..native import build_bvh_native

        out = build_bvh_native(vertices, faces, leaf_size)
        if out is not None:
            lo, hi, first, count, miss, prims = out
            return _with_refit_meta(lo, hi, first, count, miss, prims,
                                    faces)
        if method == "sah":
            raise RuntimeError("native SAH builder unavailable")
    return _build_bvh_median(vertices, faces, leaf_size)


def _build_bvh_median(vertices: np.ndarray, faces: np.ndarray,
                      leaf_size: int = LEAF_SIZE) -> BVH:
    """Numpy median-split fallback builder over triangle centroids."""
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    f = faces.shape[0]
    tri = vertices[faces]                      # (F, 3, 3)
    lo_t = tri.min(axis=1)                     # (F, 3)
    hi_t = tri.max(axis=1)
    centroid = tri.mean(axis=1)

    nodes_lo, nodes_hi, nodes_first, nodes_count, nodes_miss = [], [], [], [], []
    prim_order: list[int] = []

    def emit(ids) -> int:
        """Recursively emit node for prim id set; returns node index."""
        idx = len(nodes_lo)
        nodes_lo.append(lo_t[ids].min(axis=0))
        nodes_hi.append(hi_t[ids].max(axis=0))
        nodes_first.append(0)
        nodes_count.append(0)
        nodes_miss.append(-1)
        if len(ids) <= leaf_size:
            nodes_first[idx] = len(prim_order)
            nodes_count[idx] = len(ids)
            prim_order.extend(ids.tolist())
            return idx
        c = centroid[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(ids) // 2
        left_ids = ids[order[:half]]
        right_ids = ids[order[half:]]
        left = emit(left_ids)
        right = emit(right_ids)
        # miss link of the left subtree's nodes that exit -> right subtree
        _thread_miss(left, right)
        return idx

    def _thread_miss(subtree_root: int, target: int):
        """Set miss links of all exits of `subtree_root`'s subtree to target."""
        # In DFS order, nodes in the left subtree with miss == -1 (pointing
        # to 'exit') should point at `target` instead.
        end = target  # left subtree occupies [subtree_root, target)
        for i in range(subtree_root, end):
            if nodes_miss[i] == -1:
                nodes_miss[i] = target

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * f))
    try:
        emit(np.arange(f))
    finally:
        sys.setrecursionlimit(old_limit)

    prims = np.asarray(prim_order + [-1] * leaf_size, np.int32)
    return _with_refit_meta(
        np.stack(nodes_lo), np.stack(nodes_hi),
        np.asarray(nodes_first, np.int32),
        np.asarray(nodes_count, np.int32),
        np.asarray(nodes_miss, np.int32), prims, faces)


def _slab_test(o, inv_d, lo, hi, tmax):
    """Ray-AABB test. All (N, 3) / (N,). Returns bool (N,)."""
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    tnear = jnp.maximum(jnp.max(tn, axis=-1), 0.0)
    tfar = jnp.minimum(jnp.min(tf, axis=-1), tmax)
    return tnear <= tfar


def intersect_bvh(
    bvh: BVH,
    vertices,
    faces,
    ray: Ray,
    active=None,
    any_hit: bool = False,
):
    """Closest-hit (or any-hit) stackless traversal over a ray wavefront.

    All rays advance their node cursor in lockstep; finished lanes park at
    node = -1.  Returns PreliminaryIntersection (shape_index left as 0/-1
    validity flag; caller maps prim -> shape).
    """
    n = ray.o.shape[0]
    inv_d = safe_rcp(ray.d)
    if active is None:
        active = jnp.ones((n,), bool)

    leaf_size = LEAF_SIZE

    def cond(state):
        node = state[0]
        return jnp.any(node >= 0)

    def body(state):
        node, best_t, best_prim, best_u, best_v = state
        nid = jnp.maximum(node, 0)
        lo = bvh.bbox_lo[nid]
        hi = bvh.bbox_hi[nid]
        live = node >= 0
        tmax = jnp.minimum(best_t, ray.maxt)
        hit_box = _slab_test(ray.o, inv_d, lo, hi, tmax) & live
        cnt = bvh.count[nid]
        first = bvh.first[nid]
        is_leaf = cnt > 0
        do_leaf = hit_box & is_leaf

        for j in range(leaf_size):
            pidx = bvh.prims[first + j]
            valid = do_leaf & (j < cnt) & (pidx >= 0)
            pid = jnp.maximum(pidx, 0)
            fv = faces[pid]
            t, u, v, h = ray_triangle(
                ray.o, ray.d, vertices[fv[:, 0]], vertices[fv[:, 1]],
                vertices[fv[:, 2]],
            )
            closer = valid & h & (t < best_t) & (t <= ray.maxt)
            best_t = jnp.where(closer, t, best_t)
            best_prim = jnp.where(closer, pid.astype(jnp.int32), best_prim)
            best_u = jnp.where(closer, u, best_u)
            best_v = jnp.where(closer, v, best_v)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, nid + 1, bvh.miss[nid])
        node = jnp.where(live, nxt, node)
        if any_hit:
            node = jnp.where(jnp.isfinite(best_t), -1, node)
        return node, best_t, best_prim, best_u, best_v

    node0 = jnp.where(active, 0, -1)
    init = (
        node0,
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    _, t, prim, u, v = jax.lax.while_loop(cond, body, init)
    return PreliminaryIntersection(
        t=t,
        prim_index=jnp.maximum(prim, 0),
        prim_uv=jnp.stack([u, v], axis=-1),
        shape_index=jnp.where(jnp.isfinite(t), 0, -1),
    )

"""Accel refit under in-jit geometry deformation.

The reference rebuilds its BVH whenever geometry changes
(parameters_changed -> accel rebuild, scene.cpp:481-509).  Under jit
the topology is fixed at trace time, so the TPU build instead REFITS
node boxes from the traced vertex positions every trace
(ops/bvh.refit_bvh, ops/pallas/traverse.refit_packet_bvh) — without
this, differentiable-geometry optimization (lens-design remesh,
largesteps) on >1024-triangle scenes silently traces against stale
bounds and misses moved geometry.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.ops import bvh as bvh_mod
from mitsuba_tpu.ops.pallas.traverse import (
    build_packet_bvh,
    pack_leaf_rows,
    pack_mxu_rows,
    packet_closest_hit,
    refit_packet_bvh,
    tri_columns,
)


def _soup(F, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.random((F, 3), np.float32) * 2 - 1
    jit_ = lambda: 0.15 * (rng.random((F, 3), np.float32) - 0.5)
    verts = np.concatenate([c + jit_(), c + jit_(), c + jit_()])
    faces = np.stack([np.arange(F), np.arange(F) + F,
                      np.arange(F) + 2 * F], 1).astype(np.int32)
    return verts.astype(np.float32), faces


def _rays(N, seed=1):
    rng = np.random.default_rng(seed)
    o = rng.random((N, 3), np.float32) * 6 - 3
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


OFFSET = jnp.asarray([1.5, -0.75, 0.5], jnp.float32)


def test_refit_bvh_tracks_moved_geometry():
    verts, faces = _soup(900, seed=3)
    accel = bvh_mod.build_bvh(verts, faces)
    o, d = _rays(800)
    vj = jnp.asarray(verts)
    fj = jnp.asarray(faces)

    @jax.jit
    def hit_t(offset):
        v2 = vj + offset
        acc2 = bvh_mod.refit_bvh(accel, v2)
        ray = type("R", (), {})
        from mitsuba_tpu.core.records import Ray

        r = Ray.make(o, d)
        pi = bvh_mod.intersect_bvh(acc2, v2, fj, r,
                                   jnp.ones((o.shape[0],), bool))
        return pi.t, pi.prim_index

    t_moved, prim_moved = hit_t(OFFSET)

    # ground truth: rebuild from scratch on the moved vertices
    accel_fresh = bvh_mod.build_bvh(np.asarray(verts + np.asarray(OFFSET)),
                                    faces)
    from mitsuba_tpu.core.records import Ray

    r = Ray.make(o, d)
    pi_ref = bvh_mod.intersect_bvh(accel_fresh, vj + OFFSET, fj, r,
                                   jnp.ones((o.shape[0],), bool))
    hit_a = np.isfinite(np.asarray(t_moved))
    hit_b = np.isfinite(np.asarray(pi_ref.t))
    assert (hit_a == hit_b).all()
    m = hit_a
    assert np.allclose(np.asarray(t_moved)[m], np.asarray(pi_ref.t)[m],
                       atol=1e-5)

    # sanity: WITHOUT refit the stale accel misses the moved soup
    pi_stale = bvh_mod.intersect_bvh(accel, vj + OFFSET, fj, r,
                                     jnp.ones((o.shape[0],), bool))
    assert np.isfinite(np.asarray(pi_stale.t)).sum() < 0.5 * m.sum()


def test_refit_packet_bvh_matches_rebuild():
    verts, faces = _soup(1400, seed=5)
    acc = build_packet_bvh(verts, faces, rpl=16, mxu=True)
    o, d = _rays(1200, seed=2)
    vj = jnp.asarray(verts)

    @jax.jit
    def query(offset):
        v2 = vj + offset
        cols = tri_columns(v2, jnp.asarray(faces))
        rows = pack_leaf_rows(cols, acc)
        mxu_rows = pack_mxu_rows(cols, acc)
        nb = refit_packet_bvh(acc, v2)
        return packet_closest_hit(
            nb, acc.node_meta, rows, o, d, jnp.inf,
            jnp.ones((o.shape[0],), bool), n_nodes=acc.n_nodes,
            interpret=True, rpl=acc.rpl, mxu_rows=mxu_rows)

    t_moved, fid_moved = query(OFFSET)

    verts2 = verts + np.asarray(OFFSET)
    acc2 = build_packet_bvh(verts2, faces, rpl=16, mxu=True)
    cols2 = tri_columns(jnp.asarray(verts2), jnp.asarray(faces))
    t_ref, fid_ref = packet_closest_hit(
        acc2.node_box, acc2.node_meta, pack_leaf_rows(cols2, acc2),
        o, d, jnp.inf, jnp.ones((o.shape[0],), bool),
        n_nodes=acc2.n_nodes, interpret=True, rpl=acc2.rpl,
        mxu_rows=pack_mxu_rows(cols2, acc2))

    hit_a = np.isfinite(np.asarray(t_moved))
    hit_b = np.isfinite(np.asarray(t_ref))
    assert (hit_a == hit_b).all()
    m = hit_a
    # identical topology + conservative boxes -> identical winners
    assert (np.asarray(fid_moved)[m] == np.asarray(fid_ref)[m]).all()
    assert np.allclose(np.asarray(t_moved)[m], np.asarray(t_ref)[m],
                       rtol=1e-3, atol=1e-4)


def test_scene_trace_ctx_refits_under_jit():
    """End-to-end: a >1024-tri scene whose mesh is translated inside
    jit still intersects correctly through Scene.ray_intersect."""
    from mitsuba_tpu.core.records import Ray
    from mitsuba_tpu.models.scene import make_scene
    from mitsuba_tpu.models.shapes import Mesh, sphere_mesh
    from mitsuba_tpu.models.bsdfs import SmoothDiffuse
    from mitsuba_tpu.models.textures import ConstantTexture

    v, f, n, uv = sphere_mesh(4)      # ~5k tris
    mesh = Mesh.make(v, f, normals=n, uvs=uv, bsdf_index=0)
    bsdf = SmoothDiffuse(
        reflectance=ConstantTexture(jnp.asarray([0.5] * 3)))
    scene = make_scene([mesh], [bsdf], [], None, use_bvh=True)
    n_rays = 512
    rng = np.random.default_rng(0)
    d = rng.standard_normal((n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    o = jnp.broadcast_to(jnp.asarray([4.0, 0.0, 0.0]), (n_rays, 3)) \
        - 6.0 * jnp.asarray(d) * 0  # rays from a point
    o = jnp.asarray(np.full((n_rays, 3), [4.0, 0.0, 0.0], np.float32))
    d = jnp.asarray(-np.asarray(o) + rng.standard_normal(
        (n_rays, 3)).astype(np.float32) * 0.3)
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)

    @jax.jit
    def first_hit(offset):
        m2 = scene.meshes[0].replace(
            vertices=scene.meshes[0].vertices + offset)
        sc = scene.replace(meshes=(m2,))
        si = sc.ray_intersect(Ray.make(o, d))
        return si.t

    t0 = np.asarray(first_hit(jnp.zeros(3)))
    t1 = np.asarray(first_hit(jnp.asarray([0.5, 0.0, 0.0])))
    # sphere moved 0.5 toward the camera along -x ray direction:
    # hits get closer by ~0.5 for head-on rays
    m = np.isfinite(t0) & np.isfinite(t1)
    assert m.sum() > 100
    assert (t1[m] < t0[m]).mean() > 0.9

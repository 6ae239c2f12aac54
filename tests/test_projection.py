"""Silhouette projection ops (walk/jump) tests.

Reference parity: ProjectOperation (projective.py:586-830) and
Mesh::primitive_silhouette_projection (mesh.cpp:1036).  On a unit
icosphere the true silhouette from a viewpoint V is the circle
p . V = 1 (tangency condition), which gives an analytic target the
walk/jump results must approach.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.models.bsdfs import SmoothDiffuse
from mitsuba_tpu.models.emitters import AreaEmitter
from mitsuba_tpu.models.film import Film, ReconstructionFilter
from mitsuba_tpu.models.integrators.projection import (
    build_face_adjacency,
    mesh_jump,
    mesh_walk,
    project_seed_points,
)
from mitsuba_tpu.models.integrators.projective import (
    _face_normals,
    build_silhouette_edges,
    indirect_boundary_grads,
)
from mitsuba_tpu.models.scene import make_scene
from mitsuba_tpu.models.sensors import PerspectiveCamera
from mitsuba_tpu.models.shapes import Mesh, rectangle, sphere_mesh
from mitsuba_tpu.models.textures import ConstantTexture


def _sphere_scene(subdiv=3, smooth=True):
    v, f, n, uv = sphere_mesh(subdiv=subdiv)
    sph = Mesh.make(v, f, n if smooth else None, uv, bsdf_index=0,
                    id="sphere")
    light = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 3.0]), tf.rotate([1, 0, 0], 180),
                   tf.scale(0.3)), np.float32)),
        bsdf_index=0, emitter_index=0, id="light")
    em = AreaEmitter(radiance=ConstantTexture(jnp.full((3,), 10.0)))
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.full((3,), 0.7)))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])),
        fov=45.0,
        film=Film(width=16, height=16,
                  rfilter=ReconstructionFilter.box()),
    )
    return make_scene([sph, light], [white], [em], cam, use_bvh=False)


def test_face_adjacency_topology():
    """Neighbors share exactly the edge's two vertices; the watertight
    icosphere has no boundary edges; edge ids resolve to shared rows."""
    scene = _sphere_scene(subdiv=2)
    edges = build_silhouette_edges(scene)
    adj = build_face_adjacency(scene, edges)
    f = np.asarray(jax.lax.stop_gradient(scene.geometry()[1]))
    nb = np.asarray(adj.neighbors)
    eid = np.asarray(adj.edge_id)
    ev0 = np.asarray(edges.v0)
    ev1 = np.asarray(edges.v1)
    # sphere faces only: the light quad has open boundary edges (-1)
    F = 20 * 4 ** 2
    assert (nb[:F] >= 0).all()  # icosphere is watertight
    assert (nb[F:] == -1).any()  # light-quad rim is open
    for fi in np.random.default_rng(0).integers(0, F, 50):
        for k in range(3):
            a, b = f[fi, k], f[fi, (k + 1) % 3]
            g = nb[fi, k]
            assert g != fi
            shared = set(f[fi]) & set(f[g])
            assert shared == {a, b}
            e = eid[fi, k]
            assert {ev0[e], ev1[e]} == {a, b}


def test_mesh_walk_reaches_sphere_silhouette():
    """From random start triangles the heuristic walk must land on
    edges satisfying the tessellated-sphere silhouette condition, close
    to the analytic contour circle p . V = 1."""
    scene = _sphere_scene(subdiv=3)
    edges = build_silhouette_edges(scene)
    adj = build_face_adjacency(scene, edges)
    verts, faces, *_ = scene.geometry()
    verts = jax.lax.stop_gradient(verts)
    fn = _face_normals(verts, faces)

    n_sphere_faces = 20 * 4 ** 3
    N = 512
    rs = np.random.default_rng(1)
    prim0 = jnp.asarray(rs.integers(0, n_sphere_faces, N), jnp.int32)
    vp = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (N, 3))
    lane = jnp.arange(N, dtype=jnp.int32)
    ss = mesh_walk(verts, faces, fn, adj, vp, prim0, jnp.uint32(11),
                   lane, jnp.ones((N,), bool), max_walk=24)
    valid = np.asarray(ss.valid)
    # the heuristic walk alone drifts only weakly on a smooth sphere
    # (adjacent-face acos weights are nearly equal, so it is close to a
    # random walk) — the reference relies on the jump fallback for the
    # stranded lanes (hybrid_mesh_projection); ~20% of uniform random
    # start faces reach the contour in 24 steps
    assert valid.mean() > 0.12, valid.mean()

    p = np.asarray(ss.p)[valid]
    e = np.asarray(ss.edge)[valid]
    d = p - np.asarray(vp)[valid]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    fnp = np.asarray(fn)
    f0 = np.asarray(edges.f0)[e]
    f1 = np.asarray(edges.f1)[e]
    c0 = np.sum(fnp[f0] * d, -1)
    c1 = np.sum(fnp[np.maximum(f1, 0)] * d, -1)
    sil = (c0 * c1 <= 1e-6) | (f1 < 0)
    assert sil.mean() > 0.999, sil.mean()

    # analytic contour: p . V == 1 for the unit sphere (viewpoint V);
    # subdiv-3 facet size bounds the deviation
    dots = p @ np.asarray([0.0, 0.0, 4.0])
    assert np.abs(dots - 1.0).max() < 0.25, np.abs(dots - 1.0).max()
    assert np.abs(dots - 1.0).mean() < 0.08


def test_hybrid_projection_high_validity():
    """Walk + one-jump hybrid (projective.py:695-729) must project the
    vast majority of random smooth-sphere seeds onto true silhouette
    edges — the jump rescues the walk's stranded lanes."""
    scene = _sphere_scene(subdiv=3, smooth=True)
    edges = build_silhouette_edges(scene)
    adj = build_face_adjacency(scene, edges)
    ctx = jax.lax.stop_gradient(scene).trace_ctx()
    verts, faces, *_ = scene.geometry()
    verts = jax.lax.stop_gradient(verts)
    fn = _face_normals(verts, faces)

    n_sphere_faces = 20 * 4 ** 3
    N = 512
    rs = np.random.default_rng(3)
    prim0 = np.asarray(rs.integers(0, n_sphere_faces, N), np.int32)
    fnp = np.asarray(jax.lax.stop_gradient(faces))
    vnp = np.asarray(verts)
    p0 = vnp[fnp[prim0]].mean(axis=1)
    vp = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (N, 3))
    lane = jnp.arange(N, dtype=jnp.int32)

    from mitsuba_tpu.models.integrators.projection import hybrid_projection

    class SI:
        prim_index = jnp.asarray(prim0)
        p = jnp.asarray(p0)
        shape_index = jnp.zeros((N,), jnp.int32)

    ss = hybrid_projection(scene, ctx, edges, adj, vp, SI(),
                           jnp.uint32(5), lane, jnp.ones((N,), bool),
                           max_walk=24)
    valid = np.asarray(ss.valid)
    assert valid.mean() > 0.85, valid.mean()

    # every valid sample sits on a true tessellated silhouette edge
    p = np.asarray(ss.p)[valid]
    e = np.asarray(ss.edge)[valid]
    d = p - np.asarray(vp)[valid]
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    fnn = np.asarray(fn)
    f0 = np.asarray(edges.f0)[e]
    f1 = np.asarray(edges.f1)[e]
    c0 = np.sum(fnn[f0] * d, -1)
    c1 = np.sum(fnn[np.maximum(f1, 0)] * d, -1)
    sil = (c0 * c1 <= 1e-6) | (f1 < 0)
    assert sil.mean() > 0.99, sil.mean()
    dots = p @ np.asarray([0.0, 0.0, 4.0])
    assert np.abs(dots - 1.0).mean() < 0.08


def test_mesh_jump_converges_to_contour():
    """The Newton jump on the smooth-normal icosphere drives
    dot(H, n_s) toward zero (projective.py:637-693 mesh_jump)."""
    scene = _sphere_scene(subdiv=3, smooth=True)
    ctx = jax.lax.stop_gradient(scene).trace_ctx()
    verts, faces, *_ = scene.geometry()
    verts = jax.lax.stop_gradient(verts)

    n_sphere_faces = 20 * 4 ** 3
    N = 256
    rs = np.random.default_rng(2)
    prim0 = np.asarray(rs.integers(0, n_sphere_faces, N), np.int32)
    # start at face centroids
    fnp = np.asarray(jax.lax.stop_gradient(faces))
    vnp = np.asarray(verts)
    p0 = vnp[fnp[prim0]].mean(axis=1)
    vp = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 4.0]), (N, 3))

    class SI:
        prim_index = jnp.asarray(prim0)
        p = jnp.asarray(p0)
        shape_index = jnp.zeros((N,), jnp.int32)

    prim, p, landed = mesh_jump(scene, ctx, vp, SI(), jnp.ones((N,), bool),
                                max_jump=3)
    ok = np.asarray(landed)
    assert ok.mean() > 0.8, ok.mean()
    pj = np.asarray(p)[ok]
    # smooth normal of the unit sphere == position
    n_s = pj / np.linalg.norm(pj, axis=-1, keepdims=True)
    H = np.asarray(vp)[ok] - pj
    H /= np.linalg.norm(H, axis=-1, keepdims=True)
    dots_end = np.abs(np.sum(H * n_s, -1))

    n0 = p0[ok] / np.linalg.norm(p0[ok], axis=-1, keepdims=True)
    H0 = np.asarray(vp)[ok] - p0[ok]
    H0 /= np.linalg.norm(H0, axis=-1, keepdims=True)
    dots_start = np.abs(np.sum(H0 * n0, -1))
    assert np.median(dots_end) < 0.05, np.median(dots_end)
    assert np.median(dots_end) < 0.3 * max(np.median(dots_start), 1e-6)


def test_projection_seed_points_cube():
    """Light-side projection seeds land in the unit cube and map back to
    real silhouette edges of the cube parameterization."""
    scene = _sphere_scene(subdiv=2)
    edges = build_silhouette_edges(scene)
    adj = build_face_adjacency(scene, edges)
    pts, ok = project_seed_points(scene, edges, adj, 7, 1024)
    okn = np.asarray(ok)
    # validity is hit-rate bound: cosine rays from the z=3 light see the
    # unit sphere with probability sin^2(asin(1/3)) ~ 0.11; the hybrid
    # projection succeeds on nearly every hit
    assert okn.mean() > 0.06, okn.mean()
    pn = np.asarray(pts)[okn]
    assert (pn >= 0.0).all() and (pn <= 1.0).all()
    # seeds concentrate on sphere edges (the only silhouettes seen from
    # the light): u_edge must be spread, not a point mass
    assert pn[:, 0].std() > 0.01


@pytest.mark.slow
def test_projection_guided_shadow_gradient():
    """Projection-seeded octree guiding agrees with finite differences
    on the blocker-translation shadow gradient (the same check as the
    octree mode, seeded by walked silhouettes instead of uniform
    warm-up)."""
    from test_projective import _loss_weights, _shadow_scene

    W = _loss_weights()
    scene = _shadow_scene()
    edges = build_silhouette_edges(scene)

    from mitsuba_tpu.models.integrators.common import render
    from mitsuba_tpu.models.integrators.path import PathIntegrator
    from mitsuba_tpu.models.integrators.projective import _float_partition

    h = 0.03
    f = lambda bx: float(jnp.sum(
        render(_shadow_scene(bx), PathIntegrator(max_depth=2), seed=0,
               spp=32) * W))
    fd = (f(h) - f(-h)) / (2 * h)

    floats, rebuild, cot = _float_partition(scene)
    vals = []
    for sd in (1, 2, 3):
        g = indirect_boundary_grads(scene, edges, W, jnp.uint32(sd),
                                    n_samples=8192, guiding="projective")
        gs = cot(g)
        vals.append(float(jnp.sum(gs.meshes[1].vertices[:, 0])))
    ad = float(np.mean(vals))
    assert np.isfinite(ad)
    assert abs(ad - fd) < 0.35 * abs(fd) + 0.05, (ad, fd, vals)

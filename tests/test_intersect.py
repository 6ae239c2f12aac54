"""Ray-triangle, brute-force vs BVH traversal equivalence, differentiable SI."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core.records import Ray
from mitsuba_tpu.ops import intersect as xs
from mitsuba_tpu.ops.bvh import build_bvh, intersect_bvh
from mitsuba_tpu.models import shapes


def _random_soup(np_rng, n_tri=200, spread=3.0):
    v = np_rng.uniform(-spread, spread, (n_tri, 3, 3)).astype(np.float32)
    # shrink triangles so they don't all overlap
    c = v.mean(axis=1, keepdims=True)
    v = c + (v - c) * 0.4
    verts = v.reshape(-1, 3)
    faces = np.arange(3 * n_tri, dtype=np.int32).reshape(-1, 3)
    return jnp.asarray(verts), jnp.asarray(faces)


def _random_rays(np_rng, n=500, spread=4.0):
    o = np_rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = np_rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray.make(jnp.asarray(o), jnp.asarray(d))


def test_ray_triangle_basic():
    o = jnp.array([[0.0, 0.0, -1.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    p0 = jnp.array([[-1.0, -1.0, 0.0]])
    p1 = jnp.array([[1.0, -1.0, 0.0]])
    p2 = jnp.array([[0.0, 1.0, 0.0]])
    t, u, v, hit = xs.ray_triangle(o, d, p0, p1, p2)
    assert bool(hit[0]) and np.isclose(float(t[0]), 1.0)
    # miss: parallel ray
    d2 = jnp.array([[1.0, 0.0, 0.0]])
    t2, *_, hit2 = xs.ray_triangle(o, d2, p0, p1, p2)
    assert not bool(hit2[0]) and np.isinf(float(t2[0]))


def test_bvh_matches_brute(np_rng):
    verts, faces = _random_soup(np_rng, 300)
    rays = _random_rays(np_rng, 800)
    pi_b = xs.intersect_brute(verts, faces, rays)
    bvh = build_bvh(np.asarray(verts), np.asarray(faces))
    pi_t = intersect_bvh(bvh, verts, faces, rays)
    tb, tt = np.asarray(pi_b.t), np.asarray(pi_t.t)
    hit_b, hit_t = np.isfinite(tb), np.isfinite(tt)
    assert (hit_b == hit_t).all()
    assert np.allclose(tb[hit_b], tt[hit_b], rtol=1e-5, atol=1e-6)
    assert (
        np.asarray(pi_b.prim_index)[hit_b] == np.asarray(pi_t.prim_index)[hit_b]
    ).all()


def test_bvh_any_hit(np_rng):
    verts, faces = _random_soup(np_rng, 100)
    rays = _random_rays(np_rng, 500)
    bvh = build_bvh(np.asarray(verts), np.asarray(faces))
    pi = intersect_bvh(bvh, verts, faces, rays)
    occluded = intersect_bvh(bvh, verts, faces, rays, any_hit=True)
    assert (np.isfinite(np.asarray(occluded.t)) == np.isfinite(np.asarray(pi.t))).all()


def test_maxt_respected(np_rng):
    verts, faces, normals, uvs = shapes.rectangle()
    rays = Ray.make(
        jnp.array([[0.0, 0.0, -2.0]]), jnp.array([[0.0, 0.0, 1.0]]),
        maxt=jnp.array([1.0]),
    )
    pi = xs.intersect_brute(jnp.asarray(verts), jnp.asarray(faces), rays)
    assert np.isinf(float(pi.t[0]))  # hit at t=2 > maxt=1
    rays2 = rays.replace(maxt=jnp.array([3.0]))
    pi2 = xs.intersect_brute(jnp.asarray(verts), jnp.asarray(faces), rays2)
    assert np.isclose(float(pi2.t[0]), 2.0)


def test_surface_interaction_values():
    verts, faces, normals, uvs = shapes.rectangle()
    verts, faces = jnp.asarray(verts), jnp.asarray(faces)
    ray = Ray.make(
        jnp.array([[0.25, -0.5, 3.0]]), jnp.array([[0.0, 0.0, -1.0]])
    )
    pi = xs.intersect_brute(verts, faces, ray)
    si = xs.compute_surface_interaction(
        verts, faces, jnp.zeros(faces.shape[0], jnp.int32), ray, pi,
        vertex_normals=jnp.asarray(normals), vertex_uvs=jnp.asarray(uvs),
    )
    assert np.allclose(np.asarray(si.p), [[0.25, -0.5, 0.0]], atol=1e-5)
    assert np.allclose(np.asarray(si.n), [[0, 0, 1]], atol=1e-6)
    # wi in local frame: ray comes from -z, so wi ~ +z in the shading frame
    assert np.asarray(si.wi)[0, 2] > 0.99
    # uv interpolated: rectangle maps [-1,1]^2 -> [0,1]^2
    assert np.allclose(np.asarray(si.uv), [[0.625, 0.25]], atol=1e-4)


def test_surface_interaction_geometry_grad():
    """d(hit point)/d(vertex z) must flow through the detached PI."""
    verts_np, faces, normals, uvs = shapes.rectangle()
    faces = jnp.asarray(faces)
    ray = Ray.make(jnp.array([[0.0, 0.0, -3.0]]), jnp.array([[0.0, 0.0, 1.0]]))

    def hit_z(dz):
        v = jnp.asarray(verts_np).at[:, 2].add(dz)
        pi = xs.intersect_brute(v, faces, ray)
        pi = jax.lax.stop_gradient(pi)  # traversal is detached by design
        si = xs.compute_surface_interaction(
            v, faces, jnp.zeros(faces.shape[0], jnp.int32), ray, pi
        )
        return si.p[0, 2]

    g = jax.grad(hit_z)(0.0)
    # moving the whole plane by dz moves the hit point by dz
    assert np.isclose(float(g), 1.0, atol=1e-4)


def test_mesh_generators_consistent():
    for gen in [shapes.rectangle, shapes.cube,
                lambda: shapes.sphere_mesh(2), lambda: shapes.disk_mesh(32)]:
        v, f, n, uv = gen()
        assert f.min() >= 0 and f.max() < len(v)
        assert np.isfinite(v).all()
        # normals unit length
        assert np.allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)


def test_sphere_mesh_area():
    v, f, n, uv = shapes.sphere_mesh(4)
    m = shapes.Mesh.make(v, f, n, uv)
    area = float(m.surface_area())
    assert abs(area - 4 * np.pi) / (4 * np.pi) < 0.01


def test_cube_winding_outward():
    v, f, n, uv = shapes.cube()
    m = shapes.Mesh.make(v, f)
    tri = np.asarray(v)[np.asarray(f)]
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    ng = np.cross(e1, e2)
    centers = tri.mean(axis=1)
    # geometric normal must point away from the origin (outward)
    assert ((ng * centers).sum(-1) > 0).all()


def test_rayflags_modes_translating_plane():
    """RayFlags differentiability modes (interaction.h:19-68): translate a
    plane along z under a tilted ray and compare d si/d translation."""
    verts_np, faces, _, _ = shapes.rectangle()
    faces = jnp.asarray(faces)
    # tilted ray: d = (0.6, 0, 0.8)
    ray = Ray.make(jnp.array([[-0.3, 0.1, -1.0]]),
                   jnp.array([[0.6, 0.0, 0.8]]))

    def si_parts(dz, mode):
        v = jnp.asarray(verts_np).at[:, 2].add(dz)
        pi = jax.lax.stop_gradient(xs.intersect_brute(v, faces, ray))
        si = xs.compute_surface_interaction(
            v, faces, jnp.zeros(faces.shape[0], jnp.int32), ray, pi,
            mode=mode)
        return jnp.concatenate([si.p[0], si.uv[0]])

    # primal agrees across modes
    vals = {m: np.asarray(si_parts(0.0, m))
            for m in ("attach", "follow_shape", "detach_shape")}
    assert np.allclose(vals["attach"], vals["follow_shape"], atol=1e-5)
    assert np.allclose(vals["attach"], vals["detach_shape"], atol=1e-5)

    g = {m: np.asarray(jax.jacfwd(si_parts)(0.0, m))
         for m in ("attach", "follow_shape", "detach_shape")}
    # attach: hit point slides along the fixed ray: dp/dz = d/d_z
    assert np.allclose(g["attach"][:3], [0.6 / 0.8, 0.0, 1.0], atol=1e-4)
    # follow_shape: point rides rigidly with the shape: dp/dz = (0,0,1),
    # and the surface uv is frozen
    assert np.allclose(g["follow_shape"][:3], [0.0, 0.0, 1.0], atol=1e-4)
    assert np.allclose(g["follow_shape"][3:], 0.0, atol=1e-6)
    # detach_shape: no shape gradient at all
    assert np.allclose(g["detach_shape"], 0.0, atol=1e-6)
    # attach mode's uv gradient is nonzero (surface slides under the ray)
    assert np.abs(g["attach"][3:]).max() > 1e-4


def test_rayflags_mode_scene_threading():
    """scene.ray_intersect(mode=...) threads the flag; primal invariant."""
    from mitsuba_tpu.utils.scenes import cornell_box

    scene = cornell_box(width=8, height=8)
    ray = Ray.make(jnp.array([[0.0, 0.0, 3.0]]), jnp.array([[0.0, 0.0, -1.0]]))
    sis = [scene.ray_intersect(ray, mode=m)
           for m in ("attach", "follow_shape", "detach_shape")]
    for si in sis[1:]:
        assert np.allclose(np.asarray(si.p), np.asarray(sis[0].p), atol=1e-5)
        assert np.allclose(np.asarray(si.t), np.asarray(sis[0].t), atol=1e-5)

"""Ray-triangle intersection and differentiable surface-interaction recovery.

The hot path of the renderer.  Design (vs reference):
- Reference: Embree/OptiX BVH traversal returns (t, prim_index, barycentrics)
  non-differentiably; the surface interaction is then *recomputed
  differentiably* from mesh vertices (src/render/shape.h:526,571 and
  mesh.cpp:1376 compute_surface_interaction).
- Here: the traversal (ops/bvh.py + brute force below) is likewise fully
  detached (int indices + detached floats); `compute_surface_interaction`
  re-runs Moller-Trumbore on the gathered triangle with differentiable
  vertex positions, so dp/dgeometry flows without differentiating traversal.

All functions are batched over the wavefront dimension N and compile to
fused VPU code; the brute-force path tiles triangles through a `lax.scan`
so the (N, T) intersection slab stays bounded in HBM.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.math import cross, dot, normalize, safe_div
from ..core.records import PreliminaryIntersection, Ray, SurfaceInteraction

INF = jnp.float32(jnp.inf)
DET_EPS = 1e-9


def ray_triangle(o, d, p0, p1, p2):
    """Moller-Trumbore. All args broadcastable to (..., 3).

    Returns (t, u, v, hit) with t = inf where no hit.
    """
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = cross(d, e2)
    det = dot(e1, pvec)
    inv_det = safe_div(1.0, det, DET_EPS)
    tvec = o - p0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1)
    v = dot(d, qvec) * inv_det
    t = dot(e2, qvec) * inv_det
    hit = (
        (jnp.abs(det) > DET_EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return jnp.where(hit, t, INF), u, v, hit


def intersect_brute(vertices, faces, ray: Ray, active=None, tile: int = 64):
    """Closest-hit over all triangles by tiled exhaustive search.

    For small scenes (Cornell-box scale) this is *faster* than any
    traversal on TPU: perfectly regular, fully vectorized, no divergence.
    vertices: (V, 3), faces: (F, 3) int32.  Returns PreliminaryIntersection
    with prim_index = global face id.
    """
    n = ray.o.shape[0]
    f = faces.shape[0]
    num_tiles = -(-f // tile)
    pad = num_tiles * tile - f
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))  # pad with face 0
    # (num_tiles, tile, 3, 3) triangle vertices
    tri = vertices[faces_p].reshape(num_tiles, tile, 3, 3)
    pad_mask = (
        jnp.arange(num_tiles * tile).reshape(num_tiles, tile) < f
    )

    o = ray.o[:, None, :]
    d = ray.d[:, None, :]

    def step(carry, inputs):
        best_t, best_prim, best_u, best_v = carry
        tri_tile, valid, base = inputs
        t, u, v, hit = ray_triangle(
            o, d, tri_tile[None, :, 0, :], tri_tile[None, :, 1, :],
            tri_tile[None, :, 2, :],
        )  # (N, tile)
        t = jnp.where(valid[None, :], t, INF)
        t = jnp.where(t <= ray.maxt[:, None], t, INF)
        arg = jnp.argmin(t, axis=1)
        tmin = jnp.take_along_axis(t, arg[:, None], axis=1)[:, 0]
        closer = tmin < best_t
        best_prim = jnp.where(closer, base + arg.astype(jnp.int32), best_prim)
        best_u = jnp.where(
            closer, jnp.take_along_axis(u, arg[:, None], axis=1)[:, 0], best_u
        )
        best_v = jnp.where(
            closer, jnp.take_along_axis(v, arg[:, None], axis=1)[:, 0], best_v
        )
        best_t = jnp.where(closer, tmin, best_t)
        return (best_t, best_prim, best_u, best_v), None

    init = (
        jnp.full((n,), INF),
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,)),
        jnp.zeros((n,)),
    )
    bases = (jnp.arange(num_tiles) * tile).astype(jnp.int32)
    (t, prim, u, v), _ = jax.lax.scan(step, init, (tri, pad_mask, bases))
    if active is not None:
        t = jnp.where(active, t, INF)
        prim = jnp.where(active, prim, -1)
    return PreliminaryIntersection(
        t=t,
        prim_index=jnp.maximum(prim, 0),
        prim_uv=jnp.stack([u, v], axis=-1),
        shape_index=jnp.where(jnp.isfinite(t), 0, -1),  # filled by caller
    )


def ray_test_brute(vertices, faces, ray: Ray, active=None, tile: int = 64):
    """Any-hit (shadow ray) test: True where some triangle is hit in (0, maxt)."""
    pi = intersect_brute(vertices, faces, ray, active, tile)
    return jnp.isfinite(pi.t)


def compute_surface_interaction(
    vertices,
    faces,
    face_shape,
    ray: Ray,
    pi: PreliminaryIntersection,
    vertex_normals=None,
    vertex_uvs=None,
    mode: str = "attach",
):
    """Differentiable SI from a detached preliminary intersection.

    Re-runs Moller-Trumbore with differentiable `vertices` on the single
    gathered triangle per lane (reference semantics: mesh.cpp:1376).
    ``mode`` selects the RayFlags differentiability semantics
    (interaction.h:19-68): "attach" (default — SI slides along the fixed
    ray to stay on the moving surface), "follow_shape" (SI rigidly
    follows shape motion; detached barycentrics), "detach_shape" (shape
    detached from the AD graph).
    """
    assert mode in ("attach", "follow_shape", "detach_shape")
    if mode == "detach_shape":
        vertices = jax.lax.stop_gradient(vertices)
        if vertex_normals is not None:
            vertex_normals = jax.lax.stop_gradient(vertex_normals)
        if vertex_uvs is not None:
            vertex_uvs = jax.lax.stop_gradient(vertex_uvs)
    valid = pi.is_valid()
    prim = jnp.where(valid, pi.prim_index, 0)
    fidx = faces[prim]  # (N, 3)
    p0 = vertices[fidx[:, 0]]
    p1 = vertices[fidx[:, 1]]
    p2 = vertices[fidx[:, 2]]

    # Differentiable (t, u, v) re-derivation on the known triangle.
    t, u, v, _hit = ray_triangle(ray.o, ray.d, p0, p1, p2)
    # Guard: where re-derivation degenerates (grazing), fall back to the
    # detached traversal result.
    ok = jnp.isfinite(t)
    t = jnp.where(ok, t, pi.t)
    u = jnp.clip(jnp.where(ok, u, pi.prim_uv[..., 0]), 0.0, 1.0)
    v = jnp.clip(jnp.where(ok, v, pi.prim_uv[..., 1]), 0.0, 1.0)
    if mode == "follow_shape":
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)

    b0 = 1.0 - u - v
    p = p0 * b0[:, None] + p1 * u[:, None] + p2 * v[:, None]
    if mode == "follow_shape":
        t = jnp.sqrt(
            jnp.maximum(dot(p - ray.o, p - ray.o), 1e-30)
            / jnp.maximum(dot(ray.d, ray.d), 1e-30))

    ng = normalize(cross(p1 - p0, p2 - p0))
    if vertex_normals is not None:
        ns = normalize(
            vertex_normals[fidx[:, 0]] * b0[:, None]
            + vertex_normals[fidx[:, 1]] * u[:, None]
            + vertex_normals[fidx[:, 2]] * v[:, None]
        )
    else:
        ns = ng
    if vertex_uvs is not None:
        uv = (
            vertex_uvs[fidx[:, 0]] * b0[:, None]
            + vertex_uvs[fidx[:, 1]] * u[:, None]
            + vertex_uvs[fidx[:, 2]] * v[:, None]
        )
    else:
        uv = jnp.stack([u, v], axis=-1)

    from ..core.math import Frame

    frame = Frame.from_normal(ns)
    wi = Frame.to_local(frame, -ray.d)
    shape_index = jnp.where(valid, pi.shape_index, -1)

    return SurfaceInteraction(
        t=jnp.where(valid, t, INF),
        p=p,
        n=ng,
        sh_n=ns,
        sh_s=frame[0],
        sh_t=frame[1],
        uv=uv,
        wi=wi,
        shape_index=shape_index,
        prim_index=prim,
        wavelengths=ray.wavelengths,
        time=ray.time,
    )

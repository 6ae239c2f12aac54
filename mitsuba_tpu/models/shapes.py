"""Shapes: triangle meshes + generators for analytic primitives.

Reference: src/render/mesh.cpp (1865 LoC) + shape plugins (src/shapes/ —
rectangle.cpp, cube.cpp, sphere.cpp, obj.cpp, ply.cpp ...).  TPU design:
*everything is triangles*.  Analytic rectangles/cubes mesh exactly; spheres
mesh to a configurable subdivision (an analytic sphere shape can be added to
the intersector later as a second primitive type).  One global flattened
triangle buffer feeds a single intersection kernel — no per-shape virtual
dispatch in the hot loop.

Position sampling for area emitters mirrors Shape::sample_position
(shape.h:348): uniform-by-area over faces via a DiscreteDistribution, then
uniform barycentrics.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.pytree import pytree, static, field
from ..core import warp
from ..core.distr import DiscreteDistribution
from ..core.math import cross, dot, normalize, safe_sqrt
from ..core.records import PositionSample


@pytree
class Mesh:
    """A triangle mesh in world space.

    ``vertices`` is the differentiable leaf (lens-design optimizes it
    directly, reference lens.py:509 scatters sag updates into
    vertex_positions).
    """

    vertices: jnp.ndarray        # (V, 3) float32
    faces: jnp.ndarray           # (F, 3) int32
    normals: jnp.ndarray | None  # (V, 3) or None
    uvs: jnp.ndarray | None      # (V, 2) or None
    id: str = static("mesh")
    bsdf_index: int = static(0)
    emitter_index: int = static(-1)  # -1: not an emitter
    interior_medium: int = static(-1)
    exterior_medium: int = static(-1)

    @staticmethod
    def make(vertices, faces, normals=None, uvs=None, **kw):
        return Mesh(
            vertices=jnp.asarray(vertices, jnp.float32),
            faces=jnp.asarray(faces, jnp.int32),
            normals=None if normals is None else jnp.asarray(normals, jnp.float32),
            uvs=None if uvs is None else jnp.asarray(uvs, jnp.float32),
            **kw,
        )

    def face_areas(self):
        tri = self.vertices[self.faces]
        e1 = tri[:, 1] - tri[:, 0]
        e2 = tri[:, 2] - tri[:, 0]
        return 0.5 * jnp.sqrt(
            jnp.maximum(jnp.sum(cross(e1, e2) ** 2, axis=-1), 1e-30)
        )

    def surface_area(self):
        return jnp.sum(self.face_areas())

    def sample_position(self, sample1, sample2, face_distr: DiscreteDistribution):
        """Uniform-by-area position sample. sample1: (N,), sample2: (N,2)."""
        fidx, face_pmf = face_distr.sample_pmf(sample1)
        f = self.faces[fidx]
        p0, p1, p2 = self.vertices[f[:, 0]], self.vertices[f[:, 1]], self.vertices[f[:, 2]]
        b = warp.square_to_uniform_triangle(sample2)
        p = (
            p0 * (1.0 - b[..., 0] - b[..., 1])[:, None]
            + p1 * b[..., 0:1]
            + p2 * b[..., 1:2]
        )
        n = normalize(cross(p1 - p0, p2 - p0))
        area = 0.5 * jnp.sqrt(
            jnp.maximum(jnp.sum(cross(p1 - p0, p2 - p0) ** 2, axis=-1), 1e-30)
        )
        # pdf over the whole mesh surface (area measure)
        pdf = face_pmf / jnp.maximum(area, 1e-20)
        return PositionSample(
            p=p, n=n, uv=b, pdf=pdf, delta=jnp.zeros(p.shape[:-1], bool)
        )

    def sample_position_reuse(self, sample2, face_distr: DiscreteDistribution):
        """Position sample from ONE 2D sample: the face index consumes
        sample2.x and the remainder is re-used for the barycentrics
        (Shape::sample_position semantics via sample_reuse, shape.h:348)."""
        fidx, u_re, _pmf = face_distr.sample_reuse_pmf(sample2[..., 0])
        s2 = jnp.stack([u_re, sample2[..., 1]], axis=-1)
        f = self.faces[fidx]
        p0, p1, p2 = (self.vertices[f[:, 0]], self.vertices[f[:, 1]],
                      self.vertices[f[:, 2]])
        b = warp.square_to_uniform_triangle(s2)
        p = (p0 * (1.0 - b[..., 0] - b[..., 1])[:, None]
             + p1 * b[..., 0:1] + p2 * b[..., 1:2])
        cr = cross(p1 - p0, p2 - p0)
        n = normalize(cr)
        area = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(cr**2, axis=-1), 1e-30))
        pdf = _pmf / jnp.maximum(area, 1e-20)
        return PositionSample(
            p=p, n=n, uv=b, pdf=pdf, delta=jnp.zeros(p.shape[:-1], bool)
        )


# --------------------------------------------------------------------------
# Mesh generators (host-side numpy; reference plugins rectangle.cpp etc.)
# --------------------------------------------------------------------------

def rectangle(to_world=None):
    """Unit rectangle [-1,1]^2 in the z=0 plane, +z normal (rectangle.cpp)."""
    v = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    return _apply_to_world(v, f, n, uv, to_world)


def cube(to_world=None):
    """Axis-aligned [-1,1]^3 cube with outward normals (cube.cpp)."""
    vs, fs, ns, uvs = [], [], [], []
    base_v = np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32)
    base_f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    base_uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    # 6 faces: transform the z=1-offset rectangle onto each cube face
    rots = [
        np.eye(3),                                        # +z
        np.diag([1.0, -1.0, -1.0]),                       # -z
        np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0.]]),    # +y? (rotated)
        np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0.]]),
        np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0.]]),
        np.array([[0, 0, -1], [0, 1, 0], [1, 0, 0.]]),
    ]
    off = 0
    for R in rots:
        v = (base_v + np.array([0, 0, 1.0], np.float32)) @ np.asarray(R, np.float32).T
        n = np.tile((np.array([0, 0, 1.0], np.float32) @ np.asarray(R, np.float32).T)[None], (4, 1))
        vs.append(v)
        ns.append(n)
        uvs.append(base_uv)
        fs.append(base_f + off)
        off += 4
    return _apply_to_world(
        np.concatenate(vs), np.concatenate(fs), np.concatenate(ns),
        np.concatenate(uvs), to_world,
    )


def sphere_mesh(subdiv: int = 4, to_world=None):
    """Icosphere approximation of the unit sphere (sphere.cpp analogue)."""
    t = (1.0 + 5 ** 0.5) / 2.0
    v = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        np.float64,
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        np.int64,
    )
    for _ in range(subdiv):
        edge_mid: dict[tuple[int, int], int] = {}
        verts = list(v)
        new_f = []

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in edge_mid:
                m = verts[a] + verts[b]
                m /= np.linalg.norm(m)
                edge_mid[key] = len(verts)
                verts.append(m)
            return edge_mid[key]

        for a, b, c in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_f += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v = np.asarray(verts)
        f = np.asarray(new_f, np.int64)
    v = v.astype(np.float32)
    n = v.copy()  # unit sphere: normal == position
    theta = np.arccos(np.clip(v[:, 2], -1, 1))
    phi = np.arctan2(v[:, 1], v[:, 0])
    uv = np.stack([(phi + np.pi) / (2 * np.pi), theta / np.pi], axis=-1).astype(np.float32)
    return _apply_to_world(v, f.astype(np.int32), n, uv, to_world)


def disk_mesh(n_seg: int = 64, to_world=None):
    """Unit disk in the z=0 plane (disk.cpp analogue), triangle fan."""
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    rim = np.stack([np.cos(ang), np.sin(ang), np.zeros(n_seg)], axis=-1)
    v = np.concatenate([[[0, 0, 0]], rim]).astype(np.float32)
    f = np.stack(
        [
            np.zeros(n_seg, np.int32),
            np.arange(1, n_seg + 1, dtype=np.int32),
            np.roll(np.arange(1, n_seg + 1, dtype=np.int32), -1),
        ],
        axis=-1,
    )
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (n_seg + 1, 1))
    uv = (v[:, :2] + 1) * 0.5
    return _apply_to_world(v, f, nrm, uv, to_world)


def _apply_to_world(v, f, n, uv, to_world):
    if to_world is not None:
        m = np.asarray(to_world, np.float32)
        v = v @ m[:3, :3].T + m[:3, 3]
        inv = np.linalg.inv(m[:3, :3])
        n = n @ inv
        norms = np.linalg.norm(n, axis=-1, keepdims=True)
        n = n / np.maximum(norms, 1e-20)
        # winding flip if the transform mirrors
        if np.linalg.det(m[:3, :3]) < 0:
            f = f[:, ::-1].copy()
    return v, f, n, uv


def cylinder_mesh(n_seg: int = 32, p0=(0, 0, 0), p1=(0, 0, 1), radius=1.0,
                  to_world=None, capped=False):
    """Open cylinder from p0 to p1 (src/shapes/cylinder.cpp analogue)."""
    p0 = np.asarray(p0, np.float32)
    p1 = np.asarray(p1, np.float32)
    axis = p1 - p0
    length = float(np.linalg.norm(axis))
    axis /= max(length, 1e-20)
    # orthonormal frame around the axis
    h = np.array([1.0, 0, 0]) if abs(axis[0]) < 0.9 else np.array([0, 1.0, 0])
    s = np.cross(axis, h)
    s /= np.linalg.norm(s)
    t = np.cross(axis, s)
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    ring = (np.outer(np.cos(ang), s) + np.outer(np.sin(ang), t)) * radius
    v_bot = p0[None] + ring
    v_top = p1[None] + ring
    v = np.concatenate([v_bot, v_top]).astype(np.float32)
    n_out = np.concatenate([ring, ring]) / radius
    f = []
    for i in range(n_seg):
        j = (i + 1) % n_seg
        f.append([i, n_seg + i, n_seg + j])
        f.append([i, n_seg + j, j])
    uv = np.stack(
        [np.concatenate([ang, ang]) / (2 * np.pi),
         np.concatenate([np.zeros(n_seg), np.ones(n_seg)])], axis=-1
    ).astype(np.float32)
    if capped:
        base = len(v)
        v = np.concatenate([v, p0[None], p1[None]]).astype(np.float32)
        n_out = np.concatenate(
            [n_out, -axis[None], axis[None]]).astype(np.float32)
        uv = np.concatenate([uv, [[0.5, 0.0], [0.5, 1.0]]]).astype(np.float32)
        for i in range(n_seg):
            j = (i + 1) % n_seg
            f.append([base, j, i])                       # bottom cap
            f.append([base + 1, n_seg + i, n_seg + j])   # top cap
    return _apply_to_world(v, np.asarray(f, np.int32),
                           n_out.astype(np.float32), uv, to_world)


def instance_meshes(mesh, transforms):
    """ShapeGroup/Instance analogue (src/shapes/{shapegroup,instance}.cpp):
    replicate a Mesh under a list of 4x4 transforms.

    The TPU design flattens instances into the global triangle buffer at
    build time (geometry is replicated; trace-time instancing would break
    the single-buffer brute/BVH layout for little gain at these scales).
    """
    out = []
    for k, m4 in enumerate(transforms):
        v, f, n, uv = _apply_to_world(
            np.asarray(mesh.vertices), np.asarray(mesh.faces),
            np.asarray(mesh.normals) if mesh.normals is not None
            else np.zeros_like(np.asarray(mesh.vertices)),
            np.asarray(mesh.uvs) if mesh.uvs is not None
            else np.zeros((np.asarray(mesh.vertices).shape[0], 2),
                          np.float32),
            np.asarray(m4, np.float32),
        )
        out.append(Mesh.make(
            v, f, normals=n if mesh.normals is not None else None,
            uvs=uv, bsdf_index=mesh.bsdf_index,
            emitter_index=mesh.emitter_index,
            id=f"{mesh.id}_inst{k}",
        ))
    return out


def _sweep_tube(centers, radii, n_seg, to_world=None):
    """Sweep a circular cross-section along a polyline with smooth
    normals and parallel-transported frames (shared tube builder for the
    curve shapes)."""
    centers = np.asarray(centers, np.float32)
    radii = np.broadcast_to(np.asarray(radii, np.float32),
                            (centers.shape[0],))
    k = centers.shape[0]
    assert k >= 2
    # tangents (central differences) + parallel-transported frame
    tang = np.zeros_like(centers)
    tang[0] = centers[1] - centers[0]
    tang[-1] = centers[-1] - centers[-2]
    tang[1:-1] = centers[2:] - centers[:-2]
    tang /= np.maximum(np.linalg.norm(tang, axis=1, keepdims=True), 1e-12)
    h = np.array([1.0, 0, 0]) if abs(tang[0][0]) < 0.9 else \
        np.array([0, 1.0, 0])
    s = np.cross(tang[0], h)
    s /= np.linalg.norm(s)
    frames = [(s, np.cross(tang[0], s))]
    for i in range(1, k):
        s_prev = frames[-1][0]
        s_i = s_prev - tang[i] * np.dot(tang[i], s_prev)
        nrm = np.linalg.norm(s_i)
        if nrm < 1e-8:
            hh = np.array([1.0, 0, 0]) if abs(tang[i][0]) < 0.9 else \
                np.array([0, 1.0, 0])
            s_i = np.cross(tang[i], hh)
            nrm = np.linalg.norm(s_i)
        s_i /= nrm
        frames.append((s_i, np.cross(tang[i], s_i)))
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    vs, ns, uvs = [], [], []
    for i in range(k):
        s_i, t_i = frames[i]
        ring_n = (np.outer(np.cos(ang), s_i) + np.outer(np.sin(ang), t_i))
        vs.append(centers[i][None] + ring_n * radii[i])
        ns.append(ring_n)
        uvs.append(np.stack([ang / (2 * np.pi),
                             np.full(n_seg, i / (k - 1))], -1))
    v = np.concatenate(vs).astype(np.float32)
    n = np.concatenate(ns).astype(np.float32)
    uv = np.concatenate(uvs).astype(np.float32)
    f = []
    for i in range(k - 1):
        for a in range(n_seg):
            b = (a + 1) % n_seg
            i0, i1 = i * n_seg + a, i * n_seg + b
            j0, j1 = (i + 1) * n_seg + a, (i + 1) * n_seg + b
            # outward winding: geometric normals agree with the smooth
            # ring normals (and the reference's outward tube normals)
            f.append([i0, j1, j0])
            f.append([i0, i1, j1])
    f = np.asarray(f, np.int32)
    return _apply_to_world(v, f, n, uv, to_world)


def linear_curve_mesh(control_points, radii, n_seg: int = 8,
                      to_world=None):
    """Linear curve segments swept into a tube
    (src/shapes/linearcurve.cpp — the reference ray-traces the swept
    surface analytically; here the static tessellation IS the shape,
    which the triangle pipeline then traces)."""
    return _sweep_tube(control_points, radii, n_seg, to_world)


def bspline_centerline(control_points, radii, subdiv: int = 4):
    """Uniform cubic B-spline centerline samples (positions AND radii)
    with clamped endpoints (bsplinecurve.cpp basis).  Shared by the
    tessellated tube mesh and the analytic swept-sphere prims."""
    cp = np.asarray(control_points, np.float32)
    r = np.broadcast_to(np.asarray(radii, np.float32), (cp.shape[0],))
    cp = np.concatenate([cp[:1], cp, cp[-1:]])
    r = np.concatenate([r[:1], r, r[-1:]])
    k = cp.shape[0]
    ts = np.linspace(0.0, 1.0, subdiv, endpoint=False)
    pts, rads = [], []
    for i in range(k - 3):
        p = cp[i:i + 4]
        rr = r[i:i + 4]
        for t in ts:
            b0 = (1 - t) ** 3 / 6.0
            b1 = (3 * t ** 3 - 6 * t ** 2 + 4) / 6.0
            b2 = (-3 * t ** 3 + 3 * t ** 2 + 3 * t + 1) / 6.0
            b3 = t ** 3 / 6.0
            w = np.array([b0, b1, b2, b3], np.float32)
            pts.append(w @ p)
            rads.append(float(w @ rr))
    # close the curve end exactly
    pts.append((cp[-3] + 4.0 * cp[-2] + cp[-1]) / 6.0)
    rads.append(float((r[-3] + 4.0 * r[-2] + r[-1]) / 6.0))
    return (np.asarray(pts, np.float32),
            np.asarray(rads, np.float32))


def bspline_curve_mesh(control_points, radii, n_seg: int = 8,
                       subdiv: int = 4, to_world=None):
    """Cubic B-spline curve swept into a tube
    (src/shapes/bsplinecurve.cpp): uniform cubic B-spline evaluated at
    ``subdiv`` points per span (positions AND radii), then tessellated.
    Endpoints are clamped by repeating the first/last control point."""
    pts, rads = bspline_centerline(control_points, radii, subdiv)
    return _sweep_tube(pts, rads, n_seg, to_world)

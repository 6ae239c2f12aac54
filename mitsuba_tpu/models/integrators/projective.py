"""Projective (discontinuity) gradients: silhouette boundary sampling.

Reference: src/python/python/ad/projective.py (846 LoC,
``ProjectiveDetail``: primarily-visible silhouette sampling + sensor
Jacobian + radiance-difference eval), integrators/prb_projective.py
(PathProjectiveIntegrator) and direct_projective.py.  PRB's detached
estimator ignores moving visibility boundaries; the missing term is a
line integral over silhouette curves of

    (L_inner - L_outer) x (screen velocity of the boundary point)

which this module estimates by explicit silhouette EDGE SAMPLING
(Shape::sample_silhouette parity; mesh edge set precomputed host-side).

TPU formulation: each boundary sample contributes the scalar

    S = sum_k  stop_grad(c_k) * (m_k . u_k(theta))

where u_k is the ATTACHED screen position of the edge point (through
mesh vertices and the camera pose), m_k the detached screen-space edge
normal and c_k = <delta_image, dL> x (screen-length Jacobian) / pdf.
``jax.grad(S)`` then yields exactly the boundary term for every scene
float leaf — no sign bookkeeping is needed because flipping m flips
both the velocity and the radiance difference.

The sign convention of the radiance difference: moving the boundary
point along +m grows the (-m)-side region, so dI = (L(-m side) -
L(+m side)) x (m . du/dtheta) per unit screen length.

Scope: primarily-visible silhouettes (camera discontinuities) with
uniform or grid-guided edge sampling (guiding.py), shadow
(indirect-visibility) boundaries via the light->edge->receiver
construction (indirect_boundary_grads) with optional octree guiding
(OcSpaceDistr) and camera-side prefix walks of ARBITRARY depth
(indirect_depth=k, round 4: a PRB-style detached random walk whose
every vertex connects bidirectionally to the boundary point), so
shadow boundaries are differentiated even when their receiver is
only indirectly visible through several bounces.  Receiver-motion
terms are included via the attached re-projection (view_on_plane).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ...core import rng
from ...core.pytree import pytree, static
from ...core.records import Ray
from .common import DIM_APERTURE, DIM_POS, DIM_WAVELENGTH, sample_rays
from .guiding import GridDistr, UniformDistr
from .path import PathIntegrator
from .prb import PRBIntegrator, _float_partition

# RNG dimension block for boundary sampling (disjoint from path dims)
DIM_B_EDGE = 8192
DIM_B_T = 8193
DIM_B_SUB = 8200


@pytree
class EdgeTable:
    """Unique mesh edges with their adjacent faces (host-built, static
    topology; mesh.cpp silhouette edge list parity)."""

    v0: jnp.ndarray       # (E,) int32 vertex ids (global)
    v1: jnp.ndarray       # (E,)
    f0: jnp.ndarray       # (E,) adjacent face
    f1: jnp.ndarray       # (E,) second face or -1 (open boundary)


def build_silhouette_edges(scene) -> EdgeTable:
    """Extract the unique edge set of the scene's global face table."""
    _, f, *_ = scene.geometry()
    f = np.asarray(jax.lax.stop_gradient(f))
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    face_id = np.tile(np.arange(f.shape[0], dtype=np.int32), 3)
    key = np.sort(e, axis=1)
    order = np.lexsort((key[:, 1], key[:, 0]))
    key = key[order]
    face_id = face_id[order]
    new = np.ones(key.shape[0], bool)
    new[1:] = np.any(key[1:] != key[:-1], axis=1)
    first = np.nonzero(new)[0]
    v0 = key[first, 0]
    v1 = key[first, 1]
    f0 = face_id[first]
    # second adjacent face (if the next row shares the key)
    nxt = np.minimum(first + 1, key.shape[0] - 1)
    has2 = (nxt != first) & ~new[np.minimum(nxt, key.shape[0] - 1)]
    f1 = np.where(has2, face_id[nxt], -1)
    return EdgeTable(
        v0=jnp.asarray(v0, jnp.int32), v1=jnp.asarray(v1, jnp.int32),
        f0=jnp.asarray(f0, jnp.int32), f1=jnp.asarray(f1, jnp.int32),
    )


def _face_normals(verts, faces):
    p0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - p0
    e2 = verts[faces[:, 2]] - p0
    n = jnp.cross(e1, e2)
    return n / jnp.sqrt(jnp.maximum(
        jnp.sum(n * n, -1, keepdims=True), 1e-20))


def _project(sensor, x, active):
    """World point -> (film uv (N,2) in pixels, valid, camera point)."""
    n = x.shape[0]
    ds, w = sensor.sample_direction(x, jnp.full((n, 2), 0.5), active)
    valid = active & (ds.pdf > 0.0) & jnp.any(w != 0.0, axis=-1)
    return ds.uv, valid, ds.p


def _radiance_at(scene_det, integrator, film_pos, lane, seed, active,
                 n_sub: int):
    """Mean radiance of ``n_sub`` paths through the given film position."""
    sensor = scene_det.sensor
    w, h = sensor.film.width, sensor.film.height
    n = film_pos.shape[0]
    pos_unit = film_pos / jnp.asarray([w, h], jnp.float32)
    L = jnp.zeros((n, 3))
    for k in range(n_sub):
        lane_k = lane + jnp.int32(1 + k) * jnp.int32(7919)
        wav = rng.sample_1d(seed, lane_k, jnp.int32(DIM_WAVELENGTH))
        ap = rng.sample_2d(seed, lane_k, jnp.int32(DIM_APERTURE))
        ray, wgt = sensor.sample_ray(jnp.zeros((n,)), wav, pos_unit, ap)
        L = L + integrator.sample(scene_det, ray, lane_k, seed, active) * wgt
    return L / n_sub


def primary_boundary_grads(scene, edges: EdgeTable, integrator, grad_image,
                           seed, n_samples: int = 4096, n_sub: int = 4,
                           eps_px: float = 0.75, guiding: str = "grid"):
    """Boundary-term gradients for every scene float leaf.

    projective.py:52-227 (primarily visible silhouette) re-expressed as
    the attached scalar S described in the module docstring.
    """
    scene_det = jax.lax.stop_gradient(scene)
    floats, rebuild, _ = _float_partition(scene)
    sensor_det = scene_det.sensor
    ctx_det = scene_det.trace_ctx()

    verts, faces, *_ = scene_det.geometry()
    p0_all = verts[edges.v0]
    p1_all = verts[edges.v1]
    lengths = jnp.sqrt(jnp.maximum(
        jnp.sum((p1_all - p0_all) ** 2, -1), 1e-20))
    fn = _face_normals(verts, faces)

    lane = jnp.arange(n_samples, dtype=jnp.int32)
    seed_b = jnp.uint32(seed) ^ jnp.uint32(0x5EED0B0D)

    def one_pass(distr, pass_salt):
        lane_p = lane + jnp.int32(pass_salt) * jnp.int32(104729)
        u_e = rng.sample_1d(seed_b, lane_p, jnp.int32(DIM_B_EDGE))
        t = rng.sample_1d(seed_b, lane_p, jnp.int32(DIM_B_T))
        idx, pmf = distr.sample(u_e)
        p0 = p0_all[idx]
        p1 = p1_all[idx]
        x = p0 * (1.0 - t[:, None]) + p1 * t[:, None]
        active = jnp.ones((n_samples,), bool)

        uv, valid, cam_p = _project(sensor_det, x, active)
        d = x - cam_p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-20))
        d = d / dist[:, None]

        # silhouette classification (open edges always qualify)
        n0 = fn[edges.f0[idx]]
        n1 = fn[jnp.maximum(edges.f1[idx], 0)]
        c0 = jnp.sum(n0 * d, -1)
        c1 = jnp.sum(n1 * d, -1)
        sil = (c0 * c1 < 0.0) | (edges.f1[idx] < 0)

        # visibility from the camera (boundary must be the first hit)
        vis_ray = Ray.make(cam_p, d, maxt=dist * (1.0 - 1e-3))
        occluded = scene_det.ray_test(vis_ray, valid, ctx_det)
        valid = valid & sil & ~occluded

        # screen-space edge tangent (JVP of the projection) and normal
        edir = (p1 - p0) / lengths[idx][:, None]
        du_dl = jax.jvp(
            lambda xx: _project(sensor_det, xx, active)[0], (x,), (edir,)
        )[1]
        speed = jnp.sqrt(jnp.maximum(jnp.sum(du_dl ** 2, -1), 1e-20))
        m_hat = jnp.stack([-du_dl[:, 1], du_dl[:, 0]], -1) / speed[:, None]

        # radiance difference across the edge: -m side minus +m side
        L_plus = _radiance_at(scene_det, integrator, uv + eps_px * m_hat,
                              lane_p, seed_b, valid, n_sub)
        L_minus = _radiance_at(scene_det, integrator, uv - eps_px * m_hat,
                               lane_p + jnp.int32(31337), seed_b, valid,
                               n_sub)
        dL = L_minus - L_plus

        # adjoint image at the pixel under the edge point
        film = sensor_det.film
        px = jnp.clip(jnp.floor(uv[:, 0]).astype(jnp.int32), 0,
                      film.width - 1)
        py = jnp.clip(jnp.floor(uv[:, 1]).astype(jnp.int32), 0,
                      film.height - 1)
        delta = grad_image[py, px]

        inv_pdf = lengths[idx] / jnp.maximum(pmf, 1e-20)
        coeff = jnp.where(
            valid,
            jnp.sum(delta * dL, -1) * speed * inv_pdf / n_samples,
            0.0,
        )
        return idx, t, m_hat, coeff

    if guiding != "uniform":
        # grid warm-up is the primary-term guide for every non-uniform
        # mode (octree/projective specialize only the indirect term)
        warm = GridDistr.create(lengths)
        idx_w, _, _, coeff_w = one_pass(warm, 1)
        warm = warm.update(idx_w, jnp.abs(coeff_w))
        distr = warm.finalize()
    else:
        distr = UniformDistr.create(lengths)
    idx, t, m_hat, coeff = one_pass(distr, 0)

    def S(fl):
        sc = rebuild(fl)
        v_att, *_ = sc.geometry()
        x_att = (v_att[edges.v0[idx]] * (1.0 - t[:, None])
                 + v_att[edges.v1[idx]] * t[:, None])
        uv_att, _, _ = _project(sc.sensor, x_att,
                                jnp.ones((x_att.shape[0],), bool))
        uv_att = jnp.nan_to_num(uv_att)
        return jnp.sum(coeff * jnp.sum(m_hat * uv_att, -1))

    return jax.grad(S)(floats)


def analytic_boundary_grads(scene, integrator, grad_image, seed,
                            n_samples: int = 2048, n_sub: int = 4,
                            eps_px: float = 0.75):
    """EXACT silhouette boundary gradients for analytic prims
    (models/analytic.py): sphere apparent-contour circles and disk rims
    in closed form — the reference's Shape::sample_silhouette for
    sphere.cpp:383-475 / disk.cpp:235-330, without the tessellation
    bias of mesh edge sampling.

    Unlike mesh edges (fixed curves on the surface, barycentric t
    detached — exact for polyhedra), a sphere's contour generator moves
    when the sphere or the camera moves, so the attached silhouette
    point is the full closed form x(theta; center, radius, cam_origin):

        z = (o - c)/D,  cos_b = r/D,
        x = c + r*(cos_b*z + sin_b*(cos(theta)*s + sin(theta)*t)).

    Gradients of S then carry the contour-generator shift exactly.
    """
    scene_det = jax.lax.stop_gradient(scene)
    floats, rebuild, _ = _float_partition(scene)
    an_det = scene_det.scene_analytic
    nS = an_det.n_spheres
    nD = an_det.n_disks
    n_curves = nS + nD
    if n_curves == 0:
        return [jnp.zeros_like(x) for x in floats]
    sensor_det = scene_det.sensor
    ctx_det = scene_det.trace_ctx()

    lane = jnp.arange(n_samples, dtype=jnp.int32)
    seed_b = jnp.uint32(seed) ^ jnp.uint32(0x51171E77)
    u_c = rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_EDGE))
    u_t = rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_T))
    idx = jnp.clip((u_c * n_curves).astype(jnp.int32), 0, n_curves - 1)
    theta = u_t * (2.0 * jnp.pi)
    pmf = 1.0 / n_curves

    def x_of(theta, idx, an, cam_o):
        """Closed-form silhouette point per lane (sphere or disk rim)."""
        from ...core.math import coordinate_system as _csys

        outs = None
        if nS:
            j = jnp.clip(idx, 0, nS - 1)
            c = an.sp_center[j]
            r = an.sp_radius[j]
            oc = cam_o - c
            D = jnp.sqrt(jnp.maximum(jnp.sum(oc * oc, -1), 1e-20))
            z = oc / D[:, None]
            cos_b = jnp.clip(r / D, 0.0, 1.0 - 1e-6)
            sin_b = jnp.sqrt(jnp.maximum(1.0 - cos_b * cos_b, 1e-12))
            s, t = _csys(z)
            ring = (s * jnp.cos(theta)[:, None]
                    + t * jnp.sin(theta)[:, None])
            outs = c + r[:, None] * (
                cos_b[:, None] * z + sin_b[:, None] * ring)
        if nD:
            j = jnp.clip(idx - nS, 0, nD - 1)
            x_d = (an.dk_center[j]
                   + an.dk_su[j] * jnp.cos(theta)[:, None]
                   + an.dk_sv[j] * jnp.sin(theta)[:, None])
            outs = x_d if outs is None else jnp.where(
                (idx >= nS)[:, None], x_d, outs)
        return outs

    # detached sample positions + curve tangents (d x / d theta)
    cam_o_det = jax.lax.stop_gradient(
        jnp.broadcast_to(scene_det.sensor.to_world[:3, 3],
                         (n_samples, 3)))
    x, dx_dth = jax.jvp(
        lambda th: x_of(th, idx, an_det, cam_o_det),
        (theta,), (jnp.ones_like(theta),))
    speed_w = jnp.sqrt(jnp.maximum(jnp.sum(dx_dth ** 2, -1), 1e-20))
    edir = dx_dth / speed_w[:, None]
    active = jnp.ones((n_samples,), bool)

    uv, valid, cam_p = _project(sensor_det, x, active)
    d = x - cam_p
    dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-20))
    d = d / dist[:, None]

    # visibility: push the test point slightly off the source prim so
    # the tangent/grazing ray doesn't falsely self-occlude
    if nS:
        j = jnp.clip(idx, 0, nS - 1)
        ctr = an_det.sp_center[j]
        x_out = ctr + (x - ctr) * 1.001
        x_test = jnp.where((idx < nS)[:, None], x_out, x)
    else:
        x_test = x
    if nD:
        j = jnp.clip(idx - nS, 0, nD - 1)
        ctr_d = an_det.dk_center[j]
        x_out_d = ctr_d + (x_test - ctr_d) * 1.001
        x_test = jnp.where((idx >= nS)[:, None], x_out_d, x_test)
    d_t = x_test - cam_p
    dist_t = jnp.sqrt(jnp.maximum(jnp.sum(d_t * d_t, -1), 1e-20))
    vis_ray = Ray.make(cam_p, d_t / dist_t[:, None],
                       maxt=dist_t * (1.0 - 2e-3))
    occluded = scene_det.ray_test(vis_ray, valid, ctx_det)
    valid = valid & ~occluded

    # screen-space tangent/normal at the boundary point
    du_dl = jax.jvp(
        lambda xx: _project(sensor_det, xx, active)[0], (x,), (edir,)
    )[1]
    speed = jnp.sqrt(jnp.maximum(jnp.sum(du_dl ** 2, -1), 1e-20))
    m_hat = jnp.stack([-du_dl[:, 1], du_dl[:, 0]], -1) / speed[:, None]

    L_plus = _radiance_at(scene_det, integrator, uv + eps_px * m_hat,
                          lane, seed_b, valid, n_sub)
    L_minus = _radiance_at(scene_det, integrator, uv - eps_px * m_hat,
                           lane + jnp.int32(31337), seed_b, valid, n_sub)
    dL = L_minus - L_plus

    film = sensor_det.film
    px = jnp.clip(jnp.floor(uv[:, 0]).astype(jnp.int32), 0,
                  film.width - 1)
    py = jnp.clip(jnp.floor(uv[:, 1]).astype(jnp.int32), 0,
                  film.height - 1)
    delta = grad_image[py, px]

    # curve-length pdf: theta uniform -> p(l) = pmf / (2*pi*|dx/dth|)
    inv_pdf = (2.0 * jnp.pi) * speed_w / pmf
    coeff = jnp.where(
        valid,
        jnp.sum(delta * dL, -1) * speed * inv_pdf / n_samples,
        0.0,
    )

    def S(fl):
        sc = rebuild(fl)
        cam_o_att = jnp.broadcast_to(sc.sensor.to_world[:3, 3],
                                     (n_samples, 3))
        x_att = x_of(theta, idx, sc.scene_analytic, cam_o_att)
        uv_att, _, _ = _project(sc.sensor, x_att,
                                jnp.ones((n_samples,), bool))
        uv_att = jnp.nan_to_num(uv_att)
        return jnp.sum(coeff * jnp.sum(m_hat * uv_att, -1))

    return jax.grad(S)(floats)


def indirect_boundary_grads(scene, edges: EdgeTable, grad_image, seed,
                            n_samples: int = 4096, eps_frac: float = 0.01,
                            guiding: str = "uniform",
                            n_warmup: int | None = None,
                            indirect_depth: int = 1):
    """Shadow (indirect-visibility) boundary gradients for direct
    illumination (projective.py:228-373 indirect silhouettes, one-bounce
    scope).  ``guiding="octree"`` runs a uniform warm-up pass, builds an
    OcSpaceDistr over the (edge-u, t, light-u) sample cube from the
    observed |integrand| (guiding.py:141), and importance-samples the
    main pass from it.

    Sampling follows the light->edge->receiver construction: a light
    point y and a silhouette edge point x_e (silhouette AS SEEN FROM y)
    define the ray whose continuation hits the receiver at the shadow
    boundary x_B.  The boundary term of the direct-lighting integral is

        sum  A_L/(p_edge N) x Delta[W f G Le](x_B) x |dx_B/dl_e|
             x (n_r . dx_B/dtheta)

    with x_B attached through BOTH the edge and light vertices (blocker
    and light motion), the receiver plane detached, W the ptracer-style
    camera connection (sensor weight x adjoint BSDF eval at the
    receiver), and Delta estimated by visibility rays on both sides of
    the curve — the in-plane normal orientation cancels as in the
    primary case.  Receiver motion is a further term (future work).
    """
    if guiding in ("octree", "projective"):
        from .guiding import OcSpaceDistr

        n_w = n_warmup or max(n_samples // 4, 512)
        seed_points = None
        if guiding == "projective":
            # seed the warm-up AT projected silhouettes instead of
            # uniformly over the cube (ProjectiveDetail projxpath
            # modes): light-side paths are walked onto the silhouette
            # edges they graze (projection.py mesh_walk)
            from .projection import (build_face_adjacency,
                                     project_seed_points)

            adj = build_face_adjacency(scene, edges)
            pts_p, ok = project_seed_points(
                scene, edges, adj, seed ^ 0x11A2B3, n_w)
            # invalid seeds fall back to a uniform cube point so the
            # warm-up keeps full support
            lane_w = jnp.arange(n_w, dtype=jnp.int32)
            sw = jnp.uint32(seed) ^ jnp.uint32(0x77AB12)
            u_fallback = jnp.stack([
                rng.sample_1d(sw, lane_w, jnp.int32(DIM_B_EDGE)),
                rng.sample_1d(sw, lane_w, jnp.int32(DIM_B_T)),
                rng.sample_1d(sw, lane_w, jnp.int32(DIM_B_SUB)),
            ], axis=-1)
            seed_points = jnp.where(ok[:, None], pts_p, u_fallback)
        _, pts, mass = _indirect_pass(
            scene, edges, grad_image, seed ^ 0x5EED0C7, n_w, eps_frac,
            oc=None, collect=True, indirect_depth=indirect_depth,
            points=seed_points)
        oc = OcSpaceDistr.create_from_samples(pts, mass)
        g, _, _ = _indirect_pass(scene, edges, grad_image, seed,
                                 n_samples, eps_frac, oc=oc,
                                 indirect_depth=indirect_depth)
        return g
    g, _, _ = _indirect_pass(scene, edges, grad_image, seed, n_samples,
                             eps_frac, indirect_depth=indirect_depth)
    return g


def _indirect_pass(scene, edges: EdgeTable, grad_image, seed,
                   n_samples, eps_frac, oc=None, collect=False,
                   indirect_depth=1, points=None, diag_tangent=None):
    """One boundary-sampling pass; ``oc`` importance-samples the
    (u_edge, t, u_light) cube; ``points`` (N, 3) evaluates the
    integrand at explicit cube points instead (projection-seeded
    warm-up).  Returns (grads, points, |mass|)."""
    scene_det = jax.lax.stop_gradient(scene)
    floats, rebuild, _ = _float_partition(scene)
    ctx_det = scene_det.trace_ctx()
    sensor_det = scene_det.sensor
    film = sensor_det.film
    w_px, h_px = film.width, film.height
    light_shape = scene_det.emitter_shape[0]
    le = scene_det.emitters[0].radiance.value  # constant-radiance scope

    verts, faces, *_ = scene_det.geometry()
    p0_all = verts[edges.v0]
    p1_all = verts[edges.v1]
    lengths = jnp.sqrt(jnp.maximum(
        jnp.sum((p1_all - p0_all) ** 2, -1), 1e-20))
    fn = _face_normals(verts, faces)
    distr = UniformDistr.create(lengths)

    # light-face set (static) + area-weighted face sampling
    counts = [int(m.faces.shape[0]) for m in scene_det.meshes]
    fshape_np = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    lfaces = np.nonzero(fshape_np == light_shape)[0]
    lf = faces[jnp.asarray(lfaces)]
    lv0 = verts[lf[:, 0]]
    lv1 = verts[lf[:, 1]]
    lv2 = verts[lf[:, 2]]
    lareas = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(
        jnp.cross(lv1 - lv0, lv2 - lv0) ** 2, -1), 1e-30))
    A_L = jnp.sum(lareas)
    ldistr = UniformDistr.create(lareas)

    lane = jnp.arange(n_samples, dtype=jnp.int32)
    seed_b = jnp.uint32(seed) ^ jnp.uint32(0x1D1BEC7)

    # ---- detached sampling: light point y + edge point x_e ----
    u_lf = rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_SUB))
    u_ly = rng.sample_2d(seed_b, lane, jnp.int32(DIM_B_SUB + 1))
    if points is not None:
        u_lf = points[:, 2]
        inv_oc = jnp.ones((n_samples,))
    elif oc is not None:
        u_sel = rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_SUB + 3))
        u3 = jnp.stack([
            rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_SUB + 4)),
            rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_SUB + 5)),
            rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_SUB + 6)),
        ], axis=-1)
        q, pdf_oc = oc.sample(u_sel, u3)
        inv_oc = 1.0 / jnp.maximum(pdf_oc, 1e-12)
        u_lf = q[:, 2]
    else:
        inv_oc = jnp.ones((n_samples,))
    lidx, _ = ldistr.sample(u_lf)
    st = jnp.sqrt(jnp.maximum(1.0 - u_ly[:, 0], 0.0))
    b0 = 1.0 - st
    b1 = st * u_ly[:, 1]
    y = (lv0[lidx] * (1.0 - b0 - b1)[:, None] + lv1[lidx] * b0[:, None]
         + lv2[lidx] * b1[:, None])
    n_y = jnp.cross(lv1[lidx] - lv0[lidx], lv2[lidx] - lv0[lidx])
    n_y = n_y / jnp.sqrt(jnp.maximum(
        jnp.sum(n_y ** 2, -1, keepdims=True), 1e-20))

    if points is not None:
        u_e = points[:, 0]
        t_e = points[:, 1]
    elif oc is not None:
        u_e = q[:, 0]
        t_e = q[:, 1]
    else:
        u_e = rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_EDGE))
        t_e = rng.sample_1d(seed_b, lane, jnp.int32(DIM_B_T))
    idx, pmf = distr.sample(u_e)
    p0 = p0_all[idx]
    p1 = p1_all[idx]
    x_e = p0 * (1.0 - t_e[:, None]) + p1 * t_e[:, None]

    d_ye = x_e - y
    dist_e = jnp.sqrt(jnp.maximum(jnp.sum(d_ye * d_ye, -1), 1e-20))
    d_ye = d_ye / dist_e[:, None]
    # the edge must be a silhouette as seen from the light point
    c0 = jnp.sum(fn[edges.f0[idx]] * d_ye, -1)
    c1 = jnp.sum(fn[jnp.maximum(edges.f1[idx], 0)] * d_ye, -1)
    sil = (c0 * c1 < 0.0) | (edges.f1[idx] < 0)
    # the light must emit toward the edge (front side)
    emit_ok = jnp.sum(d_ye * n_y, -1) > 1e-6
    # segment y -> x_e unoccluded
    seg = Ray.make(y + d_ye * 1e-4, d_ye, maxt=dist_e * (1.0 - 1e-3))
    act0 = jnp.ones((n_samples,), bool)
    occ_e = scene_det.ray_test(seg, act0, ctx_det)
    valid = sil & emit_ok & ~occ_e

    # ---- receiver: continuation hit past the edge ----
    cont = Ray.make(x_e + d_ye * (1e-3 * dist_e[:, None] + 1e-4), d_ye)
    si_r = scene_det.ray_intersect(cont, valid, ctx_det)
    recv_ok = si_r.is_valid() & (si_r.shape_index != light_shape)
    valid = valid & recv_ok
    x_b = si_r.p
    r_tot = jnp.sqrt(jnp.maximum(jnp.sum((x_b - y) ** 2, -1), 1e-20))

    valid_b = valid          # boundary validity, pre camera connection

    # ---- camera connection (ptracer-style) ----
    uv, in_frustum, cam_p = _project(sensor_det, x_b, valid)
    d_cam = cam_p - x_b
    dist_c = jnp.sqrt(jnp.maximum(jnp.sum(d_cam * d_cam, -1), 1e-20))
    d_cam = d_cam / dist_c[:, None]
    off = 1e-4 * jnp.maximum(1.0, jnp.max(jnp.abs(x_b), -1, keepdims=True))
    sgn_c = jnp.sign(jnp.sum(d_cam * si_r.n, -1, keepdims=True))
    sh_cam = Ray.make(x_b + sgn_c * off * si_r.n, d_cam,
                      maxt=dist_c * (1.0 - 1e-3))
    occ_cam = scene_det.ray_test(sh_cam, valid, ctx_det)
    valid = valid & in_frustum & ~occ_cam
    n2 = x_b.shape[0]
    ds_cam, sw = sensor_det.sample_direction(
        x_b, jnp.full((n2, 2), 0.5), valid)
    # adjoint BSDF eval at the receiver: wi = from the light, wo = camera
    wo_cam = si_r.to_local(ds_cam.d)
    f_val, _ = scene_det.bsdf_eval_pdf(si_r, wo_cam, valid)

    # ---- receiver-curve tangent/normal + edge-length Jacobian ----
    edir = (p1 - p0) / lengths[idx][:, None]
    n_recv = si_r.n
    p_recv = jax.lax.stop_gradient(x_b)

    def to_receiver(xe, yy):
        d = xe - yy
        dn = jnp.sum(d * n_recv, -1)
        tau = jnp.sum((p_recv - yy) * n_recv, -1) / jnp.where(
            jnp.abs(dn) > 1e-9, dn, 1e-9)
        return yy + tau[:, None] * d

    dxb_dl = jax.jvp(lambda xe: to_receiver(xe, y), (x_e,), (edir,))[1]
    speed = jnp.sqrt(jnp.maximum(jnp.sum(dxb_dl ** 2, -1), 1e-20))
    t_hat = dxb_dl / speed[:, None]
    m_hat = jnp.cross(n_recv, t_hat)
    m_hat = m_hat / jnp.sqrt(jnp.maximum(
        jnp.sum(m_hat ** 2, -1, keepdims=True), 1e-20))

    # ---- visibility difference across the curve ----
    eps = eps_frac * jnp.maximum(scene_det.scene_radius, 1e-3)

    def vis(xp):
        d = y - xp
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, -1), 1e-20))
        dn = d / dist[:, None]
        sgn_v = jnp.sign(jnp.sum(dn * n_recv, -1, keepdims=True))
        o = xp + sgn_v * off * n_recv
        sh = Ray.make(o, dn, maxt=dist * (1.0 - 2e-3))
        return 1.0 - scene_det.ray_test(sh, valid_b, ctx_det).astype(
            jnp.float32)

    dV = vis(x_b + eps * m_hat) - vis(x_b - eps * m_hat)

    # ---- assemble the detached coefficient ----
    cos_xy = jnp.abs(jnp.sum(
        (y - x_b) / r_tot[:, None] * n_recv, -1))
    cos_y = jnp.abs(jnp.sum(d_ye * n_y, -1))
    G = cos_xy * cos_y / jnp.maximum(r_tot ** 2, 1e-12)
    px = jnp.clip(jnp.floor(uv[:, 0]).astype(jnp.int32), 0, w_px - 1)
    py = jnp.clip(jnp.floor(uv[:, 1]).astype(jnp.int32), 0, h_px - 1)
    delta = grad_image[py, px]
    inv_pdf = lengths[idx] / jnp.maximum(pmf, 1e-20)
    # transport sign: dI = -(V_plus - V_minus) F v; the ptracer measure
    # identity I_p = (W H) E_paths[value 1{p}] supplies the pixel factor
    coeff = jnp.where(
        valid,
        -(w_px * h_px)
        * jnp.sum(delta * sw * f_val * le[None, :], -1)
        * G * dV * speed * inv_pdf * A_L * inv_oc / n_samples,
        0.0,
    )

    # ---- deeper camera prefixes (projective.py:228-373 indirect
    # visibility at ARBITRARY prefix depth, round 4): the shadow-
    # boundary point x_B is observed through j-1 extra bounces,
    # j = 2..indirect_depth.  The prefix is a PRB-style detached random
    # walk started at a uniformly sampled film position; at EVERY
    # prefix vertex x_j the walk CONNECTS x_j <-> x_B
    # (bidirectional-style), so each sample lands on a camera-visible
    # surface and a concrete pixel delta, unlike naive cosine bouncing
    # from x_B.  extras collects (coeff_j, viewer_j) pairs for the
    # attached re-projection in S(fl) below.
    extras = []
    if indirect_depth >= 2:
        u_px = rng.sample_2d(seed_b, lane, jnp.int32(DIM_B_SUB + 7))
        u_ap = rng.sample_2d(seed_b, lane, jnp.int32(DIM_B_SUB + 8))
        cam_ray, _cw = sensor_det.sample_ray(
            jnp.zeros((n_samples,)), jnp.zeros((n_samples,)), u_px,
            u_ap)
        si_j = scene_det.ray_intersect(cam_ray, valid_b, ctx_det)
        ok_walk = valid_b & si_j.is_valid() & \
            (si_j.shape_index != light_shape)
        # BSDF throughput of the prefix walk (unity for the primary hit)
        tput_walk = jnp.ones((n_samples, 3))
        px2 = jnp.clip((u_px[:, 0] * w_px).astype(jnp.int32), 0,
                       w_px - 1)
        py2 = jnp.clip((u_px[:, 1] * h_px).astype(jnp.int32), 0,
                       h_px - 1)
        delta2 = grad_image[py2, px2]
        # connection guards (round 5): the x_j <-> x_B connection is a
        # BDPT-style join with two log-divergent tails — (a) viewers
        # grazing the receiver plane blow up the attached re-projection
        # (view_on_plane's sview ~ 1/cos), (b) near-zero connection
        # radius blows up the 1/r^2 kernel.  Both configurations carry
        # ~zero true transport (the same cosines appear in f_b / the
        # offset geometry), so culling them trades O(tau) bias for
        # finite variance — the reference's clamp-the-tail treatment
        # (common.py clamp_mass_thres / scale_mass) applied at the
        # estimator's actual singularity.
        graze_tau = 2e-2
        r_min = 1e-3 * float(scene_det.scene_radius)
        for j in range(2, indirect_depth + 1):
            d_2b = x_b - si_j.p
            r2b = jnp.sqrt(jnp.maximum(jnp.sum(d_2b * d_2b, -1), 1e-20))
            d_2b = d_2b / r2b[:, None]
            # visibility x_j -> x_B
            off2 = 1e-4 * jnp.maximum(
                1.0, jnp.max(jnp.abs(si_j.p), -1, keepdims=True))
            sg2 = jnp.sign(jnp.sum(d_2b * si_j.n, -1, keepdims=True))
            sh2 = Ray.make(si_j.p + sg2 * off2 * si_j.n, d_2b,
                           maxt=r2b * (1.0 - 2e-3))
            occ2 = scene_det.ray_test(sh2, ok_walk, ctx_det)
            cos_view = jnp.abs(jnp.sum(d_2b * n_recv, -1))
            ok2 = (ok_walk & ~occ2 & (cos_view > graze_tau)
                   & (r2b > r_min))
            # f at x_j: wi = from the previous prefix vertex, wo =
            # toward x_B (includes the x_j-side connection cosine)
            f_2, _ = scene_det.bsdf_eval_pdf(
                si_j, si_j.to_local(d_2b), ok2)
            # f at x_B: wi = from the light, wo = toward x_j (includes
            # the x_B-side cosine)
            f_b, _ = scene_det.bsdf_eval_pdf(
                si_r, si_r.to_local(-d_2b), ok2)
            tput2 = jnp.sum(delta2 * tput_walk * f_2 * f_b
                            * le[None, :], -1) \
                / jnp.maximum(r2b * r2b, 1e-12)
            coeff_j = jnp.where(
                ok2,
                -(w_px * h_px) * tput2
                * G * dV * speed * inv_pdf * A_L * inv_oc / n_samples,
                0.0,
            )
            extras.append((coeff_j, si_j.p))
            if j < indirect_depth:
                # extend the prefix one bounce (detached BSDF sampling,
                # fresh dims per depth — PRB's replayable walk)
                u1 = rng.sample_1d(seed_b, lane,
                                   jnp.int32(DIM_B_SUB + 16 + 3 * j))
                u2 = rng.sample_2d(seed_b, lane,
                                   jnp.int32(DIM_B_SUB + 17 + 3 * j))
                bs, w_b = scene_det.bsdf_sample(si_j, u1, u2, ok_walk)
                wo_w = si_j.to_world(bs.wo)
                sgb = jnp.sign(jnp.sum(wo_w * si_j.n, -1,
                                       keepdims=True))
                nray = Ray.make(si_j.p + sgb * off2 * si_j.n, wo_w)
                ok_walk = ok_walk & (bs.pdf > 0.0)
                si_j = scene_det.ray_intersect(nray, ok_walk, ctx_det)
                ok_walk = ok_walk & si_j.is_valid() & \
                    (si_j.shape_index != light_shape)
                tput_walk = tput_walk * w_b

    lidx_d = lidx
    idx_d = idx
    # receiver triangle (for receiver-motion attachment); analytic
    # receivers (prim_index >= len(faces)) keep the detached plane
    prim_r = jnp.clip(si_r.prim_index, 0, faces.shape[0] - 1)
    fr = faces[prim_r]
    mesh_recv = si_r.prim_index < faces.shape[0]

    def S_terms(fl):
        sc = rebuild(fl)
        v_att, *_ = sc.geometry()
        xe_att = (v_att[edges.v0[idx_d]] * (1.0 - t_e[:, None])
                  + v_att[edges.v1[idx_d]] * t_e[:, None])
        lf_att = lf[lidx_d]
        y_att = (v_att[lf_att[:, 0]] * (1.0 - b0 - b1)[:, None]
                 + v_att[lf_att[:, 1]] * b0[:, None]
                 + v_att[lf_att[:, 2]] * b1[:, None])
        # receiver motion: x_B lives on the receiver's (attached)
        # plane, so its boundary velocity picks up the plane's own
        # motion (reference projective.py attaches the full boundary
        # path through every vertex).  Scale/orientation of the plane
        # normal cancel in tau, so the raw cross product suffices.
        r0 = v_att[fr[:, 0]]
        nr_att = jnp.cross(v_att[fr[:, 1]] - r0, v_att[fr[:, 2]] - r0)
        pr = jnp.where(mesh_recv[:, None], r0, p_recv)
        nr = jnp.where(mesh_recv[:, None], nr_att, n_recv)
        d_att = xe_att - y_att
        dn = jnp.sum(d_att * nr, -1)
        dn = jnp.where(jnp.abs(dn) > 1e-9, dn, 1e-9)
        tau = jnp.sum((pr - y_att) * nr, -1) / dn
        xb_att = y_att + tau[:, None] * d_att
        xb_att = jnp.nan_to_num(xb_att)

        # The m_hat projection measures IN-PLANE curve motion, but
        # x_B's velocity can leave the theta_0 receiver plane (e.g.
        # the receiver itself translating along its normal, or a
        # light/blocker moving vertically).  What the previous path
        # vertex actually sees is the boundary's apparent motion: the
        # attached x_B re-projected onto the DETACHED receiver plane
        # along the viewer ray (identity at theta_0, exact to first
        # order).  Depth-1 samples are viewed from the camera, depth-2
        # samples from x_2.
        def view_on_plane(xb, viewer):
            dv = xb - viewer
            den = jnp.sum(dv * n_recv, -1)
            den = jnp.where(jnp.abs(den) > 1e-9, den,
                            jnp.where(den >= 0, 1e-9, -1e-9))
            sview = jnp.sum((p_recv - viewer) * n_recv, -1) / den
            return viewer + sview[:, None] * dv

        xb1 = view_on_plane(xb_att, cam_p)
        terms = [coeff * jnp.sum(m_hat * xb1, -1)]
        for coeff_j, viewer_j in extras:
            xbj = view_on_plane(xb_att, viewer_j)
            terms.append(coeff_j * jnp.sum(m_hat * xbj, -1))
        return jnp.stack(terms, axis=-1)        # (N, 1 + len(extras))

    def S(fl):
        return jnp.sum(S_terms(fl))

    grads = jax.grad(S)(floats)
    if diag_tangent is not None:
        # per-sample directional derivative along a caller tangent —
        # tail diagnostics (round 5): which samples carry the gradient
        _, dt = jax.jvp(S_terms, (floats,), (diag_tangent,))
        return grads, jnp.stack([u_e, t_e, u_lf], axis=-1), dt
    if collect:
        pts = jnp.stack([u_e, t_e, u_lf], axis=-1)
        mass = jnp.abs(coeff)
        for coeff_j, _ in extras:
            mass = mass + jnp.abs(coeff_j)
        return grads, pts, mass
    return grads, None, None

# --------------------------------------------------------- integrators

@pytree
class PathProjectiveIntegrator:
    """prb_projective: PRB continuous gradients + primary silhouette
    boundary term (prb_projective.py:8)."""

    max_depth: int = static(6)
    rr_depth: int = static(5)
    sppc: int = static(0)          # 0 -> use render spp for continuous
    sppp: int = static(4096)       # boundary samples
    n_sub: int = static(4)
    guiding: str = static("grid")
    indirect: bool = static(True)  # shadow-boundary term
    sppi: int = static(16384)      # shadow-boundary samples
    # 1: light->edge->receiver->camera; 2: + one extra camera-side
    # diffuse bounce (deeper indirect visibility, projective.py:228-373)
    indirect_depth: int = static(1)
    id: str = static("prb_projective")

    def sample(self, scene, ray, lane, seed, active):
        return PathIntegrator(
            max_depth=self.max_depth, rr_depth=self.rr_depth
        ).sample(scene, ray, lane, seed, active)

    def _prb(self):
        return PRBIntegrator(max_depth=self.max_depth,
                             rr_depth=self.rr_depth)


@pytree
class DirectProjectiveIntegrator:
    """direct_projective: single-bounce variant (direct_projective.py)."""

    sppp: int = static(4096)
    n_sub: int = static(4)
    guiding: str = static("grid")
    indirect: bool = static(True)
    sppi: int = static(16384)
    id: str = static("direct_projective")

    max_depth = 2
    rr_depth = 64

    def sample(self, scene, ray, lane, seed, active):
        return PathIntegrator(max_depth=2, rr_depth=64).sample(
            scene, ray, lane, seed, active)

    def _prb(self):
        return PRBIntegrator(max_depth=2, rr_depth=64)


# ---------------------------------------------------------------- render

def _primal_image(scene, integrator, seed, spp):
    ray, weight, film_pos, lane = sample_rays(scene, jnp.uint32(seed), spp)
    active = jnp.ones((ray.o.shape[0],), bool)
    L = integrator.sample(scene, ray, lane, jnp.uint32(seed), active)
    img = scene.sensor.film.put(film_pos, L * weight, active)
    return scene.sensor.film.develop(img)


@partial(jax.custom_vjp, nondiff_argnums=(2, 4))
def prb_projective_render(scene, edges, integrator, seed=0, spp: int = 16):
    """Differentiable render whose gradient includes visibility
    discontinuities (mi.render with a projective integrator).

    ``edges``: build_silhouette_edges(scene) — topology is static, so
    the table is built once host-side and passed in (the reference's
    ProjectiveDetail init).
    """
    return _primal_image(scene, integrator, seed, spp)


def _ppr_fwd(scene, edges, integrator, seed, spp):
    return (prb_projective_render(scene, edges, integrator, seed, spp),
            (scene, edges, seed))


def _ppr_bwd(integrator, spp, res, grad_image):
    scene, edges, seed = res
    scene_det = jax.lax.stop_gradient(scene)
    seed_u = jnp.uint32(seed)
    prb = integrator._prb()

    # continuous part: standard PRB adjoint replay (prb.py)
    ray, weight, film_pos, lane = sample_rays(scene_det, seed_u, spp)
    n = ray.o.shape[0]
    active = jnp.ones((n,), bool)
    film = scene_det.sensor.film

    def splat_develop(L):
        return film.develop(film.put(film_pos, L * weight, active))

    _, vjp = jax.vjp(splat_develop, jnp.zeros((n, 3)))
    (delta_L,) = vjp(grad_image)
    L0 = prb.sample(scene_det, ray, lane, seed_u, active)
    cont = prb.sample_backward(scene, ray, lane, seed_u, delta_L, L0,
                               active)

    # boundary part: silhouette edge sampling
    bnd = primary_boundary_grads(
        scene, edges, PathIntegrator(max_depth=integrator.max_depth,
                                     rr_depth=integrator.rr_depth),
        grad_image, seed_u, n_samples=integrator.sppp,
        n_sub=integrator.n_sub, guiding=integrator.guiding,
    )

    total = [a + b for a, b in zip(cont, bnd)]

    # exact analytic-prim silhouettes (sphere contours, disk rims)
    if scene_det.scene_analytic is not None and \
            getattr(scene_det.sensor, "to_world", None) is not None:
        abnd = analytic_boundary_grads(
            scene, PathIntegrator(max_depth=integrator.max_depth,
                                  rr_depth=integrator.rr_depth),
            grad_image, seed_u,
            n_samples=max(integrator.sppp // 2, 512),
            n_sub=integrator.n_sub,
        )
        total = [a + b for a, b in zip(total, abnd)]

    # shadow (indirect-visibility) boundary, one-bounce scope: requires
    # a constant-radiance area emitter
    if integrator.indirect and len(scene_det.emitters) == 1:
        from ...models.emitters import AreaEmitter
        from ...models.textures import ConstantTexture

        e = scene_det.emitters[0]
        if isinstance(e, AreaEmitter) and \
                isinstance(e.radiance, ConstantTexture):
            ind = indirect_boundary_grads(
                scene, edges, grad_image, seed_u,
                n_samples=integrator.sppi,
                guiding=(integrator.guiding
                         if integrator.guiding in ("octree", "projective")
                         else "uniform"),
                indirect_depth=integrator.indirect_depth)
            total = [a + b for a, b in zip(total, ind)]
    _, _, cotangent = _float_partition(scene)
    edges_ct = jax.tree_util.tree_map(
        lambda x: np.zeros(jnp.shape(x), jax.dtypes.float0), edges)
    seed_ct = np.zeros(jnp.shape(res[2]), jax.dtypes.float0)
    return (cotangent(total), edges_ct, seed_ct)


prb_projective_render.defvjp(_ppr_fwd, _ppr_bwd)

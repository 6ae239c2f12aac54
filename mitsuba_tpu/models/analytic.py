"""Analytic primitives: exact sphere / disk / cylinder shapes.

Reference: src/shapes/sphere.cpp (ray_intersect_preliminary :560,
compute_surface_interaction :614 with the FollowShape/DetachShape
branches :640-675, sample_direction cone sampling :236-287,
pdf_direction :311), src/shapes/disk.cpp, src/shapes/cylinder.cpp.

The reference intersects these shapes analytically (exact hit points,
exact normals/UVs, exact silhouettes); round 1 only had tessellated
approximations (models/shapes.py), which bias both the primal render
and boundary gradients.  TPU design:

- All analytic prims of a scene live in ONE batched pytree
  (``AnalyticShapes``): per-type parameter arrays of static shape
  (S,...) / (D,...) / (C,...).  Intersection is a dense (N, K) sweep
  per type — K is tiny (a handful of prims), so this is perfectly
  regular VPU work with no divergence, and the closest-hit reduce is a
  plain ``min``/``argmin``.  No per-prim dispatch in the hot loop.
- Traversal is detached; the differentiable surface interaction is
  re-derived afterwards from the closed-form hit equations
  (``compute_si``), exactly mirroring the mesh path's detached-
  traversal + attached-rebuild split (ops/intersect.py).  The three
  RayFlags differentiability modes are reproduced:

  * ``attach``: t re-solved differentiably from the quadratic/plane
    equation (root chosen nearest the detached t) — si.p slides along
    the fixed ray to stay on the moving surface.
  * ``follow_shape``: the *local parameterization* (unit direction on
    the sphere, (x, y) disk coords, (phi, z) cylinder coords) is
    detached and the point rebuilt from attached shape parameters —
    si.p rigidly follows the shape (sphere.cpp:640).
  * ``detach_shape``: shape parameters detached — no shape gradient.

- Scene integration follows the SDF "virtual shape slot" pattern
  (models/scene.py:_merge_sdf_si): analytic prims occupy shape slots
  after the meshes (+ SDF), and their SI is closest-hit merged after
  the triangle query.  Mesh BVH / Pallas kernels stay untouched.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core import warp
from ..core.math import (Frame, coordinate_system, cross, dot, normalize,
                         safe_sqrt, sqr)
from ..core.records import PositionSample, SurfaceInteraction

_TWO_PI = 2.0 * np.pi


def _sg(x):
    return jax.lax.stop_gradient(x)


@pytree
class AnalyticShapes:
    """Batched analytic primitives.  Global prim order: spheres,
    then disks, then cylinders (static offsets)."""

    # spheres (uniform scale only, like the reference sphere.cpp:743)
    sp_center: jnp.ndarray    # (S, 3)
    sp_radius: jnp.ndarray    # (S,)
    # disks: center + (possibly scaled) in-plane axes + unit normal
    dk_center: jnp.ndarray    # (D, 3)
    dk_su: jnp.ndarray        # (D, 3) scaled u axis (ellipse support)
    dk_sv: jnp.ndarray        # (D, 3) scaled v axis
    dk_n: jnp.ndarray         # (D, 3) unit normal
    # cylinders: base point + unit axis + length + radius
    cy_p0: jnp.ndarray        # (C, 3)
    cy_axis: jnp.ndarray      # (C, 3) unit
    cy_len: jnp.ndarray       # (C,)
    cy_radius: jnp.ndarray    # (C,)
    # curve segments: swept spheres (rounded cones) from (pa, ra) to
    # (pb, rb) — the exact tube cross-section of linearcurve.cpp /
    # bsplinecurve.cpp; cubic splines are flattened to polyline
    # CENTERLINES at load (cross-section and normals stay exact, only
    # the centerline is piecewise-linear — the TPU-shaped trade
    # replacing the reference's per-ray Newton solve on the cubic,
    # bsplinecurve.cpp:1310)
    cv_pa: jnp.ndarray        # (K, 3)
    cv_pb: jnp.ndarray        # (K, 3)
    cv_ra: jnp.ndarray        # (K,)
    cv_rb: jnp.ndarray        # (K,)
    cv_u0: jnp.ndarray        # (K,) global curve parameter at pa
    cv_u1: jnp.ndarray        # (K,) at pb
    # exact cubic payload (round 4, bsplinecurve.cpp exact swept-sphere
    # intersection): per curve prim, the PARENT uniform cubic B-spline
    # segment's 4 control points/radii, this flattened subsegment's
    # parameter window [w0, w1] within the parent's s in [0, 1], and a
    # candidate-tube radius inflation bounding the flattening error.
    # Linear prims carry zeros (cv_cubic = 0) and keep the closed-form
    # rounded-cone path; cubic prims use the flattened tube only as a
    # Newton INITIALIZER and re-solve the true canal surface.
    cv_cp: jnp.ndarray = None   # (K, 4, 3)
    cv_cr: jnp.ndarray = None   # (K, 4)
    cv_w0: jnp.ndarray = None   # (K,)
    cv_w1: jnp.ndarray = None   # (K,)
    cv_pad: jnp.ndarray = None  # (K,)
    cv_cubic: jnp.ndarray = None  # (K,) f32 0/1
    # static per-prim metadata, in global prim order (length S+D+C+K)
    bsdf_index: tuple = static(())
    emitter_index: tuple = static(())
    flip_normals: tuple = static(())
    ids: tuple = static(())
    any_cubic: bool = static(False)

    # ------------------------------------------------------------ counts

    @property
    def n_spheres(self):
        return int(self.sp_center.shape[0])

    @property
    def n_disks(self):
        return int(self.dk_center.shape[0])

    @property
    def n_cylinders(self):
        return int(self.cy_p0.shape[0])

    @property
    def n_curves(self):
        return int(self.cv_pa.shape[0])

    @property
    def n_prims(self):
        return (self.n_spheres + self.n_disks + self.n_cylinders
                + self.n_curves)

    def _flip_arr(self):
        return jnp.asarray(np.asarray(self.flip_normals, np.float32))

    # --------------------------------------------------- host-side bounds

    def bound_points(self):
        """Conservative host-side corner points for the scene bbox
        (make_scene bounding-sphere computation)."""
        pts = []
        if self.n_spheres:
            c = np.asarray(_sg(self.sp_center))
            r = np.asarray(_sg(self.sp_radius))[:, None]
            pts += [c - r, c + r]
        if self.n_disks:
            c = np.asarray(_sg(self.dk_center))
            e = (np.abs(np.asarray(_sg(self.dk_su)))
                 + np.abs(np.asarray(_sg(self.dk_sv))))
            pts += [c - e, c + e]
        if self.n_cylinders:
            p0 = np.asarray(_sg(self.cy_p0))
            ax = np.asarray(_sg(self.cy_axis))
            ln = np.asarray(_sg(self.cy_len))[:, None]
            r = np.asarray(_sg(self.cy_radius))[:, None]
            pts += [p0 - r, p0 + r, p0 + ax * ln - r, p0 + ax * ln + r]
        if self.n_curves:
            pa = np.asarray(_sg(self.cv_pa))
            pb = np.asarray(_sg(self.cv_pb))
            ra = np.asarray(_sg(self.cv_ra))[:, None]
            rb = np.asarray(_sg(self.cv_rb))[:, None]
            pts += [pa - ra, pa + ra, pb - rb, pb + rb]
        return np.concatenate(pts) if pts else np.zeros((0, 3), np.float32)

    # -------------------------------------------------- detached traversal

    def intersect(self, o, d, maxt, active):
        """Detached closest-hit over all analytic prims.

        Returns ``(t (N,), prim (N,) int32)`` — t = inf on miss; prim is
        the *global* analytic prim index.  Caller passes detached rays
        (scene.ray_intersect detaches traversal, scene.py:151).
        """
        n = o.shape[0]
        best_t = jnp.full((n,), jnp.inf)
        best_p = jnp.zeros((n,), jnp.int32)

        def consider(t_k, prim_ids):
            nonlocal best_t, best_p
            # t_k: (N, K) candidate distances (inf = invalid)
            t_min = jnp.min(t_k, axis=1)
            k_min = jnp.argmin(t_k, axis=1).astype(jnp.int32)
            closer = t_min < best_t
            best_t = jnp.where(closer, t_min, best_t)
            best_p = jnp.where(closer, prim_ids[k_min], best_p)

        valid_lane = active[:, None]
        if self.n_spheres:
            t_near, t_far, _ = _sphere_roots(
                o[:, None, :], d[:, None, :],
                self.sp_center[None], self.sp_radius[None])
            tk = _first_valid(t_near, t_far, maxt[:, None], valid_lane)
            consider(tk, jnp.arange(self.n_spheres, dtype=jnp.int32))
        if self.n_disks:
            t, x, y = _disk_hit(
                o[:, None, :], d[:, None, :],
                self.dk_center[None], self.dk_su[None], self.dk_sv[None],
                self.dk_n[None])
            ok = (valid_lane & (t > 0.0) & (t <= maxt[:, None])
                  & (x * x + y * y <= 1.0))
            consider(jnp.where(ok, t, jnp.inf),
                     self.n_spheres
                     + jnp.arange(self.n_disks, dtype=jnp.int32))
        if self.n_cylinders:
            t0, t1, z0, z1 = _cylinder_roots(
                o[:, None, :], d[:, None, :],
                self.cy_p0[None], self.cy_axis[None],
                self.cy_radius[None])
            ln = self.cy_len[None]
            ok0 = (z0 >= 0.0) & (z0 <= ln)
            ok1 = (z1 >= 0.0) & (z1 <= ln)
            tk = _first_valid(jnp.where(ok0, t0, jnp.inf),
                              jnp.where(ok1, t1, jnp.inf),
                              maxt[:, None], valid_lane)
            consider(tk, self.n_spheres + self.n_disks
                     + jnp.arange(self.n_cylinders, dtype=jnp.int32))
        if self.n_curves:
            # cubic prims inflate the flattened tube by the flattening
            # bound so the candidate pass can't miss a bulge; the
            # candidate is then REPLACED by the exact Newton solve
            pad = (self.cv_pad[None] if self.any_cubic
                   else jnp.zeros((1, self.n_curves)))
            tk = _rounded_cone_first(
                o[:, None, :], d[:, None, :],
                self.cv_pa[None], self.cv_pb[None],
                self.cv_ra[None] + pad, self.cv_rb[None] + pad,
                maxt[:, None], valid_lane)
            if self.any_cubic:
                t_cub = _cubic_first(
                    o[:, None, :], d[:, None, :],
                    self.cv_cp[None], self.cv_cr[None],
                    self.cv_w0[None], self.cv_w1[None],
                    maxt[:, None], valid_lane, tk)
                tk = jnp.where(self.cv_cubic[None] > 0.5, t_cub, tk)
            consider(tk, self.n_spheres + self.n_disks
                     + self.n_cylinders
                     + jnp.arange(self.n_curves, dtype=jnp.int32))
        return best_t, best_p

    def any_hit(self, o, d, maxt, active):
        t, _ = self.intersect(o, d, maxt, active)
        return jnp.isfinite(t) & active

    # --------------------------------------------- differentiable rebuild

    def compute_si(self, ray, t_det, prim, valid, mode="attach",
                   shape_slot_base=0):
        """Differentiable SurfaceInteraction from a detached hit
        (sphere.cpp:614 compute_surface_interaction and the disk/
        cylinder analogues).  ``mode`` ∈ attach | follow_shape |
        detach_shape (interaction.h:19-68); see module docstring."""
        assert mode in ("attach", "follow_shape", "detach_shape")
        n = ray.o.shape[0]
        t = jnp.where(valid, t_det, 1.0)
        p_det = _sg(ray.o) + _sg(ray.d) * t[:, None]
        flip = self._flip_arr()[jnp.clip(prim, 0, self.n_prims - 1)]
        sign = 1.0 - 2.0 * flip          # +1 or -1

        out = None

        def merge(mask, fields):
            nonlocal out
            if out is None:
                out = fields
            else:
                out = tuple(
                    jnp.where(
                        mask.reshape(mask.shape + (1,) * (a.ndim - 1)), a, b)
                    for a, b in zip(fields, out))

        if self.n_spheres:
            j = jnp.clip(prim, 0, self.n_spheres - 1)
            m = valid & (prim < self.n_spheres)
            merge(m, self._sphere_si(ray, t, p_det, j, mode))
        if self.n_disks:
            j = jnp.clip(prim - self.n_spheres, 0, self.n_disks - 1)
            m = valid & (prim >= self.n_spheres) \
                & (prim < self.n_spheres + self.n_disks)
            merge(m, self._disk_si(ray, t, p_det, j, mode))
        if self.n_cylinders:
            base = self.n_spheres + self.n_disks
            j = jnp.clip(prim - base, 0, self.n_cylinders - 1)
            m = valid & (prim >= base) \
                & (prim < base + self.n_cylinders)
            merge(m, self._cylinder_si(ray, t, p_det, j, mode))
        if self.n_curves:
            base = self.n_spheres + self.n_disks + self.n_cylinders
            j = jnp.clip(prim - base, 0, self.n_curves - 1)
            m = valid & (prim >= base)
            merge(m, self._curve_si(ray, t, p_det, j, mode))

        t_a, p, ng, uv = out
        ng = ng * sign[:, None]
        s, tt, _ = Frame.from_normal(ng)
        # prefer the analytic dp_du tangent where well-defined: rebuild
        # the frame so normal-mapping / anisotropy conventions match the
        # reference's dp_du frames (sphere.cpp:685-697)
        wi = Frame.to_local((s, tt, ng), -ray.d)
        return SurfaceInteraction(
            t=jnp.where(valid, t_a, jnp.inf),
            p=p, n=ng, sh_n=ng, sh_s=s, sh_t=tt, uv=uv, wi=wi,
            shape_index=jnp.where(
                valid, shape_slot_base + prim, -1).astype(jnp.int32),
            prim_index=jnp.zeros((n,), jnp.int32),
            wavelengths=ray.wavelengths,
            time=ray.time,
        )

    # ---- per-type SI kernels: return (t, p, n_geo, uv) ------------------

    def _sphere_si(self, ray, t_det, p_det, j, mode):
        c = self.sp_center[j]
        r = self.sp_radius[j]
        if mode == "detach_shape":
            c, r = _sg(c), _sg(r)
        if mode == "follow_shape":
            # rigid attachment: local unit direction detached
            dir0 = _sg(normalize(p_det - _sg(c)))
            p = c + dir0 * r[:, None]
            t = _t_from_point(ray, p)
            nloc = dir0
        else:
            t_near, t_far, _ = _sphere_roots(ray.o, ray.d, c, r)
            t = jnp.where(
                jnp.abs(t_near - t_det) <= jnp.abs(t_far - t_det),
                t_near, t_far)
            t = jnp.where(jnp.isfinite(t), t, t_det)
            p = ray.o + ray.d * t[:, None]
            nloc = (p - c) / jnp.maximum(r, 1e-20)[:, None]
        ng = normalize(nloc)
        # reference UV convention (sphere.cpp:677-684): object-space
        # spherical coords, uv = (phi/2pi, theta/pi)
        uv_src = _sg(nloc) if mode == "follow_shape" else nloc
        theta = jnp.arccos(jnp.clip(uv_src[:, 2], -1.0, 1.0))
        phi = jnp.arctan2(uv_src[:, 1], uv_src[:, 0])
        phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
        uv = jnp.stack([phi / _TWO_PI, theta / jnp.pi], axis=-1)
        return t, p, ng, uv

    def _disk_si(self, ray, t_det, p_det, j, mode):
        c = self.dk_center[j]
        su = self.dk_su[j]
        sv = self.dk_sv[j]
        nrm = self.dk_n[j]
        if mode == "detach_shape":
            c, su, sv, nrm = _sg(c), _sg(su), _sg(sv), _sg(nrm)
        if mode == "follow_shape":
            xy = _sg(_disk_local(p_det, _sg(c), _sg(su), _sg(sv)))
            p = c + su * xy[:, 0:1] + sv * xy[:, 1:2]
            t = _t_from_point(ray, p)
            x, y = xy[:, 0], xy[:, 1]
        else:
            denom = dot(ray.d, nrm)
            safe = jnp.abs(denom) > 1e-12
            t = jnp.where(safe, dot(c - ray.o, nrm)
                          / jnp.where(safe, denom, 1.0), t_det)
            p = ray.o + ray.d * t[:, None]
            xy = _disk_local(p, c, su, sv)
            x, y = xy[:, 0], xy[:, 1]
        # reference UV convention (disk.cpp:189): uv = (r, phi/2pi)
        r_loc = safe_sqrt(x * x + y * y)
        phi = jnp.arctan2(y, x)
        phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
        uv = jnp.stack([r_loc, phi / _TWO_PI], axis=-1)
        return t, p, normalize(jnp.broadcast_to(nrm, p.shape)), uv

    def _cylinder_si(self, ray, t_det, p_det, j, mode):
        p0 = self.cy_p0[j]
        ax = self.cy_axis[j]
        ln = self.cy_len[j]
        r = self.cy_radius[j]
        if mode == "detach_shape":
            p0, ax, ln, r = _sg(p0), _sg(ax), _sg(ln), _sg(r)
        if mode == "follow_shape":
            rel0 = p_det - _sg(p0)
            z0 = dot(rel0, _sg(ax))
            zfrac = _sg(z0 / jnp.maximum(_sg(ln), 1e-20))
            rad0 = _sg(normalize(rel0 - _sg(ax) * z0[:, None]))
            p = p0 + ax * (zfrac * ln)[:, None] + rad0 * r[:, None]
            t = _t_from_point(ray, p)
            z = zfrac * ln
            radial = rad0 * r[:, None]
        else:
            t0, t1, _, _ = _cylinder_roots(ray.o, ray.d, p0, ax, r)
            t = jnp.where(jnp.abs(t0 - t_det) <= jnp.abs(t1 - t_det),
                          t0, t1)
            t = jnp.where(jnp.isfinite(t), t, t_det)
            p = ray.o + ray.d * t[:, None]
            rel = p - p0
            z = dot(rel, ax)
            radial = rel - ax * z[:, None]
        ng = normalize(radial)
        # uv = (phi/2pi, z/length) (cylinder.cpp parameterization)
        su, sv = coordinate_system(_sg(ax))
        phi = jnp.arctan2(dot(radial, sv), dot(radial, su))
        phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
        uv = jnp.stack(
            [phi / _TWO_PI, z / jnp.maximum(ln, 1e-20)], axis=-1)
        return t, p, ng, uv

    def _curve_si(self, ray, t_det, p_det, j, mode):
        """Swept-sphere (rounded cone) segment SI: the hit classifies
        by its detached axial coordinate into cap-a / side / cap-b; the
        attached position/normal re-derive differentiably from the
        segment endpoints and radii (bsplinecurve.cpp:1310-style exact
        tube normals; the reference's curve v spans the cross-section
        circle, its u the spline parameter)."""
        pa = self.cv_pa[j]
        pb = self.cv_pb[j]
        ra = self.cv_ra[j]
        rb = self.cv_rb[j]
        u0 = self.cv_u0[j]
        u1 = self.cv_u1[j]
        if mode == "detach_shape":
            pa, pb, ra, rb = _sg(pa), _sg(pb), _sg(ra), _sg(rb)

        ba = pb - pa
        m0 = dot(ba, ba)
        rr = ra - rb
        d2 = jnp.maximum(m0 - rr * rr, 1e-20)

        # detached classification: axial coordinate of the tangency
        # point (y in [0, d2] <-> side; outside <-> sphere caps)
        oa_det = p_det - _sg(pa)
        y_det = (dot(oa_det, _sg(ba))
                 - _sg(ra) * _sg(rr))
        s_loc = jnp.clip(_sg(y_det / d2), 0.0, 1.0)

        if mode == "follow_shape":
            # rigid reattachment: detached local params, attached frame
            c0 = _sg(pa) + _sg(ba) * s_loc[:, None]
            rad0 = _sg(normalize(p_det - c0))
            c = pa + ba * s_loc[:, None]
            r = ra + (rb - ra) * s_loc
            p = c + rad0 * r[:, None]
            t = _t_from_point(ray, p)
            ng = rad0
        else:
            # attached re-solve: nearest quadratic root to the detached t
            t0, t1, y_at = _rounded_cone_roots(
                ray.o, ray.d, pa, pb, ra, rb)
            side = (y_det > 0.0) & (y_det < d2)
            t_side = jnp.where(
                jnp.abs(t0 - t_det) <= jnp.abs(t1 - t_det), t0, t1)
            # cap spheres
            cap_c = jnp.where((y_det <= 0.0)[:, None], pa, pb)
            cap_r = jnp.where(y_det <= 0.0, ra, rb)
            tc0, tc1, _ = _sphere_roots(ray.o, ray.d, cap_c, cap_r)
            t_cap = jnp.where(
                jnp.abs(tc0 - t_det) <= jnp.abs(tc1 - t_det), tc0, tc1)
            t = jnp.where(side, t_side, t_cap)
            t = jnp.where(jnp.isfinite(t), t, t_det)
            p = ray.o + ray.d * t[:, None]
            oa = p - pa
            y = dot(oa, ba) - ra * rr
            n_side = d2[:, None] * oa - ba * y[:, None]
            n_cap = p - cap_c
            ng = normalize(jnp.where(side[:, None], n_side, n_cap))

        # uv: u = global curve parameter, v = azimuth about the segment
        su, sv = coordinate_system(_sg(normalize(ba)))
        rel = p - (pa + ba * s_loc[:, None])
        phi = jnp.arctan2(dot(rel, sv), dot(rel, su))
        phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
        u_glob = u0 + (u1 - u0) * s_loc
        uv = jnp.stack([u_glob, phi / _TWO_PI], axis=-1)

        if self.any_cubic:
            tc, pc, ngc, uvc = self._curve_si_cubic(ray, t_det, p_det,
                                                    j, mode)
            is_cub = (self.cv_cubic[j] > 0.5)
            m3 = is_cub[:, None]
            t = jnp.where(is_cub, tc, t)
            p = jnp.where(m3, pc, p)
            ng = jnp.where(m3, ngc, ng)
            uv = jnp.where(m3, uvc, uv)
        return t, p, ng, uv

    def _curve_si_cubic(self, ray, t_det, p_det, j, mode):
        """Exact cubic swept-sphere SI (bsplinecurve.cpp
        compute_surface_interaction): the envelope foot s* is re-solved
        by a detached Newton from the hit, the normal is the touching
        sphere's (p - c(s*)) / r(s*) — exact including the taper tilt —
        and the attachment follows the asphere pattern: one implicit-
        function correction of t against the ATTACHED surface."""
        cp = self.cv_cp[j]
        cr = self.cv_cr[j]
        w0 = self.cv_w0[j]
        w1 = self.cv_w1[j]
        u0 = self.cv_u0[j]
        u1 = self.cv_u1[j]
        if mode == "detach_shape":
            cp, cr = _sg(cp), _sg(cr)
        cp_d, cr_d = _sg(cp), _sg(cr)

        # detached envelope foot from the detached hit
        pa = _bspline_eval(cp_d, cr_d, w0)[0]
        pb = _bspline_eval(cp_d, cr_d, w1)[0]
        ba = pb - pa
        m0 = jnp.maximum(jnp.sum(ba * ba, -1), 1e-20)
        frac = jnp.clip(jnp.sum((p_det - pa) * ba, -1) / m0, 0.0, 1.0)
        s0 = w0 + frac * (w1 - w0)
        o_d, d_d = _sg(ray.o), _sg(ray.d)
        t_s, s_s, F1_s, scale = _cubic_newton(o_d, d_d, cp_d, cr_d,
                                              _sg(t_det), s0)
        s_cl = jnp.clip(s_s, 0.0, 1.0)
        side = ((jnp.abs(F1_s) <= 1e-3 * scale)
                & (s_s > 1e-3) & (s_s < 1.0 - 1e-3)
                & (jnp.abs(t_s - t_det) < 0.5 * jnp.abs(t_det) + 1e-3))
        # cap classification: nearer parent end of the foot
        s_cap = jnp.where(s_cl < 0.5, 0.0, 1.0)
        s_det = jnp.where(side, s_cl, s_cap)

        c_att, c1_att, _, r_att, _, _ = _bspline_eval(cp, cr, s_det)
        if mode == "follow_shape":
            c_det0 = _bspline_eval(cp_d, cr_d, s_det)[0]
            rad0 = _sg(normalize(p_det - c_det0))
            p = c_att + rad0 * r_att[:, None]
            t = _t_from_point(ray, p)
            ng = rad0
        else:
            # side: implicit-function t correction against the attached
            # canal surface (dF1/ds = 0 at the envelope, so correcting
            # along t alone is exact to first order)
            q_det = p_det - _sg(c_att)
            c_att2 = _bspline_eval(cp, cr, _sg(s_det))[0]
            r_att2 = _bspline_eval(cp, cr, _sg(s_det))[3]
            q_att = ray.o + ray.d * _sg(t_s)[:, None] - c_att2
            F1_att = jnp.sum(q_att * q_att, -1) - r_att2 * r_att2
            J11 = 2.0 * jnp.sum(_sg(q_att) * ray.d, -1)
            J11 = jnp.where(jnp.abs(J11) > 1e-9, J11,
                            jnp.where(J11 >= 0, 1e-9, -1e-9))
            t_side = _sg(t_s) - F1_att / J11
            # caps: attached sphere root nearest the detached t
            cap_c = c_att2
            cap_r = r_att2
            tc0, tc1, _ = _sphere_roots(ray.o, ray.d, cap_c, cap_r)
            t_cap = jnp.where(
                jnp.abs(tc0 - t_det) <= jnp.abs(tc1 - t_det), tc0, tc1)
            t = jnp.where(side, t_side, t_cap)
            t = jnp.where(jnp.isfinite(t), t, t_det)
            p = ray.o + ray.d * t[:, None]
            ng = normalize(p - c_att2)

        # uv: u maps the parent parameter window to the global curve
        # parameter; v = azimuth about the (detached) tangent
        denom_w = jnp.maximum(w1 - w0, 1e-9)
        u_glob = u0 + (u1 - u0) * (s_det - w0) / denom_w
        tang = _sg(normalize(c1_att))
        su, sv = coordinate_system(tang)
        rel = p - c_att
        phi = jnp.arctan2(dot(rel, sv), dot(rel, su))
        phi = jnp.where(phi < 0.0, phi + _TWO_PI, phi)
        uv = jnp.stack([u_glob, phi / _TWO_PI], axis=-1)
        return t, p, ng, uv

    # ------------------------------------------------------ emitter geom

    def sphere_geom(self, prim: int):
        """Mesh-protocol adapter for an emitter-carrying sphere prim
        (scene._emitter_geom)."""
        assert prim < self.n_spheres, \
            "only analytic spheres can carry area emitters"
        return SphereGeom(center=self.sp_center[prim],
                          radius=self.sp_radius[prim])


# ---------------------------------------------------------------- helpers


def _sphere_roots(o, d, c, r):
    """Both roots of |o + t d - c| = r.  Handles non-unit d (sensor rays
    are not normalized exactly).  Returns (t_near, t_far, disc>=0);
    invalid roots are NOT masked."""
    L = c - o
    a = jnp.sum(d * d, axis=-1)
    b = jnp.sum(L * d, axis=-1)
    disc = sqr(b) - a * (jnp.sum(L * L, axis=-1) - sqr(r))
    sq = safe_sqrt(disc)
    ok = disc >= 0.0
    inv_a = 1.0 / jnp.maximum(a, 1e-20)
    inf = jnp.float32(jnp.inf)
    return (jnp.where(ok, (b - sq) * inv_a, inf),
            jnp.where(ok, (b + sq) * inv_a, inf), ok)


def _cylinder_roots(o, d, p0, ax, r):
    """Roots of the infinite-cylinder quadratic + axial coordinates.
    Returns (t0, t1, z0, z1); axis-parallel rays yield inf roots."""
    rel = o - p0
    doa = jnp.sum(d * ax, axis=-1)
    ooa = jnp.sum(rel * ax, axis=-1)
    d_perp = d - ax * doa[..., None]
    o_perp = rel - ax * ooa[..., None]
    a = jnp.sum(d_perp * d_perp, axis=-1)
    b = 2.0 * jnp.sum(o_perp * d_perp, axis=-1)
    cc = jnp.sum(o_perp * o_perp, axis=-1) - sqr(r)
    disc = sqr(b) - 4.0 * a * cc
    ok = (disc >= 0.0) & (a > 1e-12)
    sq = safe_sqrt(disc)
    inv2a = 1.0 / jnp.maximum(2.0 * a, 1e-12)
    t0 = jnp.where(ok, (-b - sq) * inv2a, jnp.inf)
    t1 = jnp.where(ok, (-b + sq) * inv2a, jnp.inf)
    z0 = ooa + jnp.where(jnp.isfinite(t0), t0, 0.0) * doa
    z1 = ooa + jnp.where(jnp.isfinite(t1), t1, 0.0) * doa
    return t0, t1, z0, z1


def _rounded_cone_roots(o, d, pa, pb, ra, rb):
    """Both roots of the swept-sphere SIDE surface between (pa, ra) and
    (pb, rb), plus the axial tangency coordinate helper pieces.  The
    quadratic follows the classic rounded-cone formulation (the cone
    tangent to both end spheres): with ba = pb-pa, rr = ra-rb,
    d2 = |ba|^2 - rr^2,

      k2 t^2 + 2 k1 t + k0 = 0,
      k2 = d2 - (ba.d)^2 / ... (non-unit-d safe: all terms explicit)

    Returns (t0, t1, y(t)=axial coord fn pieces are recomputed by the
    caller); roots are NOT validity-masked (mirrors _sphere_roots)."""
    ba = pb - pa
    oa = o - pa
    rr = ra - rb
    m0 = dot(ba, ba)
    m1 = dot(ba, oa)
    m2 = dot(ba, d)
    m3 = dot(oa, d)
    m5 = dot(oa, oa)
    md = dot(d, d)                      # sensor rays may be non-unit
    d2 = jnp.maximum(m0 - rr * rr, 1e-20)
    k2 = d2 * md - m2 * m2
    k1 = d2 * m3 - m1 * m2 + m2 * rr * ra
    k0 = d2 * m5 - m1 * m1 + 2.0 * m1 * rr * ra - m0 * ra * ra
    disc = k1 * k1 - k0 * k2
    ok = (disc >= 0.0) & (jnp.abs(k2) > 1e-20)
    sq = safe_sqrt(jnp.maximum(disc, 0.0))
    inv = 1.0 / jnp.where(ok, k2, 1.0)
    t0 = jnp.where(ok, (-k1 - sq) * inv, jnp.inf)
    t1 = jnp.where(ok, (-k1 + sq) * inv, jnp.inf)
    y0 = m1 - ra * rr + t0 * m2
    y1 = m1 - ra * rr + t1 * m2
    return t0, t1, (y0, y1, d2)


def _rounded_cone_first(o, d, pa, pb, ra, rb, maxt, active):
    """First valid hit of the full rounded cone (side + both sphere
    caps); returns (N, K) candidate t with inf for misses.

    Cap-sphere roots are masked to their EXPOSED cap region (the same
    axial functional y(t) that windows the side surface: y <= 0 on the
    pa cap, y >= d2 on the pb cap) — without the mask, rays starting
    inside the tube (dielectric transmission, camera inside a curve)
    would hit interior sphere surface before the true exit point."""
    ba = pb - pa
    rr = ra - rb
    m1 = dot(ba, o - pa)
    m2 = dot(ba, d)
    yb = m1 - ra * rr          # y(t) = yb + t*m2 (matches side coords)
    t0, t1, (y0, y1, d2) = _rounded_cone_roots(o, d, pa, pb, ra, rb)
    ok0 = (y0 > 0.0) & (y0 < d2)
    ok1 = (y1 > 0.0) & (y1 < d2)
    cand = _first_valid(jnp.where(ok0, t0, jnp.inf),
                        jnp.where(ok1, t1, jnp.inf), maxt, active)

    def cap(tc0, tc1, lo_cap):
        yc0 = yb + tc0 * m2
        yc1 = yb + tc1 * m2
        in0 = (yc0 <= 0.0) if lo_cap else (yc0 >= d2)
        in1 = (yc1 <= 0.0) if lo_cap else (yc1 >= d2)
        return (jnp.where(in0, tc0, jnp.inf),
                jnp.where(in1, tc1, jnp.inf))

    ta0, ta1, _ = _sphere_roots(o, d, pa, ra)
    ca = _first_valid(*cap(ta0, ta1, True), maxt, active)
    tb0, tb1, _ = _sphere_roots(o, d, pb, rb)
    cb = _first_valid(*cap(tb0, tb1, False), maxt, active)
    return jnp.minimum(cand, jnp.minimum(ca, cb))


def _bspline_eval(cp, cr, s):
    """Uniform cubic B-spline segment evaluation with first/second
    derivatives (basis matches shapes.bspline_centerline, i.e. the
    reference's bsplinecurve.cpp basis).  ``cp`` (..., 4, 3), ``cr``
    (..., 4), ``s`` (...,) -> (c, c', c'', r, r', r'')."""
    s2 = s * s
    s3 = s2 * s
    w = jnp.stack([
        (1.0 - 3.0 * s + 3.0 * s2 - s3) / 6.0,
        (3.0 * s3 - 6.0 * s2 + 4.0) / 6.0,
        (-3.0 * s3 + 3.0 * s2 + 3.0 * s + 1.0) / 6.0,
        s3 / 6.0,
    ], axis=-1)
    dw = jnp.stack([
        (-3.0 + 6.0 * s - 3.0 * s2) / 6.0,
        (9.0 * s2 - 12.0 * s) / 6.0,
        (-9.0 * s2 + 6.0 * s + 3.0) / 6.0,
        3.0 * s2 / 6.0,
    ], axis=-1)
    ddw = jnp.stack([
        (6.0 - 6.0 * s) / 6.0,
        (18.0 * s - 12.0) / 6.0,
        (-18.0 * s + 6.0) / 6.0,
        6.0 * s / 6.0,
    ], axis=-1)
    c = jnp.sum(w[..., None] * cp, axis=-2)
    c1 = jnp.sum(dw[..., None] * cp, axis=-2)
    c2 = jnp.sum(ddw[..., None] * cp, axis=-2)
    r = jnp.sum(w * cr, axis=-1)
    r1 = jnp.sum(dw * cr, axis=-1)
    r2 = jnp.sum(ddw * cr, axis=-1)
    return c, c1, c2, r, r1, r2


_CUBIC_ITERS = 10


def _cubic_newton(o, d, cp, cr, t0, s0, iters=_CUBIC_ITERS):
    """2D Newton on the canal-surface conditions of the swept sphere
    along a cubic B-spline segment (bsplinecurve.cpp's per-ray
    iterative solve, vectorized over all candidates):

        F1(t, s) = |o + t d - c(s)|^2 - r(s)^2       (on the sphere)
        F2(t, s) = (o + t d - c(s)) . c'(s) + r r'   (envelope foot)

    Note dF1/ds = -2 F2 exactly, so near the solution the system is
    triangular and converges quadratically.  Returns (t, s, F1, scale)
    — the caller masks by |F1| <= tol * scale and the s/t ranges."""
    t, s = t0, s0

    def body(_, ts):
        t, s = ts
        c, c1, c2, r, r1, r2 = _bspline_eval(cp, cr, s)
        q = o + t[..., None] * d - c
        F1 = jnp.sum(q * q, -1) - r * r
        F2 = jnp.sum(q * c1, -1) + r * r1
        J11 = 2.0 * jnp.sum(q * d, -1)
        J12 = -2.0 * F2
        J21 = jnp.sum(d * c1, -1)
        J22 = (-jnp.sum(c1 * c1, -1) + jnp.sum(q * c2, -1)
               + r1 * r1 + r * r2)
        det = J11 * J22 - J12 * J21
        inv = jnp.where(jnp.abs(det) > 1e-20,
                        1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0),
                        0.0)
        dt = -(F1 * J22 - J12 * F2) * inv
        ds = -(J11 * F2 - J21 * F1) * inv
        # damped steps keep divergent candidates from flying off
        ds = jnp.clip(ds, -0.25, 0.25)
        r_sc = jnp.maximum(r, 1e-6)
        dt = jnp.clip(dt, -4.0 * r_sc, 4.0 * r_sc)
        return t + dt, jnp.clip(s + ds, -0.25, 1.25)

    t, s = jax.lax.fori_loop(0, iters, body, (t, s))
    c, c1, _, r, r1, _ = _bspline_eval(cp, cr, s)
    q = o + t[..., None] * d - c
    F1 = jnp.sum(q * q, -1) - r * r
    scale = jnp.maximum(r * r, 1e-10)
    return t, s, F1, scale


def _cubic_first(o, d, cp, cr, w0, w1, maxt, active, t_init):
    """First valid exact-cubic hit per (ray, subsegment) candidate:
    Newton-refined side surface + the parent spline's endpoint cap
    spheres (only exposed caps on the w0==0 / w1==1 subsegments).
    ``t_init`` is the inflated flattened-tube candidate (inf = no
    candidate; those lanes still run but are masked out)."""
    has = jnp.isfinite(t_init) & active
    t0 = jnp.where(has, t_init, 1.0)
    s0 = jnp.clip(0.5 * (w0 + w1), 0.0, 1.0)
    # initialize s from the linear candidate's axial fraction
    pa = _bspline_eval(cp, cr, w0)[0]
    pb = _bspline_eval(cp, cr, w1)[0]
    ba = pb - pa
    m0 = jnp.maximum(jnp.sum(ba * ba, -1), 1e-20)
    ph = o + t0[..., None] * d
    frac = jnp.clip(jnp.sum((ph - pa) * ba, -1) / m0, 0.0, 1.0)
    s0 = jnp.where(has, w0 + frac * (w1 - w0), s0)

    t, s, F1, scale = _cubic_newton(o, d, cp, cr, t0, s0)
    ok = (has & (jnp.abs(F1) <= 1e-3 * scale)
          & (s >= -1e-3) & (s <= 1.0 + 1e-3)
          & (t > 0.0) & (t <= maxt))
    t_side = jnp.where(ok, t, jnp.inf)

    # endpoint cap spheres (the reference curve "is terminated by a
    # spherical endcap"): exposed region = beyond the envelope foot
    def cap(at_s, outward):
        c, c1, _, r, r1, _ = _bspline_eval(cp, cr, at_s)
        tc0, tc1, _ = _sphere_roots(o, d, c, r)

        def expose(tc):
            q = o + tc[..., None] * d - c
            g = jnp.sum(q * c1, -1) + r * r1
            okc = (g * outward >= 0.0) & jnp.isfinite(tc)
            return jnp.where(okc, tc, jnp.inf)

        return _first_valid(expose(tc0), expose(tc1), maxt, active)

    z = jnp.full_like(t_side, jnp.inf)
    t_cap0 = jnp.where(w0 <= 1e-6, cap(jnp.zeros_like(w0), -1.0), z)
    t_cap1 = jnp.where(w1 >= 1.0 - 1e-6, cap(jnp.ones_like(w1), 1.0), z)
    return jnp.minimum(t_side, jnp.minimum(t_cap0, t_cap1))


def _first_valid(t0, t1, maxt, active):
    """Nearest t in (0, maxt] from two candidate roots (inf = miss)."""
    ok0 = active & (t0 > 0.0) & (t0 <= maxt)
    ok1 = active & (t1 > 0.0) & (t1 <= maxt)
    t0 = jnp.where(ok0, t0, jnp.inf)
    t1 = jnp.where(ok1, t1, jnp.inf)
    return jnp.minimum(t0, t1)


def _disk_hit(o, d, c, su, sv, nrm):
    """Plane hit + normalized in-disk coordinates (x, y)."""
    denom = jnp.sum(d * nrm, axis=-1)
    safe = jnp.abs(denom) > 1e-12
    t = jnp.where(safe,
                  jnp.sum((c - o) * nrm, axis=-1)
                  / jnp.where(safe, denom, 1.0),
                  jnp.inf)
    p = o + d * t[..., None]
    rel = p - c
    x = jnp.sum(rel * su, axis=-1) / jnp.maximum(
        jnp.sum(su * su, axis=-1), 1e-20)
    y = jnp.sum(rel * sv, axis=-1) / jnp.maximum(
        jnp.sum(sv * sv, axis=-1), 1e-20)
    return t, x, y


def _disk_local(p, c, su, sv):
    rel = p - c
    x = dot(rel, su) / jnp.maximum(dot(su, su), 1e-20)
    y = dot(rel, sv) / jnp.maximum(dot(sv, sv), 1e-20)
    return jnp.stack([x, y], axis=-1)


def _t_from_point(ray, p):
    """Distance of an attached surface point from the (detached) ray
    origin — the follow_shape t convention (mesh.cpp:1376)."""
    delta = p - ray.o
    return jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-30)
                    / jnp.maximum(jnp.sum(ray.d * ray.d, axis=-1), 1e-30))


# --------------------------------------------------------- emitter geom


@pytree
class SphereGeom:
    """Duck-types the Mesh position-sampling protocol (models/shapes.py
    Mesh.sample_position*) for an analytic sphere area light, and adds
    the reference's exact solid-angle cone sampling (sphere.cpp:236-287)
    which AreaEmitter dispatches to when it sees this geom type."""

    center: jnp.ndarray   # (3,)
    radius: jnp.ndarray   # ()

    def surface_area(self):
        return 4.0 * jnp.pi * sqr(self.radius)

    def _position(self, sample2):
        dir_ = warp.square_to_uniform_sphere(sample2)
        p = self.center[None] + dir_ * self.radius
        pdf = jnp.full(sample2.shape[:-1],
                       1.0 / jnp.maximum(self.surface_area(), 1e-20))
        return PositionSample(
            p=p, n=dir_, uv=sample2, pdf=pdf,
            delta=jnp.zeros(sample2.shape[:-1], bool))

    def sample_position(self, sample1, sample2, face_distr=None):
        return self._position(sample2)

    def sample_position_reuse(self, sample2, face_distr=None):
        return self._position(sample2)

    # --- exact cone sampling toward the sphere (sphere.cpp:236-287) ----

    def cone_sample_direction(self, ref_p, sample2):
        """Uniform solid-angle sampling of the sphere as seen from
        ref_p (outside).  Returns (p, n, pdf_sa, valid_outside)."""
        dc_v = self.center[None] - ref_p
        dc_2 = jnp.maximum(jnp.sum(dc_v * dc_v, axis=-1), 1e-20)
        inv_dc = 1.0 / jnp.sqrt(dc_2)
        outside = dc_2 > sqr(self.radius)

        sin_tm = self.radius * inv_dc
        sin_tm_2 = sqr(sin_tm)
        inv_sin_tm = 1.0 / jnp.maximum(sin_tm, 1e-20)
        cos_tm = safe_sqrt(1.0 - sin_tm_2)
        # low-distortion mapping with the reference's Taylor branch for
        # very small cones (sphere.cpp:257-260)
        sin_t2 = jnp.where(
            sin_tm_2 > 0.00068523,
            1.0 - sqr((cos_tm - 1.0) * sample2[..., 0] + 1.0),
            sin_tm_2 * sample2[..., 0])
        cos_t = safe_sqrt(1.0 - sin_t2)
        cos_alpha = sin_t2 * inv_sin_tm + cos_t * safe_sqrt(
            1.0 - sin_t2 * sqr(inv_sin_tm))
        sin_alpha = safe_sqrt(1.0 - sqr(cos_alpha))
        phi = sample2[..., 1] * _TWO_PI
        d_loc = jnp.stack([jnp.cos(phi) * sin_alpha,
                           jnp.sin(phi) * sin_alpha,
                           cos_alpha], axis=-1)
        # frame with +z from sphere center toward ref (the sampled
        # surface normal has cos_alpha along this axis — visible cap)
        z = -dc_v * inv_dc[..., None]            # unit center->ref
        s, t = coordinate_system(z)
        n_world = (s * d_loc[..., 0:1] + t * d_loc[..., 1:2]
                   + z * d_loc[..., 2:3])
        p = self.center[None] + n_world * self.radius
        # uniform-cone pdf; sampled directions are inside by construction
        pdf = 1.0 / (_TWO_PI * jnp.maximum(1.0 - cos_tm, 1e-12))
        return p, n_world, pdf, outside

    def cone_pdf_direction(self, ref_p, ds):
        """Solid-angle pdf partner of cone_sample_direction
        (sphere.cpp:311-325)."""
        dc = jnp.sqrt(jnp.maximum(
            jnp.sum((self.center[None] - ref_p) ** 2, axis=-1), 1e-20))
        sin_alpha = self.radius / dc
        cos_alpha = safe_sqrt(1.0 - sqr(sin_alpha))
        cone = 1.0 / (_TWO_PI * jnp.maximum(1.0 - cos_alpha, 1e-12))
        # inside the sphere: fall back to area-measure conversion
        cos_e = jnp.maximum(-jnp.sum(ds.d * ds.n, axis=-1), 1e-6)
        area = (1.0 / jnp.maximum(self.surface_area(), 1e-20)) \
            * sqr(ds.dist) / cos_e
        return jnp.where(sin_alpha < 1.0 - 1e-6, cone, area)


# ------------------------------------------------------------- builders


def build_analytic(prims):
    """Assemble an AnalyticShapes from a list of prim descriptors
    (utils/load.py):

    ``("sphere", center, radius, bsdf, emitter, flip, id)``
    ``("disk", center, su, sv, n, bsdf, emitter, flip, id)``
    ``("cylinder", p0, axis, length, radius, bsdf, emitter, flip, id)``
    ``("curve", pa, pb, ra, rb, u0, u1, bsdf, emitter, flip, id)``
    (one descriptor per swept-sphere segment)
    ``("cubiccurve", pa, pb, ra, rb, u0, u1, cp4, cr4, w0, w1, pad,
    bsdf, emitter, flip, id)`` — one per flattened subsegment of a
    cubic B-spline segment (round 4, exact intersection; the linear
    (pa, pb, ra, rb) tube only seeds the Newton solve)
    """
    sp, dk, cy, cv = [], [], [], []
    for p in prims:
        {"sphere": sp, "disk": dk, "cylinder": cy,
         "curve": cv, "cubiccurve": cv}[p[0]].append(p)
    meta = []   # (bsdf, emitter, flip, id) in global prim order
    for p in sp:
        meta.append(p[3:])
    for p in dk:
        meta.append(p[5:])
    for p in cy:
        meta.append(p[5:])
    for p in cv:
        meta.append(p[12:] if p[0] == "cubiccurve" else p[7:])

    def arr(rows, idx, width=None):
        if not rows:
            shape = (0, width) if width else (0,)
            return jnp.zeros(shape, jnp.float32)
        return jnp.asarray(np.stack([np.asarray(r[idx], np.float32)
                                     for r in rows]), jnp.float32)

    K = len(cv)
    any_cubic = any(p[0] == "cubiccurve" for p in cv)
    cv_cp = np.zeros((K, 4, 3), np.float32)
    cv_cr = np.zeros((K, 4), np.float32)
    cv_w0 = np.zeros((K,), np.float32)
    cv_w1 = np.ones((K,), np.float32)
    cv_pad = np.zeros((K,), np.float32)
    cv_cub = np.zeros((K,), np.float32)
    for k, p in enumerate(cv):
        if p[0] == "cubiccurve":
            cv_cp[k] = np.asarray(p[7], np.float32)
            cv_cr[k] = np.asarray(p[8], np.float32)
            cv_w0[k] = float(p[9])
            cv_w1[k] = float(p[10])
            cv_pad[k] = float(p[11])
            cv_cub[k] = 1.0

    return AnalyticShapes(
        sp_center=arr(sp, 1, 3), sp_radius=arr(sp, 2),
        dk_center=arr(dk, 1, 3), dk_su=arr(dk, 2, 3),
        dk_sv=arr(dk, 3, 3), dk_n=arr(dk, 4, 3),
        cy_p0=arr(cy, 1, 3), cy_axis=arr(cy, 2, 3),
        cy_len=arr(cy, 3), cy_radius=arr(cy, 4),
        cv_pa=arr(cv, 1, 3), cv_pb=arr(cv, 2, 3),
        cv_ra=arr(cv, 3), cv_rb=arr(cv, 4),
        cv_u0=arr(cv, 5), cv_u1=arr(cv, 6),
        cv_cp=jnp.asarray(cv_cp), cv_cr=jnp.asarray(cv_cr),
        cv_w0=jnp.asarray(cv_w0), cv_w1=jnp.asarray(cv_w1),
        cv_pad=jnp.asarray(cv_pad), cv_cubic=jnp.asarray(cv_cub),
        bsdf_index=tuple(int(m[0]) for m in meta),
        emitter_index=tuple(int(m[1]) for m in meta),
        flip_normals=tuple(bool(m[2]) for m in meta),
        ids=tuple(str(m[3]) for m in meta),
        any_cubic=bool(any_cubic),
    )

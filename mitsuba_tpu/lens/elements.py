"""Lens interface elements: spherical, planar, aperture stop, aspherical.

Reference: src/sensors/realisticlens.cpp:245-818 [FORK] — LensInterface
(refract-at-surface :269), SpheroidLens (:346, convexity-aware quadratic
intersect), PlanoLens (:428), ApertureStop (:496 pass-through + radius
clip), AsphericalLens (:554, conic + even-asphere sag with Newton
iteration intersect, analytic gradient normal).

All geometry parameters (curvature, z position, asphere coefficients) are
differentiable leaves; each element's ``compute_interaction(ray, active)``
is a batched pure function (N,)-masked over the wavefront.  The asphere's
Newton solve runs a fixed number of tangent-plane iterations inside
``lax.fori_loop`` — fixed trip count for XLA, matching the reference's
10-iteration cap (realisticlens.cpp:574-645).  Gradients through the
implicit intersection flow through the final tangent-plane solve (one
differentiable step on top of a converged detached iterate — the
implicit-function-theorem treatment the reference approximates).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core.math import dot, normalize
from ..core.records import Ray
from .materials import DispersiveMaterial

INF = jnp.float32(jnp.inf)


def _fresnel_refract_global(ray_d, n, eta_rel):
    """Dielectric Fresnel + refraction in the GLOBAL frame
    (LensInterface::compute_interaction, realisticlens.cpp:286-292).

    ray_d: incident propagation direction; n: surface normal (pointing
    against the incident side by construction); eta_rel = int_ior/ext_ior.
    Returns (reflectance r, refracted direction d_out, valid).
    """
    cos_i = dot(-ray_d, n)
    # fresnel() handles the orientation swap internally (fresnel.h)
    from ..core.fresnel import fresnel_dielectric, refract_n

    r, cos_t, eta_it, eta_ti = fresnel_dielectric(cos_i, eta_rel)
    # refract in global frame about n; wi = -ray_d (fresnel.h refract)
    d_out = normalize(refract_n(-ray_d, n, cos_t, eta_ti))
    valid = r <= (1.0 - 1e-6)
    return r, d_out, valid


def _advance(ray: Ray, t, p, d):
    return Ray(o=p, d=d, maxt=jnp.full_like(t, INF), time=ray.time,
               wavelengths=ray.wavelengths)


@pytree
class SpheroidLens:
    """Spherical refracting surface (realisticlens.cpp:346)."""

    curvature_radius: jnp.ndarray  # () signed: convex (+), concave (-)
    element_radius: jnp.ndarray    # ()
    z_intercept: jnp.ndarray       # ()
    left: DispersiveMaterial
    right: DispersiveMaterial
    kind: str = static("sphere")

    def center(self):
        return self.z_intercept + self.curvature_radius

    def intersect(self, ray: Ray):
        """Returns (t, p, n, valid) — convexity-aware root choice."""
        cz = self.center()
        c = jnp.stack([jnp.zeros_like(cz), jnp.zeros_like(cz), cz])
        p_local = c - ray.o
        center_proj = dot(p_local, ray.d)
        perp2 = dot(p_local, p_local) - center_proj**2
        disc = self.curvature_radius**2 - perp2
        valid = disc >= 0.0
        sqrt_disc = jnp.sqrt(jnp.where(valid, disc, 1.0)) * valid
        near_t = center_proj - sqrt_disc
        far_t = center_proj + sqrt_disc
        valid &= far_t >= 0.0
        is_convex = self.curvature_radius > 0.0
        pick_near = is_convex ^ (ray.d[..., 2] < 0.0)
        t = jnp.where(
            pick_near,
            jnp.where(near_t >= 0.0, near_t, INF),
            far_t,
        )
        valid &= jnp.isfinite(t)
        p = ray.o + ray.d * t[..., None]
        n = normalize(p - jnp.stack([jnp.zeros_like(cz), jnp.zeros_like(cz), cz]))
        n = jnp.where(is_convex, n, -n)
        return t, p, n, valid

    def compute_interaction(self, ray: Ray, active):
        t, p, n, valid = self.intersect(ray)
        valid &= active
        valid &= (p[..., 0] ** 2 + p[..., 1] ** 2) < self.element_radius**2
        ext_ior = self.left.ior_from_ray(ray)
        int_ior = self.right.ior_from_ray(ray)
        _, d_out, refr_ok = _fresnel_refract_global(
            ray.d, n, int_ior / ext_ior
        )
        valid &= refr_ok
        return _advance(ray, t, p, d_out), valid


@pytree
class PlanoLens:
    """Planar refracting surface, normal (0,0,-1) (realisticlens.cpp:428)."""

    element_radius: jnp.ndarray
    z_intercept: jnp.ndarray
    left: DispersiveMaterial
    right: DispersiveMaterial
    kind: str = static("plane")

    def intersect(self, ray: Ray):
        nz = -1.0
        n_dot_d = nz * ray.d[..., 2]
        ok = jnp.abs(n_dot_d) >= 1e-8
        t = (nz * self.z_intercept - nz * ray.o[..., 2]) / jnp.where(
            ok, n_dot_d, 1.0
        )
        valid = ok & (t >= 0.0)
        p = ray.o + ray.d * t[..., None]
        n = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), p.shape)
        return t, p, n, valid

    def compute_interaction(self, ray: Ray, active):
        t, p, n, valid = self.intersect(ray)
        valid &= active
        valid &= (p[..., 0] ** 2 + p[..., 1] ** 2) < self.element_radius**2
        ext_ior = self.left.ior_from_ray(ray)
        int_ior = self.right.ior_from_ray(ray)
        _, d_out, refr_ok = _fresnel_refract_global(
            ray.d, n, int_ior / ext_ior
        )
        valid &= refr_ok
        return _advance(ray, t, p, d_out), valid


@pytree
class ApertureStop:
    """Pass-through stop: kills rays outside the radius
    (realisticlens.cpp:496)."""

    element_radius: jnp.ndarray
    z_intercept: jnp.ndarray
    left: DispersiveMaterial
    right: DispersiveMaterial
    kind: str = static("aperture")

    def intersect(self, ray: Ray):
        return PlanoLens.intersect(self, ray)

    def compute_interaction(self, ray: Ray, active):
        t, p, n, valid = self.intersect(ray)
        valid &= active
        valid &= (p[..., 0] ** 2 + p[..., 1] ** 2) < self.element_radius**2
        return _advance(ray, t, p, ray.d), valid


@pytree
class AsphericalLens:
    """Conic + even-asphere surface (realisticlens.cpp:554).

    Sag (dimensionless, r2_ = (r/R_elem)^2, realisticlens.cpp:680-707):
      z_(r2_) = c_*r2_/(1+sqrt(1-(1+K)c_^2 r2_)) + sum ai_[i] r2_^(i+2)
      z(r)    = -z_ * R_elem + z_intercept
    with c_ = R_elem/curvature_radius (unitless curvature) and the ai
    prescaled by R_elem powers at build time (realisticlens.cpp:560-572).
    """

    c_unitless: jnp.ndarray       # () R_elem / curvature_radius
    kappa: jnp.ndarray            # () conic constant
    ai: jnp.ndarray               # (A,) prescaled asphere coefficients
    element_radius: jnp.ndarray   # () meters
    z_intercept: jnp.ndarray      # ()
    left: DispersiveMaterial
    right: DispersiveMaterial
    newton_iters: int = static(10)
    kind: str = static("asphere")

    def _sag_unitless(self, r2_):
        sqr_term = 1.0 - (1.0 + self.kappa) * self.c_unitless**2 * r2_
        z_ = self.c_unitless * r2_ / (
            1.0 + jnp.sqrt(jnp.maximum(sqr_term, 1e-12))
        )
        poly = jnp.zeros_like(r2_)
        for i in range(self.ai.shape[0] - 1, -1, -1):
            poly = poly * r2_ + self.ai[i]
        return z_ + poly * r2_**2

    def sag_z(self, r2):
        """World-space z of the surface at radius^2 r2 (meters)."""
        r2_ = r2 / self.element_radius**2
        return -self._sag_unitless(r2_) * self.element_radius + self.z_intercept

    def _sag_grad_unitless(self, r2_):
        """d z_/d r_ (realisticlens.cpp _eval_asph_grad)."""
        r_ = jnp.sqrt(jnp.maximum(r2_, 1e-20))
        cr = self.c_unitless * r_
        sqr_term = 1.0 - (1.0 + self.kappa) * cr**2
        dz = cr / jnp.sqrt(jnp.maximum(sqr_term, 1e-12))
        poly = jnp.zeros_like(r2_)
        for i in range(self.ai.shape[0] - 1, -1, -1):
            poly = poly * r2_ + (2.0 * i + 4.0) * self.ai[i]
        return dz + poly * r2_ * r_

    def normal(self, p):
        """Surface normal at p (realisticlens.cpp:647-657)."""
        radial = p[..., :2] / self.element_radius
        r2_ = jnp.sum(radial * radial, axis=-1)
        safe = r2_ >= 4e-7
        inv_r = jnp.where(safe, 1.0 / jnp.sqrt(jnp.maximum(r2_, 1e-20)), 0.0)
        radial = radial * inv_r[..., None]
        zg = self._sag_grad_unitless(r2_)
        n = jnp.stack(
            [zg * radial[..., 0], zg * radial[..., 1], -jnp.ones_like(zg)],
            axis=-1,
        )
        return normalize(n)

    def _intersect_conic(self, ray: Ray):
        """Initial guess: intersect the pure conic (realisticlens.cpp:762)."""
        R = self.element_radius
        o = (ray.o - jnp.stack([jnp.zeros_like(self.z_intercept),
                                jnp.zeros_like(self.z_intercept),
                                self.z_intercept])) / R
        d = ray.d
        c = self.c_unitless
        K = self.kappa
        A = c * (1.0 + K * d[..., 2] ** 2)
        B = 2.0 * (c * (dot(o, d) + K * o[..., 2] * d[..., 2]) - d[..., 2])
        C = c * (dot(o, o) + K * o[..., 2] ** 2) - 2.0 * o[..., 2]
        # solve A t^2 + B t + C = 0 (degenerates to linear when A ~ 0)
        lin = jnp.abs(A) < 1e-12
        disc = B * B - 4.0 * A * C
        valid = lin | (disc >= 0.0)
        sq = jnp.sqrt(jnp.where(disc >= 0.0, disc, 1.0)) * (disc >= 0.0)
        q = -0.5 * (B + jnp.sign(B) * sq)
        t0q = q / jnp.where(jnp.abs(A) > 1e-20, A, 1.0)
        t1q = C / jnp.where(jnp.abs(q) > 1e-20, q, 1.0)
        t_lin = -C / jnp.where(jnp.abs(B) > 1e-20, B, 1.0)
        t0 = jnp.where(lin, t_lin, jnp.minimum(t0q, t1q)) * R
        t1 = jnp.where(lin, t_lin, jnp.maximum(t0q, t1q)) * R
        # z-test: root must lie on the real branch (realisticlens.cpp:783)
        zmax = jnp.where(K > -1.0, R / (1.0 + K), INF)
        zt0 = c * (ray.o[..., 2] + t0 * d[..., 2] - self.z_intercept)
        zt1 = c * (ray.o[..., 2] + t1 * d[..., 2] - self.z_intercept)
        v0 = valid & (zt0 > 0.0) & (zt0 <= zmax)
        v1 = valid & (zt1 > 0.0) & (zt1 <= zmax)
        valid &= v0 | v1
        both = v0 & v1
        t = jnp.where(both, jnp.where(t0 > 0.0, t0, t1),
                      jnp.where(v0, t0, t1))
        return t, valid

    def intersect(self, ray: Ray):
        t0, conic_ok = self._intersect_conic(ray)
        t_plane = (self.z_intercept - ray.o[..., 2]) / jnp.where(
            jnp.abs(ray.d[..., 2]) > 1e-12, ray.d[..., 2], 1.0
        )
        t = jnp.where(conic_ok, t0, t_plane)

        def newton_step(_, carry):
            t, _err = carry
            p = ray.o + ray.d * t[..., None]
            r2 = p[..., 0] ** 2 + p[..., 1] ** 2
            z_surf = self.sag_z(r2)
            err = jnp.abs(p[..., 2] - z_surf)
            plane_p = jnp.stack([p[..., 0], p[..., 1], z_surf], axis=-1)
            plane_n = self.normal(p)
            denom = dot(plane_n, ray.d)
            t_new = dot(plane_n, plane_p - ray.o) / jnp.where(
                jnp.abs(denom) > 1e-12, denom, 1.0
            )
            return (t_new, err)

        # fixed-count Newton on a DETACHED iterate, then one attached step:
        # the final tangent-plane solve re-derives t differentiably from the
        # converged point (implicit-function gradient; the reference
        # differentiates through the loop, realisticlens.cpp:604-613).
        t_det, _ = jax.lax.fori_loop(
            0, self.newton_iters, newton_step,
            (jax.lax.stop_gradient(t), jnp.full_like(t, INF)),
        )
        t, err = newton_step(0, (jax.lax.stop_gradient(t_det), None))

        tol = 1e-5
        valid = (err < tol) & (t > 0.0)
        p = ray.o + ray.d * t[..., None]
        n = self.normal(p)
        return t, p, n, valid

    def compute_interaction(self, ray: Ray, active):
        t, p, n, valid = self.intersect(ray)
        valid &= active
        valid &= (p[..., 0] ** 2 + p[..., 1] ** 2) < self.element_radius**2
        ext_ior = self.left.ior_from_ray(ray)
        int_ior = self.right.ior_from_ray(ray)
        _, d_out, refr_ok = _fresnel_refract_global(
            ray.d, n, int_ior / ext_ior
        )
        valid &= refr_ok
        return _advance(ray, t, p, d_out), valid


def offset_element(elem, delta):
    """Shift an element along the optical axis (offset_along_axis,
    realisticlens.cpp:265; functional: returns a new element)."""
    return elem.replace(z_intercept=elem.z_intercept + delta)

"""Fresnel equations (reference: include/mitsuba/render/fresnel.h, 357 LoC).

Used by the dielectric/conductor BSDFs and by the [FORK] lens interface
tracer (src/sensors/realisticlens.cpp:286-292 calls fresnel() + refract()).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt, sqr


def fresnel_dielectric(cos_theta_i, eta):
    """Unpolarized Fresnel reflectance at a dielectric interface.

    Args mirror the reference's ``fresnel()``: cos_theta_i is signed
    (positive = ray arrives from the exterior, where eta = int_ior/ext_ior
    relative to the exterior).  Returns (F, cos_theta_t, eta_it, eta_ti):
      F           reflectance in [0, 1]
      cos_theta_t signed cosine of the transmitted ray (0 on TIR)
      eta_it      relative IOR along the transmission (it)
      eta_ti      its reciprocal
    """
    outside = cos_theta_i >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)

    cti = jnp.abs(cos_theta_i)
    sin2_t = sqr(eta_ti) * jnp.maximum(0.0, 1.0 - sqr(cti))
    tir = sin2_t >= 1.0
    ctt = safe_sqrt(1.0 - sin2_t)

    rs = (cti - eta_it * ctt) / jnp.maximum(cti + eta_it * ctt, 1e-20)
    rp = (eta_it * cti - ctt) / jnp.maximum(eta_it * cti + ctt, 1e-20)
    f = 0.5 * (sqr(rs) + sqr(rp))
    f = jnp.where(tir, 1.0, f)
    # match reference: index matched -> F = 0
    f = jnp.where(jnp.abs(eta - 1.0) < 1e-6, 0.0, f)
    cos_theta_t = jnp.where(tir, 0.0, -jnp.sign(cos_theta_i) * ctt)
    return f, cos_theta_t, eta_it, eta_ti


def fresnel_conductor(cos_theta_i, eta, k):
    """Unpolarized conductor Fresnel with complex IOR eta + i*k.

    eta/k broadcast against cos_theta_i[..., None] for per-channel IORs.
    """
    c2 = sqr(cos_theta_i)[..., None]
    s2 = 1.0 - c2
    e2 = sqr(eta)
    k2 = sqr(k)
    t0 = e2 - k2 - s2
    a2b2 = safe_sqrt(sqr(t0) + 4.0 * e2 * k2)
    t1 = a2b2 + c2
    a = safe_sqrt(0.5 * (a2b2 + t0))
    t2 = 2.0 * a * jnp.abs(cos_theta_i)[..., None]
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + sqr(s2)
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def refract(wi, cos_theta_t, eta_ti):
    """Refract LOCAL-frame wi given cos_theta_t from fresnel_dielectric.

    Reference fresnel.h refract(): valid only when cos_theta_t != 0.
    """
    scale = -eta_ti
    return jnp.stack(
        [
            scale * wi[..., 0],
            scale * wi[..., 1],
            cos_theta_t * jnp.ones_like(wi[..., 2]),
        ],
        axis=-1,
    )


def refract_n(wi, n, cos_theta_t, eta_ti):
    """Refract about an arbitrary unit normal n (world frame).

    wi points *away* from the surface (toward the source).
    """
    dp = jnp.sum(wi * n, axis=-1, keepdims=True)
    return n * (dp * eta_ti[..., None] + cos_theta_t[..., None]) - wi * eta_ti[..., None]

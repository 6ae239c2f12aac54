"""GGX / Beckmann microfacet distribution (reference:
include/mitsuba/render/microfacet.h, 570 LoC).

Isotropic + anisotropic GGX with Smith separable shadowing and Heitz 2018
visible-normal (VNDF) sampling.  All functions operate on LOCAL-frame
directions, batched (..., 3).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.math import Frame, normalize, safe_div, safe_sqrt, sqr


def ggx_D(m, ax, ay):
    """GGX normal distribution function (anisotropic)."""
    c2 = sqr(m[..., 2])
    t = sqr(m[..., 0] / ax) + sqr(m[..., 1] / ay) + c2
    d = safe_div(1.0, jnp.pi * ax * ay * sqr(t))
    return jnp.where(m[..., 2] > 0.0, d, 0.0)


def ggx_lambda(v, ax, ay):
    """Smith Lambda for GGX."""
    c2 = sqr(v[..., 2])
    a2 = sqr(v[..., 0] * ax) + sqr(v[..., 1] * ay)
    return 0.5 * (safe_sqrt(1.0 + safe_div(a2, c2)) - 1.0)


def smith_g1(v, m, ax, ay):
    """Masking function; zero when v is on the wrong side of m."""
    g = 1.0 / (1.0 + ggx_lambda(v, ax, ay))
    backfacing = (jnp.sum(v * m, axis=-1) * v[..., 2]) <= 0.0
    return jnp.where(backfacing, 0.0, g)


def smith_g2(wi, wo, m, ax, ay):
    """Separable Smith shadowing-masking."""
    return smith_g1(wi, m, ax, ay) * smith_g1(wo, m, ax, ay)


def sample_vndf(wi, sample2, ax, ay):
    """Sample a visible normal (Heitz 2018 'Sampling the GGX Distribution
    of Visible Normals').  wi must be in the upper hemisphere (z > 0)."""
    # transform to hemisphere configuration
    vh = normalize(
        jnp.stack([ax * wi[..., 0], ay * wi[..., 1], wi[..., 2]], axis=-1)
    )
    # orthonormal basis around vh
    lensq = sqr(vh[..., 0]) + sqr(vh[..., 1])
    inv = safe_div(1.0, safe_sqrt(lensq))
    t1 = jnp.stack(
        [-vh[..., 1] * inv, vh[..., 0] * inv, jnp.zeros_like(inv)], axis=-1
    )
    t1 = jnp.where(
        (lensq > 1e-12)[..., None],
        t1,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), t1.shape),
    )
    t2 = jnp.cross(vh, t1)
    # parameterize projected area
    r = safe_sqrt(sample2[..., 0])
    phi = 2.0 * jnp.pi * sample2[..., 1]
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * safe_sqrt(1.0 - sqr(p1)) + s * p2
    p3 = safe_sqrt(jnp.maximum(0.0, 1.0 - sqr(p1) - sqr(p2)))
    nh = (
        p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    )
    # back to ellipsoid configuration
    m = normalize(
        jnp.stack(
            [ax * nh[..., 0], ay * nh[..., 1], jnp.maximum(1e-6, nh[..., 2])],
            axis=-1,
        )
    )
    return m


def vndf_pdf(wi, m, ax, ay):
    """pdf of sample_vndf in the half-vector measure."""
    return safe_div(
        smith_g1(wi, m, ax, ay)
        * jnp.abs(jnp.sum(wi * m, axis=-1))
        * ggx_D(m, ax, ay),
        jnp.abs(wi[..., 2]),
    )

"""Warp functions: [0,1)^2 <-> canonical distributions.

TPU-native re-implementation of the reference's header-only warp library
(include/mitsuba/core/warp.h, ~831 LoC).  Every function is a pure jnp map
over an (..., 2) sample array; pdfs are provided alongside so the chi^2 test
harness (tests/test_chi2 utilities) can validate sample/pdf consistency.
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import safe_sqrt, sqr

INV_PI = 1.0 / jnp.pi
INV_TWO_PI = 1.0 / (2.0 * jnp.pi)
INV_FOUR_PI = 1.0 / (4.0 * jnp.pi)


# ---------------------------------------------------------------- disk

def square_to_uniform_disk_concentric(s):
    """Shirley-Chiu concentric mapping (low distortion, preserves strata)."""
    x = 2.0 * s[..., 0] - 1.0
    y = 2.0 * s[..., 1] - 1.0
    # Handle degenerate origin without NaNs.
    is_zero = (x == 0.0) & (y == 0.0)
    quad_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quad_x, x, y)
    ratio = jnp.where(
        quad_x,
        jnp.where(x != 0.0, y / jnp.where(x != 0.0, x, 1.0), 0.0),
        jnp.where(y != 0.0, x / jnp.where(y != 0.0, y, 1.0), 0.0),
    )
    phi = jnp.where(
        quad_x, (jnp.pi / 4.0) * ratio, (jnp.pi / 2.0) - (jnp.pi / 4.0) * ratio
    )
    r = jnp.where(is_zero, 0.0, r)
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_uniform_disk_concentric_pdf(p):
    inside = jnp.sum(p * p, axis=-1) <= 1.0
    return jnp.where(inside, INV_PI, 0.0)


def uniform_disk_to_square_concentric(p):
    """Inverse concentric map (used by projective sampling in the reference).

    Forward (with a = 2u-1, b = 2v-1):
      |a| > |b|:  r = a, phi = (pi/4) b/a
      else:       r = b, phi = pi/2 - (pi/4) a/b
    Inverting by the angular region of p:
      |theta| <= pi/4         -> a =  rho, b =  rho * theta / (pi/4)
      pi/4 < theta < 3pi/4    -> b =  rho, a =  rho * (pi/2 - theta) / (pi/4)
      |theta| >= 3pi/4        -> a = -rho, b = -rho*(theta - sign pi)/(pi/4)
      -3pi/4 < theta < -pi/4  -> b = -rho, a = -rho*(pi/2-(theta+pi))/(pi/4)
    """
    rho = jnp.sqrt(jnp.maximum(jnp.sum(p * p, axis=-1), 1e-30))
    theta = jnp.arctan2(p[..., 1], p[..., 0])
    q = jnp.pi / 4.0
    r1 = jnp.abs(theta) <= q
    r2 = (theta > q) & (theta < 3 * q)
    r3 = jnp.abs(theta) >= 3 * q
    a = jnp.where(r1, rho, 0.0)
    b = jnp.where(r1, rho * theta / q, 0.0)
    a = jnp.where(r2, rho * (jnp.pi / 2 - theta) / q, a)
    b = jnp.where(r2, rho, b)
    theta_w = theta - jnp.sign(theta) * jnp.pi
    a = jnp.where(r3, -rho, a)
    b = jnp.where(r3, -rho * theta_w / q, b)
    r4 = ~(r1 | r2 | r3)
    a = jnp.where(r4, -rho * (jnp.pi / 2 - (theta + jnp.pi)) / q, a)
    b = jnp.where(r4, -rho, b)
    return jnp.stack([(a + 1.0) * 0.5, (b + 1.0) * 0.5], axis=-1)


# ---------------------------------------------------------------- sphere

def square_to_uniform_sphere(s):
    z = 1.0 - 2.0 * s[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_sphere_pdf(d):
    return jnp.full(d.shape[:-1], INV_FOUR_PI, d.dtype)


def square_to_uniform_hemisphere(s):
    """Uniform on the z>=0 hemisphere."""
    z = s[..., 1]
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_hemisphere_pdf(d):
    return jnp.where(d[..., 2] >= 0.0, INV_TWO_PI, 0.0)


def square_to_cosine_hemisphere(s):
    """Cosine-weighted hemisphere via concentric disk + projection."""
    p = square_to_uniform_disk_concentric(s)
    z = safe_sqrt(1.0 - jnp.sum(p * p, axis=-1))
    return jnp.concatenate([p, z[..., None]], axis=-1)


def square_to_cosine_hemisphere_pdf(d):
    return jnp.maximum(d[..., 2], 0.0) * INV_PI


def square_to_uniform_cone(s, cos_cutoff):
    """Uniform in the cone around +z with cos(angle) >= cos_cutoff."""
    z = 1.0 + s[..., 1] * (cos_cutoff - 1.0)
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_uniform_cone_pdf(d, cos_cutoff):
    return jnp.where(
        d[..., 2] >= cos_cutoff, INV_TWO_PI / (1.0 - cos_cutoff), 0.0
    )


# ---------------------------------------------------------------- triangle

def square_to_uniform_triangle(s):
    """Uniform barycentrics over the unit triangle (b0 + b1 <= 1)."""
    t = safe_sqrt(1.0 - s[..., 0])
    return jnp.stack([1.0 - t, t * s[..., 1]], axis=-1)


def square_to_uniform_triangle_pdf(b):
    inside = (b[..., 0] >= 0) & (b[..., 1] >= 0) & (b[..., 0] + b[..., 1] <= 1)
    return jnp.where(inside, 2.0, 0.0)


# ---------------------------------------------------------------- misc 1D

def interval_to_tent(s):
    """[0,1) -> tent distribution (pdf 1-|x|) on [-1, 1]."""
    return jnp.where(
        s < 0.5,
        safe_sqrt(2.0 * s) - 1.0,
        1.0 - safe_sqrt(jnp.maximum(2.0 - 2.0 * s, 0.0)),
    )


def square_to_std_normal(s):
    """Box-Muller: [0,1)^2 -> 2D standard normal (gaussian rfilter)."""
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - s[..., 0], 1e-20)))
    phi = 2.0 * jnp.pi * s[..., 1]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi)], axis=-1)


def square_to_std_normal_pdf(p):
    return INV_TWO_PI * jnp.exp(-0.5 * jnp.sum(p * p, axis=-1))


# ---------------------------------------------------- von Mises-Fisher (later use)

def square_to_vmf(s, kappa):
    """von Mises-Fisher distribution around +z."""
    sy = jnp.maximum(s[..., 1], 1e-7)
    z = 1.0 + jnp.log(sy + (1.0 - sy) * jnp.exp(-2.0 * kappa)) / kappa
    r = safe_sqrt(1.0 - z * z)
    phi = 2.0 * jnp.pi * s[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def square_to_vmf_pdf(d, kappa):
    return kappa * jnp.exp(kappa * (d[..., 2] - 1.0)) / (
        2.0 * jnp.pi * (1.0 - jnp.exp(-2.0 * kappa))
    )

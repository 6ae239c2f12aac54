"""Small vector-math utilities over SoA arrays of 3D vectors.

All direction/point arrays are shaped ``(..., 3)`` float32.  Mirrors the
helpers the reference keeps in include/mitsuba/core/{vector.h,frame.h,math.h};
implemented as pure jnp functions so XLA fuses them into surrounding kernels.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7
RAY_EPS = 1e-4  # spawn-ray offset scale (reference: math::RayEpsilon)
ONE_MINUS_EPS = jnp.float32(1.0 - 2 ** -24)


def dot(a, b, keepdims=False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def norm(v, keepdims=False):
    return safe_sqrt(dot(v, v, keepdims=keepdims))


def normalize(v):
    return v * rsqrt_safe(dot(v, v, keepdims=True))


def rsqrt_safe(x, eps=1e-20):
    return jnp.where(x > eps, jnp.reciprocal(jnp.sqrt(jnp.maximum(x, eps))), 0.0)


def safe_sqrt(x):
    """sqrt clamped at 0 with a NaN-free gradient.

    d/dx sqrt(max(x, 0)) is 0*inf = NaN for x <= 0 under reverse AD; the
    double-where makes the masked branch's gradient exactly zero (the
    standard JAX safe-function idiom — dr::safe_sqrt equivalent)."""
    valid = x > 0.0
    return jnp.where(valid, jnp.sqrt(jnp.where(valid, x, 1.0)), 0.0)


def safe_rcp(x, eps=1e-20):
    """Reciprocal that maps (+/-)0 -> (+/-)huge (ray inverse directions)."""
    ok = jnp.abs(x) > eps
    big = jnp.where(jnp.signbit(x), -1e30, 1e30)
    return jnp.where(ok, 1.0 / jnp.where(ok, x, 1.0), big)


def safe_div(a, b, eps=1e-20):
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def sqr(x):
    return x * x


def fmadd(a, b, c):
    return a * b + c


def lerp(a, b, t):
    return a + (b - a) * t


def coordinate_system(n):
    """Build an orthonormal basis (s, t) around unit normal n.

    Duff et al. 2017 branchless construction (same as the reference's
    ``coordinate_system`` in vector.h).  n: (..., 3) -> (s, t) each (..., 3).
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    s = jnp.stack(
        [1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]],
        axis=-1,
    )
    t = jnp.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], axis=-1)
    return s, t


class Frame:
    """Shading frame: local <-> world conversion around a normal.

    Functional equivalent of the reference's ``Frame3f`` (frame.h).  Stored as
    a simple namespace of pure functions; a frame is the tuple (s, t, n).
    """

    @staticmethod
    def from_normal(n):
        s, t = coordinate_system(n)
        return s, t, n

    @staticmethod
    def to_local(frame, v):
        s, t, n = frame
        return jnp.stack([dot(v, s), dot(v, t), dot(v, n)], axis=-1)

    @staticmethod
    def to_world(frame, v):
        s, t, n = frame
        return (
            s * v[..., 0:1] + t * v[..., 1:2] + n * v[..., 2:3]
        )

    # Trig helpers on local-frame directions (frame.h cos_theta & friends)
    @staticmethod
    def cos_theta(v):
        return v[..., 2]

    @staticmethod
    def cos_theta_2(v):
        return sqr(v[..., 2])

    @staticmethod
    def sin_theta_2(v):
        return jnp.maximum(0.0, 1.0 - sqr(v[..., 2]))

    @staticmethod
    def sin_theta(v):
        return safe_sqrt(Frame.sin_theta_2(v))

    @staticmethod
    def tan_theta(v):
        return safe_div(Frame.sin_theta(v), v[..., 2])

    @staticmethod
    def tan_theta_2(v):
        return safe_div(Frame.sin_theta_2(v), Frame.cos_theta_2(v))


def reflect(wi):
    """Mirror direction in local frame: (-x, -y, z)."""
    return jnp.stack([-wi[..., 0], -wi[..., 1], wi[..., 2]], axis=-1)


def reflect_n(wi, n):
    """Reflect wi about arbitrary normal n (world frame)."""
    return 2.0 * dot(wi, n, keepdims=True) * n - wi


def spherical_direction(theta, phi):
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([st * cp, st * sp, ct], axis=-1)


def mulsign(a, b):
    return jnp.where(b >= 0.0, a, -a)

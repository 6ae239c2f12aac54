"""4x4 affine/projective transforms (reference: include/mitsuba/core/transform.h).

A transform is just a (4, 4) float32 jnp array; helpers build the standard
constructors and apply them to batched points / vectors / normals.  Keeping
transforms as raw arrays (instead of a matrix+inverse pair like the
reference) lets JAX differentiate through camera/object pose naturally; the
inverse is computed where needed (cheap at scene scale, outside hot loops).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import normalize, cross


def identity():
    return jnp.eye(4, dtype=jnp.float32)


def translate(v):
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, 3].set(jnp.asarray(v, jnp.float32))


def scale(v):
    v = jnp.broadcast_to(jnp.asarray(v, jnp.float32), (3,))
    return jnp.diag(jnp.concatenate([v, jnp.ones(1, jnp.float32)]))


def rotate(axis, angle_deg):
    """Rotation about a (not necessarily unit) axis, angle in degrees."""
    a = normalize(jnp.asarray(axis, jnp.float32))
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    s, c = jnp.sin(theta), jnp.cos(theta)
    x, y, z = a[0], a[1], a[2]
    K = jnp.array([[0, -z, y], [z, 0, -x], [-y, x, 0]], jnp.float32)
    R = jnp.eye(3, dtype=jnp.float32) * c + s * K + (1.0 - c) * jnp.outer(a, a)
    m = jnp.eye(4, dtype=jnp.float32)
    return m.at[:3, :3].set(R)


def look_at(origin, target, up):
    """Camera-to-world transform: +z looks from origin toward target.

    Matches the reference's convention (transform.h look_at): camera space
    has +x right, +y up, +z into the scene.
    """
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    dir_ = normalize(target - origin)
    left = normalize(cross(normalize(up), dir_))
    new_up = cross(dir_, left)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, 0].set(left)
    m = m.at[:3, 1].set(new_up)
    m = m.at[:3, 2].set(dir_)
    m = m.at[:3, 3].set(origin)
    return m


def perspective(fov_deg, near, far):
    """Perspective projection mapping the view frustum to [0,1]^2 x [0,1].

    Mirrors transform.h perspective(): projects camera space (+z forward)
    onto the image plane; used inverted as sample_to_camera in sensors.
    """
    fov = jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32))
    recip = 1.0 / (far - near)
    cot = 1.0 / jnp.tan(0.5 * fov)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(cot)
    m = m.at[1, 1].set(cot)
    m = m.at[2, 2].set(far * recip)
    m = m.at[2, 3].set(-near * far * recip)
    m = m.at[3, 2].set(1.0)
    return m


def compose(*ms):
    """compose(A, B, C) == A @ B @ C (applied right-to-left)."""
    out = ms[0]
    for m in ms[1:]:
        out = out @ m
    return out


def inverse(m):
    return jnp.linalg.inv(m)


def _linear3(m3, v):
    """(..., 3) x (3, 3)^T as explicit mul/adds.

    NOT a jnp matmul on purpose: on TPU, ``v @ m.T`` lowers to an MXU
    matmul whose default precision is bfloat16 — which quantizes every
    ray direction/origin to ~8 mantissa bits (hit points then land up
    to 2% off the true surface and NEE shadow rays self-intersect).
    Elementwise VPU ops stay full f32 and are faster for a (N,3)x(3,3)
    contraction anyway.
    """
    return (v[..., 0:1] * m3[:, 0] + v[..., 1:2] * m3[:, 1]
            + v[..., 2:3] * m3[:, 2])


def apply_point(m, p):
    """Apply to points (..., 3), with perspective divide."""
    r = _linear3(m[:3, :3], p) + m[:3, 3]
    w = (p * m[3, :3]).sum(-1, keepdims=True) + m[3, 3]
    return r / w


def apply_vector(m, v):
    return _linear3(m[:3, :3], v)


def apply_normal(m, n):
    """Normals transform by the inverse transpose of the linear part."""
    inv = jnp.linalg.inv(m[:3, :3])
    return _linear3(inv.T, n)

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


# ---------------------------------------------------------------------------
# AnimatedTransform (transform.h AnimatedTransform: keyframed rigid
# transforms, decomposed into translation / rotation quaternion / scale
# and interpolated per-ray by time — lerp + slerp + lerp)
# ---------------------------------------------------------------------------


def _mat_to_quat(r):
    """(3,3) rotation -> (4,) quaternion (w, x, y, z); branch-free
    Shepperd variant adequate for proper rotations."""
    m00, m01, m02 = r[0, 0], r[0, 1], r[0, 2]
    m10, m11, m12 = r[1, 0], r[1, 1], r[1, 2]
    m20, m21, m22 = r[2, 0], r[2, 1], r[2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically largest pivot
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    qx = jnp.copysign(qx, m21 - m12)
    qy = jnp.copysign(qy, m02 - m20)
    qz = jnp.copysign(qz, m10 - m01)
    q = jnp.stack([qw, qx, qy, qz])
    return q / jnp.maximum(jnp.sqrt(jnp.sum(q * q)), 1e-12)


def _quat_to_mat(q):
    """(..., 4) quaternion (w,x,y,z) -> (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                    2 * (x * z + y * w)], -1)
    r1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                    2 * (y * z - x * w)], -1)
    r2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                    1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], -2)


def _slerp(q0, q1, u):
    """Spherical lerp of (..., 4) quats by (...,) weights."""
    d = jnp.sum(q0 * q1, -1)
    q1 = jnp.where(d[..., None] < 0.0, -q1, q1)
    d = jnp.abs(d)
    # fall back to nlerp when nearly parallel
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    st = jnp.sin(theta)
    near = st < 1e-4
    w0 = jnp.where(near, 1.0 - u, jnp.sin((1.0 - u) * theta)
                   / jnp.where(near, 1.0, st))
    w1 = jnp.where(near, u, jnp.sin(u * theta)
                   / jnp.where(near, 1.0, st))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.maximum(
        jnp.sqrt(jnp.sum(q * q, -1, keepdims=True)), 1e-12)


from .pytree import pytree as _pytree  # noqa: E402


@_pytree
class AnimatedTransform:
    """Keyframed affine transform, per-ray time interpolation
    (transform.h AnimatedTransform / Transform::interpolate)."""

    times: jnp.ndarray    # (K,)
    trans: jnp.ndarray    # (K, 3)
    quats: jnp.ndarray    # (K, 4) sign-aligned
    scales: jnp.ndarray   # (K, 3)

    @staticmethod
    def create(times, matrices):
        """times: (K,), matrices: (K, 4, 4) (no shear)."""
        import numpy as np

        mats = np.asarray(matrices, np.float32)
        K = mats.shape[0]
        tr = mats[:, :3, 3]
        sc = np.linalg.norm(mats[:, :3, :3], axis=1)  # column norms
        quats = []
        prev = None
        for k in range(K):
            r = mats[k, :3, :3] / np.maximum(sc[k][None, :], 1e-12)
            q = np.asarray(_mat_to_quat(jnp.asarray(r)))
            if prev is not None and float(np.dot(prev, q)) < 0.0:
                q = -q
            quats.append(q)
            prev = q
        return AnimatedTransform(
            times=jnp.asarray(times, jnp.float32),
            trans=jnp.asarray(tr),
            quats=jnp.asarray(np.stack(quats)),
            scales=jnp.asarray(sc))

    def eval(self, time):
        """(N,) times -> (N, 4, 4) interpolated matrices."""
        K = self.times.shape[0]
        i0 = jnp.clip(
            jnp.searchsorted(self.times, time, side="right") - 1,
            0, max(K - 2, 0))
        i1 = jnp.minimum(i0 + 1, K - 1)
        t0 = self.times[i0]
        t1 = self.times[i1]
        u = jnp.clip((time - t0) / jnp.maximum(t1 - t0, 1e-12),
                     0.0, 1.0)
        tr = (1.0 - u)[..., None] * self.trans[i0] \
            + u[..., None] * self.trans[i1]
        sc = (1.0 - u)[..., None] * self.scales[i0] \
            + u[..., None] * self.scales[i1]
        q = _slerp(self.quats[i0], self.quats[i1], u)
        rot = _quat_to_mat(q) * sc[..., None, :]
        m = jnp.concatenate([rot, tr[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0]), m.shape[:-2] + (1, 4))
        return jnp.concatenate([m, bottom], axis=-2)

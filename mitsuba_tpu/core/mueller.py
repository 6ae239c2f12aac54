"""Mueller/Stokes calculus for polarized light transport.

Reference: include/mitsuba/render/mueller.h (element matrices, basis
rotations) and include/mitsuba/render/fresnel.h:150-283
(``fresnel_polarized``).  Conventions follow the reference exactly:

- A Stokes vector ``s = [S0, S1, S2, S3]`` travelling along ``forward``
  is implicitly expressed in the basis ``stokes_basis(forward)``
  (the first axis of the Duff coordinate system, mueller.h:284).
- Mueller matrices are (..., 4, 4) jnp arrays; broadcast batching puts
  channels (when present) in leading dims, e.g. (N, 3, 4, 4), so chains
  compose with ``A @ B`` / ``apply_stokes``.
- ``rotator(theta)`` rotates the Stokes *reference frame*
  counter-clockwise when facing the beam (Collett Ch.5 eq. 43).
"""
from __future__ import annotations

import jax.numpy as jnp

from .math import coordinate_system


def _mat(rows):
    """Stack a 4x4 of broadcastable scalars into (..., 4, 4)."""
    rows = [[jnp.asarray(e, jnp.float32) for e in r] for r in rows]
    shape = jnp.broadcast_shapes(*[e.shape for r in rows for e in r])
    return jnp.stack(
        [jnp.stack([jnp.broadcast_to(e, shape) for e in r], axis=-1)
         for r in rows], axis=-2)


def apply_stokes(M, s):
    """(..., 4, 4) @ (..., 4) -> (..., 4)."""
    return jnp.einsum("...ij,...j->...i", M, s)


def unpolarized_stokes(intensity):
    """Unpolarized Stokes vector [I, 0, 0, 0] from (...,) intensity."""
    i = jnp.asarray(intensity, jnp.float32)
    z = jnp.zeros_like(i)
    return jnp.stack([i, z, z, z], axis=-1)


def depolarizer(value=1.0):
    """Ideal depolarizer (mueller.h:37)."""
    v = jnp.asarray(value, jnp.float32)
    z = jnp.zeros_like(v)
    return _mat([[v, z, z, z], [z, z, z, z], [z, z, z, z], [z, z, z, z]])


def absorber(value):
    """Ideal absorber = scalar attenuation (mueller.h:50)."""
    v = jnp.asarray(value, jnp.float32)
    return jnp.eye(4, dtype=jnp.float32) * v[..., None, None]


def linear_polarizer(value=1.0):
    """Horizontal linear polarizer (mueller.h:65, Collett Ch.5 eq.13)."""
    a = 0.5 * jnp.asarray(value, jnp.float32)
    z = jnp.zeros_like(a)
    return _mat([[a, a, z, z], [a, a, z, z], [z, z, z, z], [z, z, z, z]])


def linear_retarder(phase):
    """Linear retarder, fast axis horizontal (mueller.h:91, Goldstein
    3rd ed. eq. 6.43)."""
    p = jnp.asarray(phase, jnp.float32)
    s, c = jnp.sin(p), jnp.cos(p)
    o = jnp.ones_like(p)
    z = jnp.zeros_like(p)
    return _mat([[o, z, z, z], [z, o, z, z], [z, z, c, s], [z, z, -s, c]])


def right_circular_polarizer():
    """mueller.h:108 (Chipman Table 6.2)."""
    h = jnp.float32(0.5)
    z = jnp.float32(0.0)
    return _mat([[h, z, z, h], [z, z, z, z], [z, z, z, z], [h, z, z, h]])


def left_circular_polarizer():
    """mueller.h:123."""
    h = jnp.float32(0.5)
    z = jnp.float32(0.0)
    return _mat([[h, z, z, -h], [z, z, z, z], [z, z, z, z],
                 [-h, z, z, h]])


def diattenuator(x, y):
    """Attenuate the 0/90-degree field components by x/y (mueller.h:138)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    a = 0.5 * (x + y)
    b = 0.5 * (x - y)
    c = jnp.sqrt(jnp.maximum(x * y, 0.0))
    z = jnp.zeros_like(a)
    return _mat([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]])


def rotator(theta):
    """Reference-frame rotator by theta radians (mueller.h:164)."""
    t = jnp.asarray(theta, jnp.float32)
    s, c = jnp.sin(2.0 * t), jnp.cos(2.0 * t)
    o = jnp.ones_like(t)
    z = jnp.zeros_like(t)
    return _mat([[o, z, z, z], [z, c, s, z], [z, -s, c, z], [z, z, z, o]])


def rotated_element(theta, M):
    """Element M rotated counter-clockwise by theta (mueller.h:179)."""
    R = rotator(theta)
    return jnp.swapaxes(R, -1, -2) @ M @ R


# --------------------------------------------------------------- fresnel

def fresnel_polarized(cos_theta_i, eta):
    """Polarized Fresnel amplitudes (fresnel.h:150 real / :227 complex).

    ``eta`` may be real or complex (conductor; the kappa sign is
    flipped internally to the optics convention).  Returns
    (a_s, a_p, cos_theta_t, eta_it, eta_ti) with a_s/a_p complex64.
    """
    ci = jnp.asarray(cos_theta_i, jnp.float32)
    eta = jnp.asarray(eta)
    complex_eta = jnp.iscomplexobj(eta)
    if complex_eta:
        eta = jnp.where(eta.imag > 0.0, eta.conj(), eta).astype(
            jnp.complex64)
    else:
        eta = eta.astype(jnp.float32)
    outside = ci >= 0.0
    rcp = 1.0 / eta
    eta_it = jnp.where(outside, eta, rcp)
    eta_ti = jnp.where(outside, rcp, eta)

    ctt_sqr = 1.0 - eta_ti * eta_ti * (1.0 - ci * ci)
    ci_abs = jnp.abs(ci)
    ctt = jnp.sqrt(ctt_sqr.astype(jnp.complex64))
    # sign of the root matters for the TIR phase (Clarke, "Stellar
    # Polarimetry" A.2)
    sgn = jnp.where(jnp.real(ctt_sqr) >= 0.0, 1.0, -1.0)
    ctt = ctt * sgn

    a_s = (ci_abs - eta_it * ctt) / (ci_abs + eta_it * ctt)
    a_p = (eta_it * ci_abs - ctt) / (eta_it * ci_abs + ctt)

    if complex_eta:
        matched = (jnp.abs(eta) ** 2 == 1.0) & (eta.imag == 0.0)
        invalid = jnp.abs(eta) ** 2 == 0.0
    else:
        matched = eta == 1.0
        invalid = eta == 0.0
    bad = matched | invalid
    a_s = jnp.where(bad, 0.0, a_s)
    a_p = jnp.where(bad, 0.0, a_p)

    ctt_signed = jnp.where(
        jnp.real(ctt_sqr) >= 0.0,
        -jnp.sign(ci) * jnp.abs(jnp.real(ctt)), 0.0)
    return a_s, a_p, ctt_signed, eta_it, eta_ti


def _sincos_arg_diff(a_p, a_s):
    """sin/cos of delta = arg(a_p) - arg(a_s) without atan2."""
    z = a_p * jnp.conj(a_s)
    n = jnp.abs(z)
    safe = jnp.maximum(n, 1e-20)
    return jnp.imag(z) / safe, jnp.real(z) / safe


def specular_reflection(cos_theta_i, eta):
    """Mueller matrix of specular reflection (mueller.h:198), expressed
    in the s/p basis (reference vector perpendicular to the plane of
    incidence)."""
    a_s, a_p, _, _, _ = fresnel_polarized(cos_theta_i, eta)
    sin_d, cos_d = _sincos_arg_diff(a_p, a_s)
    r_s = jnp.abs(a_s) ** 2
    r_p = jnp.abs(a_p) ** 2
    a = 0.5 * (r_s + r_p)
    b = 0.5 * (r_s - r_p)
    c = jnp.sqrt(jnp.maximum(r_s * r_p, 0.0))
    zero_c = c == 0.0
    sin_d = jnp.where(zero_c, 0.0, sin_d)
    cos_d = jnp.where(zero_c, 0.0, cos_d)
    z = jnp.zeros_like(a)
    return _mat([[a, b, z, z], [b, a, z, z],
                 [z, z, c * cos_d, -c * sin_d],
                 [z, z, c * sin_d, c * cos_d]])


def specular_transmission(cos_theta_i, eta):
    """Mueller matrix of specular transmission through a dielectric
    interface (mueller.h:238), s/p basis."""
    a_s, a_p, cos_theta_t, eta_it, eta_ti = fresnel_polarized(
        cos_theta_i, jnp.asarray(eta, jnp.float32))
    ci = jnp.asarray(cos_theta_i, jnp.float32)
    factor = -eta_it * jnp.where(jnp.abs(ci) > 1e-8,
                                 cos_theta_t / jnp.where(
                                     jnp.abs(ci) > 1e-8, ci, 1.0), 0.0)
    a_s_r = 1.0 + jnp.real(a_s)
    a_p_r = (1.0 + jnp.real(a_p)) * eta_ti
    t_s = a_s_r * a_s_r
    t_p = a_p_r * a_p_r
    a = 0.5 * factor * (t_s + t_p)
    b = 0.5 * factor * (t_s - t_p)
    c = factor * jnp.sqrt(jnp.maximum(t_s * t_p, 0.0))
    z = jnp.zeros_like(a)
    return _mat([[a, b, z, z], [b, a, z, z], [z, z, c, z], [z, z, z, c]])


# --------------------------------------------------------- basis handling

def stokes_basis(forward):
    """Implicit Stokes reference basis for a direction (mueller.h:285)."""
    return coordinate_system(forward)[0]


def unit_angle(u, v):
    """Numerically robust angle between unit vectors."""
    d = jnp.sqrt(jnp.sum((v - u) ** 2, axis=-1))
    return 2.0 * jnp.arcsin(jnp.clip(0.5 * d, 0.0, 1.0))


def _normalize(v):
    return v / jnp.maximum(
        jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True)), 1e-20)


def rotate_stokes_basis(forward, basis_current, basis_target):
    """Mueller matrix changing a Stokes frame (mueller.h:312)."""
    bc = _normalize(basis_current)
    bt = _normalize(basis_target)
    theta = unit_angle(bc, bt)
    flip = jnp.sum(forward * jnp.cross(basis_current, basis_target),
                   axis=-1) < 0.0
    theta = jnp.where(flip, -theta, theta)
    return rotator(theta)


def rotate_mueller_basis(M, in_forward, in_basis_current, in_basis_target,
                         out_forward, out_basis_current, out_basis_target):
    """Re-express M under new in/out Stokes bases (mueller.h:361)."""
    r_in = rotate_stokes_basis(in_forward, in_basis_current,
                               in_basis_target)
    r_out = rotate_stokes_basis(out_forward, out_basis_current,
                                out_basis_target)
    return r_out @ M @ jnp.swapaxes(r_in, -1, -2)


def rotate_mueller_basis_collinear(M, forward, basis_current,
                                   basis_target):
    """Same rotation applied to both frames (mueller.h:400)."""
    r = rotate_stokes_basis(forward, basis_current, basis_target)
    return r @ M @ jnp.swapaxes(r, -1, -2)

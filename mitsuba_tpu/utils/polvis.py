"""Stokes-image false-color visualization (reference polvis.py).

Takes the per-component images produced by ``StokesIntegrator``
(``render_aov`` keys S0..S3, each (H, W, 3)) and produces the
reference's visualization set: intensity, per-component red/green
false color, degree of polarization, type of polarization
(cyan = linear, yellow = circular), and virtual-polarizer intensity.
"""
from __future__ import annotations

import numpy as np


def _safe_div(a, b):
    return np.divide(a, b, out=np.zeros_like(a), where=b != 0)


def polvis(stokes, normalize=False, overlay=False):
    """stokes: dict with keys 'S0'..'S3' of (H, W, 3) arrays (or an
    (H, W, 3, 4) array).  Returns a dict of (H, W, 3) RGB float images:
    intensity, s1, s2, s3, dop, top (polvis.py:52-120)."""
    if not isinstance(stokes, dict):
        stokes = {f"S{i}": np.asarray(stokes[..., i]) for i in range(4)}
    comp = [np.mean(np.asarray(stokes[f"S{i}"]), axis=-1)
            for i in range(4)]
    s0, s1, s2, s3 = comp
    s12 = np.sqrt(np.maximum(0.0, s1**2 + s2**2))
    s123 = np.sqrt(np.maximum(0.0, s1**2 + s2**2 + s3**2))
    dop = _safe_div(s123, s0)
    rdop_l = _safe_div(s12, s123)
    rdop_c = _safe_div(np.abs(s3), s123)
    bw = np.dstack([s0, s0, s0])

    out = {"intensity": np.asarray(stokes["S0"])}
    for name, c in (("s1", s1), ("s2", s2), ("s3", s3)):
        tmp = _safe_div(c, s0) if normalize else c
        img = np.dstack([np.maximum(0.0, -tmp), np.maximum(0.0, tmp),
                         np.zeros_like(tmp)])
        if overlay:
            a = dop[..., None]
            img = img * a + bw * (1.0 - a)
        out[name] = img
    z = np.zeros_like(s0)
    out["dop"] = np.dstack([dop, z, z])
    out["top"] = (np.dstack([rdop_c, rdop_l + rdop_c, rdop_l])
                  * dop[..., None])
    return out


def apply_polarizer(stokes, angle_deg):
    """Intensity after a linear polarizer at ``angle_deg``
    (polvis.py:27-41).  stokes: dict S0..S3 of (H, W, 3)."""
    import jax.numpy as jnp

    from ..core import mueller

    lp = np.asarray(mueller.rotated_element(
        jnp.asarray(np.radians(angle_deg), jnp.float32),
        mueller.linear_polarizer(1.0)))
    s = np.stack([np.asarray(stokes[f"S{i}"]) for i in range(4)],
                 axis=-1)                         # (H, W, 3, 4)
    return np.einsum("j,hwcj->hwc", lp[0], s)

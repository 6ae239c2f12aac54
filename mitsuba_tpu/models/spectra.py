"""Spectrum plugins: wavelength-dependent scalar values.

Reference: src/spectra/{uniform,regular,irregular,srgb,d65,blackbody}.cpp
(128-320 LoC each).  Each plugin exposes ``eval(lambda_nm) -> value`` and
``to_rgb() -> (3,)`` (the RGB-mode collapse used when a spectrum is fed
to an RGB pipeline component, matching the reference's variant-dependent
Properties conversion).

The spectral path here is the hero-wavelength mode (core/spectrum.py):
dispersive BSDFs and the spectral ptracer/realistic-lens sensors consume
eval() per lane; everything else consumes to_rgb().
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core.spectrum import (
    LAMBDA_MAX,
    LAMBDA_MIN,
    cie1931_xyz,
    rgb_response,
)

_GRID = jnp.linspace(LAMBDA_MIN, LAMBDA_MAX, 81)


def _response_rgb(eval_fn):
    """Numerically integrate eval(lambda) * rgb_response over the visible
    range (midpoint rule on an 81-node grid)."""
    vals = eval_fn(_GRID)
    resp = rgb_response(_GRID)
    dl = (LAMBDA_MAX - LAMBDA_MIN) / (_GRID.shape[0] - 1)
    return jnp.sum(vals[:, None] * resp, axis=0) * dl


def _response_rgb_flat(eval_fn):
    """Same integral against the flat-normalized response — the one the
    hero-wavelength estimators apply (core/spectrum.rgb_response_flat),
    so fitted rgb2spec spectra round-trip exactly."""
    from ..core.spectrum import rgb_response_flat

    vals = eval_fn(_GRID)
    resp = rgb_response_flat(_GRID)
    dl = (LAMBDA_MAX - LAMBDA_MIN) / (_GRID.shape[0] - 1)
    return jnp.sum(vals[:, None] * resp, axis=0) * dl


@pytree
class UniformSpectrum:
    """Constant over wavelength (src/spectra/uniform.cpp)."""

    value: jnp.ndarray  # ()
    id: str = static("uniform")

    def eval(self, lam_nm):
        return jnp.broadcast_to(self.value, jnp.shape(lam_nm))

    def to_rgb(self):
        return jnp.full((3,), self.value)


@pytree
class RegularSpectrum:
    """Uniformly spaced samples over [lambda_min, lambda_max] with linear
    interpolation (src/spectra/regular.cpp)."""

    values: jnp.ndarray        # (N,)
    lambda_min: float = static(float(LAMBDA_MIN))
    lambda_max: float = static(float(LAMBDA_MAX))
    id: str = static("regular")

    def eval(self, lam_nm):
        n = self.values.shape[0]
        t = (lam_nm - self.lambda_min) / (self.lambda_max - self.lambda_min)
        t = t * (n - 1)
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
        f = jnp.clip(t - i, 0.0, 1.0)
        v = self.values[i] * (1 - f) + self.values[i + 1] * f
        inside = (lam_nm >= self.lambda_min) & (lam_nm <= self.lambda_max)
        return jnp.where(inside, v, 0.0)

    def to_rgb(self):
        return _response_rgb(self.eval)


@pytree
class IrregularSpectrum:
    """Arbitrary (sorted) wavelength nodes with linear interpolation
    (src/spectra/irregular.cpp)."""

    wavelengths: jnp.ndarray  # (N,) nm, sorted
    values: jnp.ndarray       # (N,)
    id: str = static("irregular")

    def eval(self, lam_nm):
        lam = jnp.asarray(lam_nm)
        i = jnp.clip(
            jnp.searchsorted(self.wavelengths, lam, side="right") - 1,
            0, self.wavelengths.shape[0] - 2,
        )
        x0 = self.wavelengths[i]
        x1 = self.wavelengths[i + 1]
        f = jnp.clip((lam - x0) / jnp.maximum(x1 - x0, 1e-9), 0.0, 1.0)
        v = self.values[i] * (1 - f) + self.values[i + 1] * f
        inside = (lam >= self.wavelengths[0]) & (lam <= self.wavelengths[-1])
        return jnp.where(inside, v, 0.0)

    def to_rgb(self):
        return _response_rgb(self.eval)


def _rgb2spec_fit(rgb):
    """Jakob-Hanika 2019 sigmoid-polynomial fit (the reference's
    rgb2spec model, srgb.cpp:14-32 + ext/rgb2spec): Gauss-Newton on the
    3 coefficients of S(x) = sigmoid(c0 x^2 + c1 x + c2) so that
    integrating S against this renderer's rgb response recovers the
    target color exactly.  Host-side numpy (runs once per color at
    scene build, like the reference's table fetch).  Returns
    (coeff (3,), scale ()) with colors > 1 handled by scaling."""
    from ..core.spectrum import rgb_response_flat

    rgb = np.asarray(jax.lax.stop_gradient(rgb), np.float64).reshape(3)
    scale = max(float(rgb.max()), 1e-8)
    target = np.clip(rgb / scale, 0.0, 1.0)

    lam = np.linspace(380.0, 780.0, 161)
    x = (lam - 380.0) / 400.0 - 0.5              # conditioned abscissa
    resp = np.asarray(rgb_response_flat(jnp.asarray(lam)), np.float64)
    wq = np.gradient(lam)                         # trapezoid weights
    basis = resp * wq[:, None]                    # (L, 3)
    A = np.stack([x * x, x, np.ones_like(x)], axis=1)   # (L, 3)

    def sigmoid(t):
        return 0.5 + 0.5 * t / np.sqrt(1.0 + t * t)

    # Levenberg-Marquardt (plain Gauss-Newton overshoots the sigmoid's
    # flat tails)
    c = np.zeros(3)
    lm = 1e-4
    r = basis.T @ sigmoid(A @ c) - target
    for _ in range(200):
        t = A @ c
        dsig = 0.5 / np.power(1.0 + t * t, 1.5)   # d sigmoid / dt
        J = basis.T @ (dsig[:, None] * A)         # (3, 3)
        try:
            step = np.linalg.solve(J + lm * np.eye(3), r)
        except np.linalg.LinAlgError:
            break
        c2 = c - step
        r2 = basis.T @ sigmoid(A @ c2) - target
        if np.abs(r2).sum() < np.abs(r).sum():
            c, r = c2, r2
            lm = max(lm * 0.5, 1e-9)
        else:
            lm = min(lm * 10.0, 1e12)
        if np.abs(r).max() < 1e-7:
            break
    return (jnp.asarray(c, jnp.float32),
            jnp.asarray(scale, jnp.float32))


@pytree
class SRGBSpectrum:
    """Smooth spectrum reproducing an sRGB color (src/spectra/srgb.cpp).

    ``create`` fits the reference's rgb2spec sigmoid-polynomial model
    (Jakob-Hanika 2019) host-side; ``coeff``/``scale`` are then the
    differentiable leaves, like the reference's fetched coefficients.
    A bare ``SRGBSpectrum(rgb=...)`` (no fit) falls back to the smooth
    CIE-response-basis expansion, which stays differentiable in
    ``rgb``."""

    rgb: jnp.ndarray  # (3,)
    coeff: jnp.ndarray = None   # (3,) sigmoid-polynomial coefficients
    scale: jnp.ndarray = None   # () brightness for colors outside [0,1]
    id: str = static("srgb")

    @staticmethod
    def create(rgb):
        rgb = jnp.asarray(rgb, jnp.float32)
        coeff, scale = _rgb2spec_fit(rgb)
        return SRGBSpectrum(rgb=rgb, coeff=coeff, scale=scale)

    def eval(self, lam_nm):
        if self.coeff is None:
            basis = rgb_response(lam_nm)                 # (..., 3)
            norm = _response_rgb(lambda l: jnp.ones(jnp.shape(l)))
            return jnp.sum(basis * (self.rgb / norm), axis=-1)
        x = (jnp.asarray(lam_nm) - 380.0) / 400.0 - 0.5
        t = (self.coeff[0] * x + self.coeff[1]) * x + self.coeff[2]
        return self.scale * (0.5 + 0.5 * t / jnp.sqrt(1.0 + t * t))

    def to_rgb(self):
        if self.coeff is None:
            return self.rgb
        return _response_rgb_flat(self.eval)


# CIE standard illuminant D65, 300-780 nm at 10 nm (relative SPD,
# normalized to 100 at 560 nm; public CIE table)
_D65 = np.array([
    0.0341, 1.6643, 3.2945, 11.7652, 20.236, 28.6447, 37.0535, 38.5011,
    39.9488, 42.4302, 44.9117, 45.775, 46.6383, 49.3637, 52.0891, 51.0323,
    49.9755, 52.3118, 54.6482, 68.7015, 82.7549, 87.1204, 91.486, 92.4589,
    93.4318, 90.057, 86.6823, 95.7736, 104.865, 110.936, 117.008, 117.41,
    117.812, 116.336, 114.861, 115.392, 115.923, 112.367, 108.811, 109.082,
    109.354, 108.578, 107.802, 106.296, 104.79, 106.239, 107.689, 106.047,
    104.405, 104.225, 104.046, 102.023, 100.0, 98.1671, 96.3342, 96.0611,
    95.788, 92.2368, 88.6856, 89.3459, 90.0062, 89.8026, 89.5991, 88.6489,
    87.6987, 85.4936, 83.2886, 83.4939, 83.6992, 81.863, 80.0268, 80.1207,
    80.2146, 81.2462, 82.2778, 80.281, 78.2842, 74.0027, 69.7213, 70.6652,
    71.6091, 72.979, 74.349, 67.9765, 61.604, 65.7448, 69.8856, 72.4863,
    75.087, 69.3398, 63.5927, 55.0054, 46.4182, 56.6118, 66.8054, 65.0941,
    63.3828,
], np.float32)
_D65_L0, _D65_L1 = 300.0, 780.0


@pytree
class D65Spectrum:
    """CIE D65 daylight illuminant (src/spectra/d65.cpp); ``scale``
    multiplies the (560nm = 1) normalized SPD."""

    scale: jnp.ndarray = None  # ()
    id: str = static("d65")

    def __post_init__(self):
        if self.scale is None:
            object.__setattr__(self, "scale", jnp.asarray(1.0))

    def eval(self, lam_nm):
        tab = jnp.asarray(_D65 / 100.0)
        n = tab.shape[0]
        t = (lam_nm - _D65_L0) / (_D65_L1 - _D65_L0) * (n - 1)
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
        f = jnp.clip(t - i, 0.0, 1.0)
        v = tab[i] * (1 - f) + tab[i + 1] * f
        inside = (lam_nm >= _D65_L0) & (lam_nm <= _D65_L1)
        return self.scale * jnp.where(inside, v, 0.0)

    def to_rgb(self):
        return _response_rgb(self.eval)


@pytree
class BlackbodySpectrum:
    """Planck radiator at ``temperature`` K (src/spectra/blackbody.cpp);
    radiance in W/(m^2 sr nm) scaled by 1e-9 like the reference's units."""

    temperature: jnp.ndarray  # ()
    id: str = static("blackbody")

    def eval(self, lam_nm):
        lam_m = jnp.asarray(lam_nm) * 1e-9
        h = 6.62607015e-34
        c = 2.99792458e8
        kb = 1.380649e-23
        num = 2.0 * h * c * c / jnp.maximum(lam_m ** 5, 1e-45)
        expo = h * c / (lam_m * kb * jnp.maximum(self.temperature, 1.0))
        return num / jnp.expm1(jnp.clip(expo, 1e-6, 80.0)) * 1e-9

    def to_rgb(self):
        return _response_rgb(self.eval)

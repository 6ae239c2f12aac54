"""Dispersive optical-glass materials.

Reference: src/sensors/realisticlens.cpp:148-241 [FORK] DispersiveMaterial —
Cauchy model n(lambda) = A + B/lambda^2 or 3-term Sellmeier
n^2 = 1 + sum Bi*l^2/(l^2 - Ci), wavelengths in MICROMETERS.

Cauchy A/B are differentiable leaves — the lens-design workflow optimizes
glass dispersion directly (notebooks/scripts/lens_design/lens.py:252
LensMaterial).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static

NOMINAL_WAVELENGTH_UM = 0.5893  # sodium d-line; realisticlens.cpp:176


@pytree
class DispersiveMaterial:
    cauchy: jnp.ndarray       # (2,) A, B  (Cauchy mode)
    sellmeier_B: jnp.ndarray  # (3,)
    sellmeier_C: jnp.ndarray  # (3,)
    use_cauchy: bool = static(True)
    name: str = static("")

    @staticmethod
    def cauchy_material(name, A, B):
        return DispersiveMaterial(
            cauchy=jnp.asarray([A, B], jnp.float32),
            sellmeier_B=jnp.zeros(3),
            sellmeier_C=jnp.zeros(3),
            use_cauchy=True,
            name=name,
        )

    @staticmethod
    def sellmeier_material(name, B, C):
        return DispersiveMaterial(
            cauchy=jnp.zeros(2),
            sellmeier_B=jnp.asarray(B, jnp.float32),
            sellmeier_C=jnp.asarray(C, jnp.float32),
            use_cauchy=False,
            name=name,
        )

    def ior(self, wavelength_um):
        """IOR at wavelength(s) in micrometers (realisticlens.cpp:183)."""
        lam2 = jnp.square(wavelength_um)
        if self.use_cauchy:
            return self.cauchy[0] + self.cauchy[1] / lam2
        n2 = 1.0
        for i in range(3):
            n2 = n2 + self.sellmeier_B[i] * lam2 / (lam2 - self.sellmeier_C[i])
        return jnp.sqrt(n2)

    def ior_from_ray(self, ray):
        """IOR for a ray: first carried wavelength (nm -> um), or the
        nominal 589.3nm when the ray is non-spectral
        (realisticlens.cpp:169-180)."""
        if ray.wavelengths.shape[-1] == 0:
            lam = jnp.full(ray.o.shape[:-1], NOMINAL_WAVELENGTH_UM)
        else:
            lam = 0.001 * ray.wavelengths[..., 0]
        return self.ior(lam)

    def abbe_number(self):
        nd = self.ior(jnp.asarray(0.58756))
        nf = self.ior(jnp.asarray(0.4861))
        nc = self.ior(jnp.asarray(0.6563))
        return (nd - 1.0) / (nf - nc)


AIR = DispersiveMaterial.cauchy_material("Air", 1.000277, 0.0)
NBK7 = DispersiveMaterial.cauchy_material("NBK7", 1.5046, 0.00420)

"""Optimizable lens surface sag functions.

Reference: notebooks/scripts/lens_design/lens.py:26-250 [FORK] —
``Surface``/``ConicSurface``/``EvenAsphericSurface`` with dimensionless
parameterization (curvature stored as c*radial_extent so optimizer steps
are scale-free, lens.py:55-63).

Sag convention (lens.py:70-85): z(r) = z0 - R*sag_(r/R) with the film at
z=0 and +z toward object space; surfaces bulge toward -z for positive c.
All params are differentiable jnp leaves.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static

_F = lambda x: jnp.asarray(x, jnp.float32)


@pytree
class ConicSurface:
    radial_extent: float = static(1.0)
    c: jnp.ndarray = None     # () DIMENSIONLESS curvature (c_dim*R)
    K: jnp.ndarray = None     # () conic constant
    z0: jnp.ndarray = None    # () axial position

    @staticmethod
    def create(radial_extent, c, K, z0):
        """c here is the DIMENSIONAL curvature 1/mm (lens.py:56 scales)."""
        return ConicSurface(
            radial_extent=float(radial_extent),
            c=_F(c * radial_extent), K=_F(K), z0=_F(z0),
        )

    @property
    def params(self):
        return {"c": self.c, "K": self.K, "z0": self.z0}

    def with_params(self, p):
        return self.replace(**{k: _F(v) for k, v in p.items()
                               if k in ("c", "K", "z0")})

    def curvature(self):
        """Dimensional curvature 1/mm (lens.py get_curvature)."""
        return self.c / self.radial_extent

    def sag(self, x, y):
        """z(x, y) in camera coordinates (lens.py:70-85 compute_z_dr)."""
        r2 = (jnp.square(x) + jnp.square(y)) / self.radial_extent**2
        safe = jnp.clip(
            1.0 - (1.0 + self.K) * jnp.square(self.c) * r2, 1e-12, jnp.inf
        )
        return self.z0 - self.radial_extent * r2 * self.c / (
            1.0 + jnp.sqrt(safe)
        )


@pytree
class EvenAsphericSurface:
    radial_extent: float = static(1.0)
    c: jnp.ndarray = None     # () dimensionless curvature
    K: jnp.ndarray = None
    z0: jnp.ndarray = None
    ai: jnp.ndarray = None    # (7,) dimensionless a4..a16

    @staticmethod
    def create(radial_extent, c, K, z0, a4=0.0, a6=0.0, a8=0.0, a10=0.0,
               a12=0.0, a14=0.0, a16=0.0):
        """Coefficients given in dimensional units (mm^-(2i+3)); stored
        dimensionless against the radial extent (lens.py:166-215)."""
        R = float(radial_extent)
        a_dim = [a4, a6, a8, a10, a12, a14, a16]
        ai = jnp.asarray(
            [a * R ** (2 * i + 3) for i, a in enumerate(a_dim)], jnp.float32
        )
        return EvenAsphericSurface(
            radial_extent=R, c=_F(c * R), K=_F(K), z0=_F(z0), ai=ai,
        )

    @property
    def params(self):
        return {"c": self.c, "K": self.K, "z0": self.z0, "ai": self.ai}

    def with_params(self, p):
        return self.replace(**{k: _F(v) for k, v in p.items()
                               if k in ("c", "K", "z0", "ai")})

    def curvature(self):
        return self.c / self.radial_extent

    def sag(self, x, y):
        r2 = (jnp.square(x) + jnp.square(y)) / self.radial_extent**2
        safe = jnp.clip(
            1.0 - (1.0 + self.K) * jnp.square(self.c) * r2, 1e-12, jnp.inf
        )
        conic = r2 * self.c / (1.0 + jnp.sqrt(safe))
        poly = jnp.zeros_like(r2)
        for i in range(self.ai.shape[0] - 1, -1, -1):
            poly = poly * r2 + self.ai[i]
        return self.z0 - self.radial_extent * (conic + poly * r2**2)

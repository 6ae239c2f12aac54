"""Depth AOV integrator (reference: src/integrators/depth.cpp, 59 LoC)."""
from __future__ import annotations

import jax.numpy as jnp

from ...core.pytree import pytree, static
from ...core.records import Ray


@pytree
class DepthIntegrator:
    id: str = static("depth")

    def sample(self, scene, ray: Ray, lane, seed, active):
        si = scene.ray_intersect(ray, active)
        d = jnp.where(si.is_valid(), si.t, 0.0)
        return jnp.broadcast_to(d[:, None], d.shape + (3,))

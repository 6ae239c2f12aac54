"""Samplers (reference: src/samplers/*, sampler.h:64-172).

The TPU design replaces stateful per-lane PCG32 streams with the stateless
counter RNG (core/rng.py): a sampler here is *metadata* (sample count +
strategy) — the actual draws are pure functions of (seed, lane, dim), which
is what makes PRB replay and sharding-invariance possible.

``IndependentSampler`` reproduces src/samplers/independent.cpp semantics.
``StratifiedSampler`` stratifies the film-position dimension per pixel
(src/samplers/stratified.cpp): lane index within the pixel selects the
stratum; the in-stratum jitter comes from the counter RNG.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static


@pytree
class IndependentSampler:
    sample_count: int = static(16)
    id: str = static("independent")

    def film_jitter(self, u2, sample_in_pixel):
        """Uniform jitter in the pixel (u2 straight through)."""
        return u2


@pytree
class StratifiedSampler:
    """Stratified 2D film positions: spp strata on a ceil(sqrt(spp))^2 grid."""

    sample_count: int = static(16)
    id: str = static("stratified")

    def film_jitter(self, u2, sample_in_pixel):
        import math

        res = int(math.ceil(math.sqrt(self.sample_count)))
        sx = (sample_in_pixel % res).astype(jnp.float32)
        sy = (sample_in_pixel // res % res).astype(jnp.float32)
        base = jnp.stack([sx, sy], axis=-1)
        return (base + u2) / res

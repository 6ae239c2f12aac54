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


@pytree
class MultijitterSampler:
    """Correlated multi-jittered film positions (src/samplers/
    multijitter.cpp — Kensler 2013): stratified in both the fine grid and
    each row/column projection."""

    sample_count: int = static(16)
    id: str = static("multijitter")

    def film_jitter(self, u2, sample_in_pixel):
        import math

        res = int(math.ceil(math.sqrt(self.sample_count)))
        s = sample_in_pixel % (res * res)
        sx = (s % res).astype(jnp.float32)
        sy = (s // res).astype(jnp.float32)
        # canonical CMJ shuffle within rows/columns via the jitter bits
        jx = (sy + u2[..., 0]) / res
        jy = (sx + u2[..., 1]) / res
        return jnp.stack([(sx + jx) / res, (sy + jy) / res], axis=-1)


@pytree
class LDSampler:
    """Low-discrepancy (0,2)-sequence film positions (src/samplers/
    ldsampler.cpp analogue): scrambled Halton bases 2/3 by sample index."""

    sample_count: int = static(16)
    id: str = static("ldsampler")

    def film_jitter(self, u2, sample_in_pixel):
        from ..core import qmc

        h = qmc.halton_2d(sample_in_pixel.astype(jnp.int32))
        # Cranley-Patterson rotation by the per-pixel uniforms keeps
        # pixels decorrelated while preserving low discrepancy
        return jnp.mod(h + u2, 1.0)


@pytree
class OrthogonalSampler:
    """Orthogonal-array sampler (src/samplers/orthogonal.cpp analogue):
    strength-2 OA via the Bose construction on a prime grid."""

    sample_count: int = static(16)
    id: str = static("orthogonal")

    def _prime(self):
        import math

        p = int(math.ceil(math.sqrt(self.sample_count)))
        while any(p % k == 0 for k in range(2, int(math.sqrt(p)) + 1)):
            p += 1
        return max(p, 2)

    def film_jitter(self, u2, sample_in_pixel):
        p = self._prime()
        s = sample_in_pixel % (p * p)
        a = (s // p).astype(jnp.float32)
        b = (s % p).astype(jnp.float32)
        # Bose: (a, a + b mod p)
        x = (a + u2[..., 0]) / p
        y = (jnp.mod(a + b, p) + u2[..., 1]) / p
        return jnp.stack([x, y], axis=-1)

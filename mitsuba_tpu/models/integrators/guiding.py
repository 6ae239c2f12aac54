"""Guiding distributions for boundary (silhouette) sampling.

Reference: src/python/python/ad/guiding.py (566 LoC) — ``UniformDistr``,
``GridDistr`` and the octree ``OcSpaceDistr`` that importance-sample the
projective boundary integral.

TPU design: guiding state must be a fixed-shape pytree usable inside
jit.  ``UniformDistr`` samples edges by (detached) length.
``GridDistr`` learns a per-edge importance from a warm-up pass's
|boundary contribution| and resamples proportionally — the per-edge
table IS the grid here, since the boundary domain for meshes is the
edge set (the reference's screen-space grid maps to the same masses
through the projection).  The octree variant is future work; GridDistr
covers its role at the scales the tests exercise.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.distr import DiscreteDistribution
from ...core.pytree import pytree


@pytree
class UniformDistr:
    """Length-weighted uniform edge sampling."""

    distr: DiscreteDistribution

    @staticmethod
    def create(edge_lengths):
        return UniformDistr(
            distr=DiscreteDistribution.create(
                jax.lax.stop_gradient(edge_lengths)))

    def sample(self, u):
        """u (N,) -> (edge index, pdf wrt world length)."""
        idx, pmf = self.distr.sample_pmf(u)
        return idx, pmf

    def update(self, idx, mass):
        return self


@pytree
class GridDistr:
    """Importance over edges learned from observed |contribution| mass.

    ``update`` scatter-adds warm-up masses; ``finalize`` mixes with the
    length prior (defensive sampling) so unseen edges keep nonzero
    probability.
    """

    distr: DiscreteDistribution
    lengths: jnp.ndarray
    mass: jnp.ndarray

    @staticmethod
    def create(edge_lengths):
        el = jax.lax.stop_gradient(edge_lengths)
        return GridDistr(
            distr=DiscreteDistribution.create(el),
            lengths=el,
            mass=jnp.zeros_like(el),
        )

    def sample(self, u):
        idx, pmf = self.distr.sample_pmf(u)
        return idx, pmf

    def update(self, idx, mass):
        return self.replace(mass=self.mass.at[idx].add(mass))

    def finalize(self, defensive: float = 0.1):
        total = jnp.maximum(jnp.sum(self.mass), 1e-20)
        prior = self.lengths / jnp.maximum(jnp.sum(self.lengths), 1e-20)
        p = (1.0 - defensive) * self.mass / total + defensive * prior
        return self.replace(distr=DiscreteDistribution.create(p))

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
through the projection).  ``OcSpaceDistr`` (below) adds the octree
variant: adaptive spatial refinement of the 3D boundary-sample cloud
with per-cell mass, mirroring the reference's aabb-octree construction.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ...core.distr import DiscreteDistribution
from ...core.pytree import pytree, static


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


class _StaticArr:
    """Identity-hashed numpy holder for static pytree leaves."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = np.asarray(a)

    def __eq__(self, other):
        return self is other or (isinstance(other, _StaticArr)
                                 and self.a is other.a)

    def __hash__(self):
        return id(self.a)


@pytree
class OcSpaceDistr:
    """Octree-partitioned distribution over the boundary sample cube
    [0,1]^3 (reference guiding.py:141 OcSpaceDistr).

    TPU design: the adaptive build runs HOST-side in numpy from a
    warm-up pass's (sample point, |boundary contribution|) pairs — like
    the BVH, partitioning is data-dependent control flow that belongs
    off-device.  After the build the tree is a fixed-shape leaf table
    (aabb min/max + a DiscreteDistribution over clamped leaf masses),
    so sampling and pdf queries are jit-compatible: pick a leaf by
    mass, place the point uniformly inside it; pdf = pmf / volume.
    """

    leaf_min: jnp.ndarray     # (L, 3)
    leaf_max: jnp.ndarray     # (L, 3)
    distr: DiscreteDistribution
    n_leaves: int = static(0)

    @staticmethod
    def create_from_samples(points, masses, max_depth: int = 6,
                            max_leaf_count: int = 64,
                            clamp_input_mass_thres: float = 0.0,
                            clamp_mass_thres: float = 0.01,
                            prepartition_x_slices: int = 1,
                            defensive: float = 0.1):
        """Adaptive build (guiding.py:141 construct_octree semantics):
        split any node holding more than ``max_leaf_count`` warm-up
        samples until ``max_depth``; a leaf's mass is the clamped sum
        of its samples', mixed with a uniform-volume prior
        (``defensive``) so empty space keeps nonzero density."""
        pts = np.clip(np.asarray(jax.lax.stop_gradient(points),
                                 np.float64), 0.0, 1.0 - 1e-7)
        ms = np.asarray(jax.lax.stop_gradient(masses), np.float64)
        ms = np.where(np.isfinite(ms), np.abs(ms), 0.0)
        if clamp_input_mass_thres > 0.0 and ms.size:
            hi = np.quantile(ms[ms > 0], 1.0 - clamp_input_mass_thres) \
                if (ms > 0).any() else 0.0
            ms = np.minimum(ms, hi) if hi > 0 else ms

        leaves = []   # (lo (3,), hi (3,), mass)
        stack = []
        nx = max(1, int(prepartition_x_slices))
        for sx in range(nx):
            lo = np.array([sx / nx, 0.0, 0.0])
            hi = np.array([(sx + 1) / nx, 1.0, 1.0])
            inside = np.nonzero(
                (pts[:, 0] >= lo[0]) & (pts[:, 0] < hi[0]))[0]
            stack.append((lo, hi, inside, 0))
        while stack:
            lo, hi, idx, depth = stack.pop()
            if len(idx) <= max_leaf_count or depth >= max_depth:
                leaves.append((lo, hi, float(ms[idx].sum())))
                continue
            mid = 0.5 * (lo + hi)
            p = pts[idx]
            oct_id = ((p[:, 0] >= mid[0]).astype(np.int32)
                      + 2 * (p[:, 1] >= mid[1]).astype(np.int32)
                      + 4 * (p[:, 2] >= mid[2]).astype(np.int32))
            for k in range(8):
                klo = np.where(
                    [k & 1, k & 2, k & 4], mid, lo).astype(np.float64)
                khi = np.where(
                    [k & 1, k & 2, k & 4], hi, mid).astype(np.float64)
                stack.append((klo, khi, idx[oct_id == k], depth + 1))

        lo = np.stack([l[0] for l in leaves])
        hi = np.stack([l[1] for l in leaves])
        mass = np.asarray([l[2] for l in leaves])
        vol = np.prod(hi - lo, axis=1)
        total = max(mass.sum(), 1e-20)
        mass = mass / total
        # clamp tiny leaf masses (reference clamp_mass_thres) + mix the
        # volume prior
        mass = np.where(mass < clamp_mass_thres * mass.max(initial=0.0),
                        0.0, mass)
        mass = (1.0 - defensive) * mass / max(mass.sum(), 1e-20) \
            + defensive * vol / vol.sum()
        return OcSpaceDistr(
            leaf_min=jnp.asarray(lo, jnp.float32),
            leaf_max=jnp.asarray(hi, jnp.float32),
            distr=DiscreteDistribution.create(
                jnp.asarray(mass, jnp.float32)),
            n_leaves=len(leaves),
        )

    def sample(self, u1, u3):
        """u1 (N,), u3 (N,3) -> (point (N,3) in [0,1]^3, pdf (N,) per
        unit volume)."""
        idx, pmf = self.distr.sample_pmf(u1)
        lo = self.leaf_min[idx]
        hi = self.leaf_max[idx]
        p = lo + u3 * (hi - lo)
        vol = jnp.prod(jnp.maximum(hi - lo, 1e-12), axis=-1)
        return p, pmf / vol

    def pdf(self, p):
        """Density at a point: containment-masked sum over the (static,
        small) leaf table."""
        inside = jnp.all(
            (p[:, None, :] >= self.leaf_min[None])
            & (p[:, None, :] < self.leaf_max[None]), axis=-1)
        pmf = self.distr.eval_pmf_normalized(
            jnp.arange(self.leaf_min.shape[0]))
        vol = jnp.prod(jnp.maximum(self.leaf_max - self.leaf_min,
                                   1e-12), axis=-1)
        dens = pmf / vol
        return jnp.sum(jnp.where(inside, dens[None, :], 0.0), axis=-1)

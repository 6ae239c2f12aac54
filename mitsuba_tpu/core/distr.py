"""1D sampling distributions (reference: include/mitsuba/core/distr_1d.h).

``DiscreteDistribution`` backs emitter selection (src/render/scene.cpp:227)
and ``ContinuousDistribution`` backs spectral / irregular-spectrum sampling.
Both are pytree dataclasses over fixed-size arrays; ``sample`` is a pure
vectorized function (searchsorted lowers to a fused binary search on TPU).
"""
from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree, field
from .math import safe_div


@pytree
class DiscreteDistribution:
    pmf: jnp.ndarray  # (N,) nonnegative weights
    cdf: jnp.ndarray  # (N,) inclusive normalized CDF
    total: jnp.ndarray  # () sum of weights

    @staticmethod
    def create(pmf):
        pmf = jnp.asarray(pmf, jnp.float32)
        total = jnp.sum(pmf)
        cdf = safe_div(jnp.cumsum(pmf), total)
        return DiscreteDistribution(pmf=pmf, cdf=cdf, total=total)

    @property
    def size(self):
        return self.pmf.shape[0]

    def eval_pmf_normalized(self, index):
        return safe_div(self.pmf[index], self.total)

    def sample(self, u):
        """u in [0,1) -> index.

        Small tables (the common case: emitter/face selection) use a
        comparison-sum instead of searchsorted — fully vectorized on the
        VPU, whereas a binary search lowers to a serial gather loop on TPU.
        """
        if self.size <= 128:
            idx = jnp.sum(
                (u[..., None] >= self.cdf[None, :-1]).astype(jnp.int32),
                axis=-1,
            )
            return jnp.clip(idx, 0, self.size - 1)
        return jnp.clip(
            jnp.searchsorted(self.cdf, u, side="right"), 0, self.size - 1
        )

    def sample_pmf(self, u):
        idx = self.sample(u)
        return idx, self.eval_pmf_normalized(idx)

    def sample_reuse_pmf(self, u):
        """Sample an index, rescale u to [0,1) within the chosen bin, return pmf.

        Mirrors sample_reuse_pmf (distr_1d.h) used by Scene::sample_emitter.
        """
        idx = self.sample(u)
        lo = jnp.where(idx > 0, self.cdf[jnp.maximum(idx - 1, 0)], 0.0)
        pmf = self.eval_pmf_normalized(idx)
        u_re = jnp.clip(safe_div(u - lo, pmf), 0.0, 1.0 - 2 ** -24)
        return idx, u_re, pmf


@pytree
class ContinuousDistribution:
    """Piecewise-linear pdf over [range[0], range[1]] with N uniform nodes."""

    nodes_pdf: jnp.ndarray  # (N,) pdf values at nodes (unnormalized)
    cdf: jnp.ndarray  # (N-1,) integral up to each cell end (unnormalized)
    range: jnp.ndarray  # (2,)
    integral: jnp.ndarray  # ()

    @staticmethod
    def create(range_, values):
        values = jnp.asarray(values, jnp.float32)
        range_ = jnp.asarray(range_, jnp.float32)
        n = values.shape[0]
        dx = (range_[1] - range_[0]) / (n - 1)
        cell = 0.5 * (values[1:] + values[:-1]) * dx
        cdf = jnp.cumsum(cell)
        return ContinuousDistribution(
            nodes_pdf=values, cdf=cdf, range=range_, integral=cdf[-1]
        )

    def eval_pdf_normalized(self, x):
        n = self.nodes_pdf.shape[0]
        dx = (self.range[1] - self.range[0]) / (n - 1)
        t = (x - self.range[0]) / dx
        i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
        f = t - i
        pdf = self.nodes_pdf[i] * (1 - f) + self.nodes_pdf[i + 1] * f
        inside = (x >= self.range[0]) & (x <= self.range[1])
        return jnp.where(inside, safe_div(pdf, self.integral), 0.0)

    def sample(self, u):
        """Inverse-CDF sample; returns x."""
        n = self.nodes_pdf.shape[0]
        dx = (self.range[1] - self.range[0]) / (n - 1)
        target = u * self.integral
        i = jnp.clip(
            jnp.searchsorted(self.cdf, target, side="right"), 0, n - 2
        )
        lo = jnp.where(i > 0, self.cdf[jnp.maximum(i - 1, 0)], 0.0)
        rem = target - lo
        p0 = self.nodes_pdf[i]
        p1 = self.nodes_pdf[i + 1]
        # Solve rem = dx * (p0 t + 0.5 (p1 - p0) t^2) for t in [0,1].
        a = 0.5 * (p1 - p0)
        b = p0
        c = -rem / dx
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        linear = jnp.abs(a) < 1e-6 * jnp.maximum(jnp.abs(b), 1e-12)
        t_lin = safe_div(-c, b)
        t_quad = safe_div(-b + jnp.sqrt(disc), 2 * a)
        t = jnp.clip(jnp.where(linear, t_lin, t_quad), 0.0, 1.0)
        return self.range[0] + (i + t) * dx

    def sample_pdf(self, u):
        x = self.sample(u)
        return x, self.eval_pdf_normalized(x)

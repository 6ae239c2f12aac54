"""Tests for 1D sampling distributions."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core.distr import DiscreteDistribution, ContinuousDistribution
from mitsuba_tpu.core import rng


def test_discrete_sample_matches_pmf():
    pmf = jnp.array([1.0, 3.0, 0.0, 2.0, 4.0])
    d = DiscreteDistribution.create(pmf)
    lanes = jnp.arange(200_000, dtype=jnp.uint32)
    u = rng.sample_1d(jnp.uint32(0), lanes, jnp.uint32(0))
    idx = np.asarray(d.sample(u))
    counts = np.bincount(idx, minlength=5) / len(idx)
    expect = np.asarray(pmf) / np.asarray(pmf).sum()
    assert np.allclose(counts, expect, atol=5e-3)
    assert counts[2] == 0.0


def test_discrete_sample_reuse():
    d = DiscreteDistribution.create(jnp.array([1.0, 1.0]))
    lanes = jnp.arange(100_000, dtype=jnp.uint32)
    u = rng.sample_1d(jnp.uint32(4), lanes, jnp.uint32(0))
    idx, u_re, pmf = d.sample_reuse_pmf(u)
    u_re = np.asarray(u_re)
    assert np.allclose(np.asarray(pmf), 0.5)
    # reused sample must itself be uniform
    assert abs(u_re.mean() - 0.5) < 5e-3
    assert (u_re >= 0).all() and (u_re < 1).all()


def test_continuous_linear_pdf():
    # pdf proportional to x on [0, 2]
    c = ContinuousDistribution.create(
        jnp.array([0.0, 2.0]), jnp.array([0.0, 0.5, 1.0])
    )
    assert np.isclose(float(c.integral), 1.0, atol=1e-6)
    lanes = jnp.arange(400_000, dtype=jnp.uint32)
    u = rng.sample_1d(jnp.uint32(2), lanes, jnp.uint32(0))
    x = np.asarray(c.sample(u))
    # E[x] for pdf x/2 on [0,2] is 4/3
    assert abs(x.mean() - 4.0 / 3.0) < 5e-3
    # eval matches analytic pdf x/2
    xs = jnp.linspace(0.1, 1.9, 10)
    assert np.allclose(np.asarray(c.eval_pdf_normalized(xs)),
                       np.asarray(xs) / 2.0, atol=1e-5)

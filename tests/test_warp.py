"""Chi-square tests for warp functions (reference analogue:
src/core/tests/... warp tests via ChiSquareTest, chi2.py:5)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import warp, rng
from mitsuba_tpu.utils.chi2 import (
    chi2_test,
    PlanarDomain,
    SphericalDomain,
    uniform_samples_2d,
)


def _sampler(warp_fn):
    def sample(n, seed):
        return warp_fn(uniform_samples_2d(n, seed))

    return sample


@pytest.mark.parametrize(
    "warp_fn,pdf_fn,domain",
    [
        (
            warp.square_to_uniform_disk_concentric,
            warp.square_to_uniform_disk_concentric_pdf,
            PlanarDomain(((-1.0, 1.0), (-1.0, 1.0))),
        ),
        (
            warp.square_to_uniform_sphere,
            warp.square_to_uniform_sphere_pdf,
            SphericalDomain(),
        ),
        (
            warp.square_to_uniform_hemisphere,
            warp.square_to_uniform_hemisphere_pdf,
            SphericalDomain(),
        ),
        (
            warp.square_to_cosine_hemisphere,
            warp.square_to_cosine_hemisphere_pdf,
            SphericalDomain(),
        ),
        (
            lambda s: warp.square_to_uniform_cone(s, 0.5),
            lambda d: warp.square_to_uniform_cone_pdf(d, 0.5),
            SphericalDomain(),
        ),
        (
            lambda s: warp.square_to_vmf(s, 10.0),
            lambda d: warp.square_to_vmf_pdf(d, 10.0),
            SphericalDomain(),
        ),
    ],
    ids=["disk", "sphere", "hemisphere", "cosine", "cone", "vmf"],
)
def test_warp_chi2(warp_fn, pdf_fn, domain):
    passed, msg = chi2_test(_sampler(warp_fn), pdf_fn, domain, seed=3)
    assert passed, msg


def test_triangle_barycentrics():
    s = uniform_samples_2d(100_000, 7)
    b = np.asarray(warp.square_to_uniform_triangle(s))
    assert (b >= 0).all() and (b.sum(-1) <= 1.0 + 1e-6).all()
    # Mean barycentric of a uniform triangle distribution is (1/3, 1/3).
    assert np.allclose(b.mean(0), [1 / 3, 1 / 3], atol=5e-3)


def test_disk_concentric_inverse():
    s = uniform_samples_2d(10_000, 11)
    p = warp.square_to_uniform_disk_concentric(s)
    s2 = warp.uniform_disk_to_square_concentric(p)
    assert np.allclose(np.asarray(s), np.asarray(s2), atol=1e-4)


def test_tent():
    u = np.linspace(0.001, 0.999, 100_000, dtype=np.float32)
    x = np.asarray(warp.interval_to_tent(jnp.asarray(u)))
    assert abs(x.mean()) < 5e-3
    # variance of the tent distribution on [-1,1] is 1/6
    assert abs(x.var() - 1.0 / 6.0) < 5e-3

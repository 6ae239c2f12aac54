"""BSDF correctness: chi2 sample/pdf consistency, Fresnel identities,
sample-weight == eval/pdf agreement (reference analogue: src/bsdfs/tests)."""
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core import rng
from mitsuba_tpu.core.fresnel import fresnel_dielectric, refract
from mitsuba_tpu.core.math import normalize, Frame
from mitsuba_tpu.models import bsdfs
from mitsuba_tpu.models.textures import ConstantTexture
from mitsuba_tpu.utils.chi2 import chi2_test, SphericalDomain


class _SI:
    """Minimal local-frame SI for BSDF unit tests."""

    def __init__(self, wi, n):
        self.wi = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        self.uv = jnp.zeros((n, 2))


def _fixed_wi():
    return normalize(jnp.array([0.4, -0.25, 0.88]))


@pytest.mark.parametrize(
    "make_bsdf",
    [
        lambda: bsdfs.SmoothDiffuse(reflectance=ConstantTexture(jnp.array([1.0, 1.0, 1.0]))),
        lambda: bsdfs.RoughConductor(
            eta=jnp.array([0.2, 0.9, 1.1]), k=jnp.array([3.9, 2.4, 2.1]),
            alpha=jnp.asarray(0.3),
        ),
        lambda: bsdfs.RoughConductor(
            eta=jnp.array([0.2, 0.9, 1.1]), k=jnp.array([3.9, 2.4, 2.1]),
            alpha=jnp.asarray(0.05),
        ),
    ],
    ids=["diffuse", "ggx_rough", "ggx_smooth"],
)
def test_bsdf_chi2(make_bsdf):
    b = make_bsdf()
    wi = _fixed_wi()

    def sample_fn(n, seed):
        si = _SI(wi, n)
        lanes = jnp.arange(n, dtype=jnp.uint32)
        s1 = rng.sample_1d(jnp.uint32(seed), lanes, jnp.uint32(0))
        s2 = rng.sample_2d(jnp.uint32(seed), lanes, jnp.uint32(1))
        bs, w = b.sample(si, s1, s2, jnp.ones(n, bool))
        # keep only valid samples; invalid would distort the histogram
        return np.asarray(bs.wo)[np.asarray(bs.pdf) > 0]

    def pdf_fn(d):
        flat = d.reshape(-1, 3)
        si = _SI(wi, flat.shape[0])
        p = b.pdf(si, flat, jnp.ones(flat.shape[0], bool))
        return np.asarray(p).reshape(d.shape[:-1])

    passed, msg = chi2_test(
        sample_fn, pdf_fn, SphericalDomain(), sample_count=200_000, seed=5
    )
    assert passed, msg


@pytest.mark.parametrize(
    "make_bsdf",
    [
        lambda: bsdfs.SmoothDiffuse(reflectance=ConstantTexture(jnp.array([0.8, 0.5, 0.2]))),
        lambda: bsdfs.RoughConductor(
            eta=jnp.array([0.2, 0.9, 1.1]), k=jnp.array([3.9, 2.4, 2.1]),
            alpha=jnp.asarray(0.25),
        ),
    ],
    ids=["diffuse", "ggx"],
)
def test_sample_weight_matches_eval_over_pdf(make_bsdf):
    b = make_bsdf()
    n = 4096
    si = _SI(_fixed_wi(), n)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    s1 = rng.sample_1d(jnp.uint32(8), lanes, jnp.uint32(0))
    s2 = rng.sample_2d(jnp.uint32(8), lanes, jnp.uint32(1))
    active = jnp.ones(n, bool)
    bs, w = b.sample(si, s1, s2, active)
    val, pdf = b.eval_pdf(si, bs.wo, active)
    ok = np.asarray(bs.pdf) > 1e-5
    w_ref = np.asarray(val)[ok] / np.asarray(pdf)[ok][:, None]
    assert np.allclose(np.asarray(w)[ok], w_ref, rtol=2e-3, atol=1e-4)


def test_fresnel_normal_incidence():
    f, cos_t, eta_it, eta_ti = fresnel_dielectric(jnp.asarray(1.0), jnp.asarray(1.5))
    assert np.isclose(float(f), ((1.5 - 1) / (1.5 + 1)) ** 2, atol=1e-6)
    assert np.isclose(float(cos_t), -1.0, atol=1e-6)
    assert np.isclose(float(eta_it), 1.5)


def test_fresnel_tir():
    # from inside glass beyond the critical angle: total internal reflection
    crit = np.sqrt(1 - (1 / 1.5) ** 2)  # cos of critical angle
    f, cos_t, _, _ = fresnel_dielectric(jnp.asarray(-crit * 0.5), jnp.asarray(1.5))
    assert float(f) == 1.0 and float(cos_t) == 0.0


def test_fresnel_snell():
    # 45 degrees into glass: sin_t = sin(45)/1.5
    ci = np.cos(np.pi / 4)
    f, cos_t, _, eta_ti = fresnel_dielectric(jnp.asarray(ci), jnp.asarray(1.5))
    sin_t = np.sin(np.pi / 4) / 1.5
    assert np.isclose(float(cos_t), -np.sqrt(1 - sin_t**2), atol=1e-6)
    # refract preserves Snell in the local frame
    wi = jnp.array([[np.sin(np.pi / 4), 0.0, ci]], dtype=jnp.float32)
    wt = refract(wi, jnp.asarray([float(cos_t)]), jnp.asarray([float(eta_ti)]))
    wt = np.asarray(wt)[0]
    assert np.isclose(np.linalg.norm(wt), 1.0, atol=1e-5)
    assert np.isclose(-wt[0], sin_t, atol=1e-6)  # transmitted bends toward normal


def test_dielectric_energy_conservation():
    """reflect prob + refract prob = 1 and unweighted flux is conserved
    across an index-matched interface."""
    b = bsdfs.SmoothDielectric(eta=jnp.asarray(1.0))
    n = 1000
    si = _SI(_fixed_wi(), n)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    s1 = rng.sample_1d(jnp.uint32(3), lanes, jnp.uint32(0))
    s2 = rng.sample_2d(jnp.uint32(3), lanes, jnp.uint32(1))
    bs, w = b.sample(si, s1, s2, jnp.ones(n, bool))
    # index-matched: everything refracts straight through with weight 1
    assert np.allclose(np.asarray(w), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(bs.wo), -np.asarray(si.wi), atol=1e-5)


def test_dielectric_reflect_fraction():
    b = bsdfs.SmoothDielectric(eta=jnp.asarray(1.5))
    n = 200_000
    si = _SI(jnp.array([0.0, 0.0, 1.0]), n)  # normal incidence
    lanes = jnp.arange(n, dtype=jnp.uint32)
    s1 = rng.sample_1d(jnp.uint32(1), lanes, jnp.uint32(0))
    s2 = rng.sample_2d(jnp.uint32(1), lanes, jnp.uint32(1))
    bs, w = b.sample(si, s1, s2, jnp.ones(n, bool))
    frac_reflect = float(jnp.mean((bs.sampled_type == bsdfs.Flags.DeltaReflection) * 1.0))
    assert abs(frac_reflect - 0.04) < 2e-3


def test_conductor_mirror():
    eta, k = bsdfs.CONDUCTOR_IOR["Ag"]
    b = bsdfs.SmoothConductor(eta=eta, k=k)
    n = 4
    si = _SI(_fixed_wi(), n)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    s1 = rng.sample_1d(jnp.uint32(1), lanes, jnp.uint32(0))
    s2 = rng.sample_2d(jnp.uint32(1), lanes, jnp.uint32(1))
    bs, w = b.sample(si, s1, s2, jnp.ones(n, bool))
    wo = np.asarray(bs.wo)[0]
    wi = np.asarray(si.wi)[0]
    assert np.allclose(wo, [-wi[0], -wi[1], wi[2]], atol=1e-6)
    assert (np.asarray(w) > 0.9).all()  # silver is highly reflective
    assert (np.asarray(w) <= 1.0 + 1e-5).all()

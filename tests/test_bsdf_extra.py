"""Tests for the extended BSDF family: chi2 sample/pdf consistency, energy
conservation (white furnace), and adapter (mask/twosided/blend/null)
semantics — mirrors src/bsdfs/tests coverage."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import rng
from mitsuba_tpu.core.math import Frame, normalize
from mitsuba_tpu.models import bsdfs
from mitsuba_tpu.models.textures import ConstantTexture
from mitsuba_tpu.utils.chi2 import SphericalDomain, chi2_test


class _SI:
    def __init__(self, wi, n):
        self.wi = jnp.broadcast_to(jnp.asarray(wi), (n, 3))
        self.uv = jnp.zeros((n, 2))
        self.wavelengths = jnp.zeros((n, 0))

    def replace(self, wi):
        out = _SI(wi, wi.shape[0])
        return out


def _wi():
    return normalize(jnp.array([0.35, -0.2, 0.91]))


def _sample(b, wi, n, seed=0):
    si = _SI(wi, n)
    lanes = jnp.arange(n, dtype=jnp.uint32)
    s1 = rng.sample_1d(jnp.uint32(seed), lanes, jnp.uint32(0))
    s2 = rng.sample_2d(jnp.uint32(seed), lanes, jnp.uint32(1))
    return b.sample(si, s1, s2, jnp.ones(n, bool))


@pytest.mark.parametrize(
    "make_bsdf",
    [
        lambda: bsdfs.RoughDielectric(eta=jnp.asarray(1.5),
                                      alpha=jnp.asarray(0.3)),
        lambda: bsdfs.SmoothPlastic(
            diffuse_reflectance=ConstantTexture(jnp.full((3,), 0.7)),
            eta=jnp.asarray(1.49)),
        lambda: bsdfs.RoughPlastic(
            diffuse_reflectance=ConstantTexture(jnp.full((3,), 0.7)),
            eta=jnp.asarray(1.49), alpha=jnp.asarray(0.3)),
    ],
    ids=["roughdielectric", "plastic", "roughplastic"],
)
def test_chi2_extended(make_bsdf):
    b = make_bsdf()
    wi = _wi()

    def sample_fn(n, seed):
        bs, w = _sample(b, wi, n, seed)
        keep = np.asarray(bs.pdf) > 0
        if hasattr(bs, "delta"):
            keep &= ~np.asarray(bs.delta)  # delta lobes not chi2-testable
        return np.asarray(bs.wo)[keep]

    def pdf_fn(d):
        flat = d.reshape(-1, 3)
        si = _SI(wi, flat.shape[0])
        p = b.pdf(si, flat, jnp.ones(flat.shape[0], bool))
        return np.asarray(p).reshape(d.shape[:-1])

    # note: smooth-lobe pdfs integrate to the smooth fraction (<1) and
    # the histogram excludes delta samples, so observed/expected stay
    # consistent without rescaling
    passed, msg = chi2_test(sample_fn, pdf_fn, SphericalDomain(),
                            sample_count=200_000)
    assert passed, (b.id, msg)


def test_sample_weight_equals_eval_over_pdf():
    for b in (
        bsdfs.RoughDielectric(eta=jnp.asarray(1.5), alpha=jnp.asarray(0.25)),
        bsdfs.RoughPlastic(
            diffuse_reflectance=ConstantTexture(jnp.full((3,), 0.6)),
            eta=jnp.asarray(1.49), alpha=jnp.asarray(0.3)),
    ):
        n = 4096
        bs, w = _sample(b, _wi(), n)
        si = _SI(_wi(), n)
        val, pdf = b.eval_pdf(si, bs.wo, jnp.ones(n, bool))
        m = np.asarray((bs.pdf > 1e-3) & ~bs.delta)
        ratio = np.asarray(val)[m] / np.maximum(
            np.asarray(pdf)[m, None], 1e-20)
        got = np.asarray(w)[m]
        err = np.abs(ratio - got) / np.maximum(np.abs(ratio), 1e-2)
        # 99th percentile agreement (grazing lanes are numerically touchy)
        assert np.quantile(err, 0.95) < 0.05, (b.id, np.quantile(err, 0.95))


def test_thindielectric_energy():
    """R' + T' == 1: sampling weights always 1, never absorbed."""
    b = bsdfs.ThinDielectric(eta=jnp.asarray(1.5))
    bs, w = _sample(b, _wi(), 10_000)
    assert np.allclose(np.asarray(w), 1.0, atol=1e-5)
    # both lobes exercised
    frac_t = float(jnp.mean(bs.sampled_type == bsdfs.Flags.DeltaTransmission))
    assert 0.05 < frac_t < 0.99


def test_roughdielectric_furnace():
    """White furnace: sampling weights average ~1 (energy preservation up
    to single-scattering shadowing loss)."""
    b = bsdfs.RoughDielectric(eta=jnp.asarray(1.5), alpha=jnp.asarray(0.2))
    bs, w = _sample(b, _wi(), 100_000)
    # divide out the radiance-transport eta^2 factor (bs.eta = eta_it, the
    # weight carries eta_ti^2 = 1/eta_it^2): importance weight = w * eta^2
    w_imp = w * (bs.eta**2)[:, None]
    mean_w = float(jnp.mean(jnp.where(bs.pdf[:, None] > 0, w_imp, 0.0)))
    assert 0.85 < mean_w <= 1.01, mean_w


def test_null_passthrough():
    b = bsdfs.NullBSDF()
    n = 16
    bs, w = _sample(b, _wi(), n)
    np.testing.assert_allclose(np.asarray(bs.wo),
                               np.asarray(-_SI(_wi(), n).wi), atol=1e-6)
    assert np.allclose(np.asarray(w), 1.0)


def test_mask_scales_nested():
    inner = bsdfs.SmoothDiffuse(
        reflectance=ConstantTexture(jnp.full((3,), 0.8)))
    b = bsdfs.MaskBSDF(nested=inner, opacity=ConstantTexture(jnp.full((3,), 0.25)))
    n = 50_000
    si = _SI(_wi(), n)
    wo = normalize(jnp.array([0.1, 0.2, 0.97]))
    wo_b = jnp.broadcast_to(wo, (n, 3))
    v_in = inner.eval(si, wo_b, jnp.ones(n, bool))
    v = b.eval(si, wo_b, jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(v), 0.25 * np.asarray(v_in),
                               rtol=1e-5)
    # ~75% of samples pass through
    bs, w = _sample(b, _wi(), n)
    frac_through = float(jnp.mean(bs.sampled_type == bsdfs.Flags.DeltaTransmission))
    assert abs(frac_through - 0.75) < 0.02


def test_twosided_backside():
    inner = bsdfs.SmoothDiffuse(
        reflectance=ConstantTexture(jnp.full((3,), 0.5)))
    b = bsdfs.TwoSided(nested=inner)
    n = 1000
    wi_back = normalize(jnp.array([0.3, 0.1, -0.95]))
    si = _SI(wi_back, n)
    bs, w = _sample(b, wi_back, n)
    # sampled directions are in the back hemisphere and weights nonzero
    assert float(jnp.mean(Frame.cos_theta(bs.wo) < 0)) > 0.99
    assert float(jnp.mean(w)) > 0.1
    # eval is symmetric to the front side
    wo_b = bs.wo
    v = b.eval(si, wo_b, jnp.ones(n, bool))
    si_f = _SI(wi_back * jnp.asarray([1.0, 1.0, -1.0]), n)
    v_f = inner.eval(si_f, wo_b * jnp.asarray([1.0, 1.0, -1.0]),
                     jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_f), atol=1e-6)


def test_blend_mixes():
    a = bsdfs.SmoothDiffuse(reflectance=ConstantTexture(jnp.asarray([1.0, 0.0, 0.0])))
    c = bsdfs.SmoothDiffuse(reflectance=ConstantTexture(jnp.asarray([0.0, 0.0, 1.0])))
    b = bsdfs.BlendBSDF(bsdf0=a, bsdf1=c,
                        weight=ConstantTexture(jnp.full((3,), 0.3)))
    n = 10
    si = _SI(_wi(), n)
    wo = jnp.broadcast_to(normalize(jnp.array([0.0, 0.0, 1.0])), (n, 3))
    v = np.asarray(b.eval(si, wo, jnp.ones(n, bool)))
    va = np.asarray(a.eval(si, wo, jnp.ones(n, bool)))
    vc = np.asarray(c.eval(si, wo, jnp.ones(n, bool)))
    np.testing.assert_allclose(v, 0.7 * va + 0.3 * vc, rtol=1e-5)

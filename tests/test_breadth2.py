"""Breadth batch 2: spline/quad core, spectra plugins, extra phases,
distant sensor, projector emitter, spectral film, thin/pplastic BSDFs,
volume/mesh-attribute/debug textures."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import rng, spline, quad


# ------------------------------------------------------------------ core

def test_spline_interpolates_nodes():
    vals = jnp.asarray([0.0, 1.0, 0.5, 2.0, 1.5])
    xs = jnp.linspace(-1.0, 1.0, 5)
    out = spline.eval_1d(-1.0, 1.0, vals, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(vals), atol=1e-6)


def test_spline_integral_smooth():
    x = np.linspace(0.0, np.pi, 33, dtype=np.float32)
    vals = jnp.asarray(np.sin(x))
    integral = float(spline.integrate_1d(0.0, float(np.pi), vals)[-1])
    assert abs(integral - 2.0) < 1e-3


def test_spline_sample_distribution():
    # density ~ x on [0,1]: cdf = x^2, x = sqrt(u)
    vals = jnp.linspace(0.0, 1.0, 17)
    u = rng.sample_1d(7, jnp.arange(200000), 0)
    x, pdf = spline.sample_1d(0.0, 1.0, vals, u)
    ref = np.sqrt(np.asarray(u))
    assert abs(float(jnp.mean(x)) - 2.0 / 3.0) < 2e-3
    np.testing.assert_allclose(np.asarray(x), ref, atol=0.02)
    np.testing.assert_allclose(np.asarray(pdf), 2.0 * ref, atol=0.05)


def test_gauss_quadrature():
    f = lambda x: x ** 6 - 2.0 * x ** 3 + 1.0
    exact = 2.0 / 7.0 + 2.0
    for rule in (quad.gauss_legendre(8), quad.gauss_lobatto(8)):
        got = float(quad.integrate(rule, f, -1.0, 1.0))
        assert abs(got - exact) < 1e-5, got


# --------------------------------------------------------------- spectra

def test_spectra_plugins():
    from mitsuba_tpu.models.spectra import (
        BlackbodySpectrum, D65Spectrum, IrregularSpectrum, RegularSpectrum,
        SRGBSpectrum, UniformSpectrum,
    )

    lam = jnp.asarray([450.0, 550.0, 650.0])
    u = UniformSpectrum(value=jnp.asarray(0.7))
    np.testing.assert_allclose(np.asarray(u.eval(lam)), 0.7)
    np.testing.assert_allclose(np.asarray(u.to_rgb()), 0.7)

    r = RegularSpectrum(values=jnp.asarray([1.0, 3.0]),
                        lambda_min=400.0, lambda_max=700.0)
    assert abs(float(r.eval(jnp.asarray(550.0))) - 2.0) < 1e-5

    ir = IrregularSpectrum(
        wavelengths=jnp.asarray([400.0, 500.0, 700.0]),
        values=jnp.asarray([0.0, 1.0, 0.0]))
    assert abs(float(ir.eval(jnp.asarray(450.0))) - 0.5) < 1e-5

    d65 = D65Spectrum()
    rgbv = np.asarray(d65.to_rgb())
    assert np.all(np.isfinite(rgbv)) and np.all(rgbv > 0)

    # hotter blackbody is relatively bluer
    cool = np.asarray(BlackbodySpectrum(jnp.asarray(3000.0)).to_rgb())
    hot = np.asarray(BlackbodySpectrum(jnp.asarray(9000.0)).to_rgb())
    assert cool[0] / cool[2] > hot[0] / hot[2]

    s = SRGBSpectrum(rgb=jnp.asarray([0.2, 0.5, 0.8]))
    back = np.asarray(s.to_rgb())
    np.testing.assert_allclose(back, [0.2, 0.5, 0.8])


# ----------------------------------------------------------------- phases

def _mc_phase_norm(phase, n=200000):
    from mitsuba_tpu.core import warp

    u = rng.sample_2d(3, jnp.arange(n), 0)
    wo = warp.square_to_uniform_sphere(u)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    vals = phase.eval(wi, wo, jnp.ones(n, bool))
    return float(jnp.mean(vals) * 4.0 * jnp.pi)


def test_rayleigh_phase():
    from mitsuba_tpu.models.media import RayleighPhase

    p = RayleighPhase()
    assert abs(_mc_phase_norm(p) - 1.0) < 0.01
    # sample/eval agreement: mean cos of samples == 0 (symmetric)
    n = 100000
    u = rng.sample_2d(5, jnp.arange(n), 1)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    wo, pdf = p.sample(wi, u, jnp.ones(n, bool))
    cos = np.asarray(wo[:, 2] * -1.0)
    assert abs(cos.mean()) < 5e-3
    np.testing.assert_allclose(
        np.asarray(pdf), np.asarray(p.eval(wi, wo, None)), rtol=1e-4)


def test_blendphase_norm():
    from mitsuba_tpu.models.media import BlendPhase, HGPhase, IsotropicPhase

    p = BlendPhase(phase1=IsotropicPhase(), phase2=HGPhase(jnp.asarray(0.5)),
                   weight=jnp.asarray(0.3))
    assert abs(_mc_phase_norm(p) - 1.0) < 0.02


def test_tabphase_matches_hg():
    from mitsuba_tpu.models.media import HGPhase, TabulatedPhase

    hg = HGPhase(g=jnp.asarray(0.4))
    cos_grid = jnp.linspace(-1.0, 1.0, 64)
    g = 0.4
    denom = 1.0 + g * g - 2.0 * g * cos_grid
    tab_vals = (1.0 - g * g) / (denom * jnp.sqrt(denom))
    p = TabulatedPhase(values=tab_vals)
    assert abs(_mc_phase_norm(p) - 1.0) < 0.02
    n = 2000
    u = rng.sample_2d(9, jnp.arange(n), 0)
    from mitsuba_tpu.core import warp

    wo = warp.square_to_uniform_sphere(u)
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    a = np.asarray(p.eval(wi, wo, None))
    b = np.asarray(hg.eval(wi, wo, None))
    np.testing.assert_allclose(a, b, rtol=0.02, atol=1e-4)


# ----------------------------------------------- sensors/emitters/film

def test_distant_sensor_renders():
    from mitsuba_tpu.models.integrators import DirectIntegrator, render
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict

    d = cornell_box_dict(width=16, height=16, spp=16)
    d["sensor"] = {
        "type": "distant", "direction": [0, 0, -1],
        "film": {"width": 16, "height": 16},
        "sampler": {"type": "independent", "sample_count": 16},
    }
    scene = load_dict(d)
    img = np.asarray(render(scene, DirectIntegrator(), seed=0, spp=16))
    assert np.isfinite(img).all() and img.mean() > 1e-3


def test_projector_emitter():
    from mitsuba_tpu.models.integrators import DirectIntegrator, render
    from mitsuba_tpu.utils.load import load_dict

    scene = load_dict({
        "type": "scene",
        "floor": {"type": "rectangle", "bsdf": {"type": "diffuse"}},
        "proj": {
            "type": "projector",
            "position": [0.3, 0.0, 2.0],
            "direction": [0.0, 0.0, -1.0],
            "irradiance": {"type": "checkerboard", "scale": 4.0},
            "fov": 40.0, "scale": 10.0,
        },
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": _lookat([0, 0, 3], [0, 0, 0]),
            "film": {"width": 24, "height": 24},
            "sampler": {"type": "independent", "sample_count": 64},
        },
    })
    img = np.asarray(render(scene, DirectIntegrator(), seed=0, spp=64))
    assert np.isfinite(img).all()
    # frustum illuminates part of the floor; corners outside stay dark
    assert img.max() > 10.0 * max(img.min(), 1e-6)
    assert img.mean() > 1e-3


def _lookat(origin, target):
    from mitsuba_tpu.core import transform as tf

    return np.asarray(tf.look_at(origin, target, [0, 1, 0]), np.float32)


def test_spectral_film_bins():
    from mitsuba_tpu.models.film import SpectralFilm

    film = SpectralFilm(width=4, height=4, n_bins=8,
                        lambda_min=400.0, lambda_max=720.0)
    n = 16
    pix = np.arange(n)
    pos = jnp.asarray(np.stack([pix % 4 + 0.5, pix // 4 + 0.5], -1),
                      jnp.float32)
    lam = jnp.full((n,), 560.0)   # bin 4 of [400,720]/8
    val = jnp.ones((n,))
    img = film.put_spectral(pos, val, lam, jnp.ones((n,), bool))
    out = np.asarray(film.develop(img))
    assert out.shape == (4, 4, 8)
    assert np.allclose(out[..., 4], 1.0, atol=1e-5)
    others = np.delete(out, 4, axis=-1)
    assert np.allclose(others, 0.0, atol=1e-6)
    centers = np.asarray(film.bin_wavelengths())
    assert abs(centers[0] - 420.0) < 1e-3


# ------------------------------------------------------------------ bsdfs

def _energy_and_consistency(bsdf, seed=0, n=100000):
    from mitsuba_tpu.core.records import SurfaceInteraction

    wi = jnp.broadcast_to(
        jnp.asarray([0.3, 0.1, np.sqrt(1 - 0.09 - 0.01)]), (n, 3))
    si = _si_proxy(wi, n)
    s1 = rng.sample_1d(seed, jnp.arange(n), 0)
    s2 = rng.sample_2d(seed, jnp.arange(n), 1)
    bs, w = bsdf.sample(si, s1, s2, jnp.ones(n, bool))
    w = np.asarray(w)
    assert np.isfinite(w).all()
    # energy: mean weight (= reflectance estimate) must stay below 1
    assert w.mean(0).max() < 1.05, w.mean(0)
    assert w.mean() > 0.05
    # sampled directions must carry positive pdf + value agreement
    val, pdf = bsdf.eval_pdf(si, bs.wo, jnp.ones(n, bool))
    m = np.asarray(bs.pdf) > 1e-5
    np.testing.assert_allclose(
        np.asarray(pdf)[m], np.asarray(bs.pdf)[m], rtol=1e-3)


class _si_proxy:
    def __init__(self, wi, n):
        self.wi = wi
        self.uv = jnp.zeros((n, 2))
        self.p = jnp.zeros((n, 3))
        self.wavelengths = jnp.zeros((n, 0))
        self.t = jnp.zeros((n,))


def test_principledthin():
    from mitsuba_tpu.models.bsdfs import PrincipledThin
    from mitsuba_tpu.models.textures import ConstantTexture

    b = PrincipledThin(
        base_color=ConstantTexture(jnp.asarray([0.6, 0.5, 0.4])),
        roughness=jnp.asarray(0.4),
        spec_trans=jnp.asarray(0.4),
        diff_trans=jnp.asarray(0.8),
    )
    _energy_and_consistency(b)
    # with spec_trans + diff_trans, some energy goes below the surface
    n = 20000
    wi = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    si = _si_proxy(wi, n)
    s1 = rng.sample_1d(3, jnp.arange(n), 0)
    s2 = rng.sample_2d(3, jnp.arange(n), 1)
    bs, w = b.sample(si, s1, s2, jnp.ones(n, bool))
    frac_below = float(jnp.mean(
        ((bs.wo[:, 2] < 0) & jnp.any(w > 0, -1)).astype(jnp.float32)))
    assert frac_below > 0.2, frac_below


def test_pplastic():
    from mitsuba_tpu.models.bsdfs import PPlastic
    from mitsuba_tpu.models.textures import ConstantTexture

    b = PPlastic(
        diffuse_reflectance=ConstantTexture(jnp.asarray([0.5, 0.4, 0.3])),
        alpha=jnp.asarray(0.2),
    )
    _energy_and_consistency(b)


# --------------------------------------------------------------- textures

def test_volume3d_texture():
    from mitsuba_tpu.models.textures import Volume3DTexture

    data = jnp.arange(8.0).reshape(2, 2, 2, 1)
    tex = Volume3DTexture(
        data=data, bbox_min=jnp.asarray([0.0, 0.0, 0.0]),
        bbox_max=jnp.asarray([1.0, 1.0, 1.0]))

    class SI:
        p = jnp.asarray([[0.25, 0.25, 0.25], [0.5, 0.5, 0.5]])
        uv = jnp.zeros((2, 2))

    out = np.asarray(tex.eval(SI()))
    assert abs(out[0, 0] - 0.0) < 1e-5   # cell center (0,0,0)
    assert abs(out[1, 0] - 3.5) < 1e-5   # mid-grid trilinear mean


def test_mesh_attribute_texture():
    from mitsuba_tpu.models.textures import MeshAttributeTexture

    attr = jnp.asarray([[1.0], [2.0], [4.0]])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    tex = MeshAttributeTexture(attr=attr, faces=faces)

    class SI:
        prim_index = jnp.asarray([0, 0], jnp.int32)
        uv = jnp.asarray([[0.0, 0.0], [0.25, 0.5]])

    out = np.asarray(tex.eval(SI()))
    assert abs(out[0, 0] - 1.0) < 1e-5
    assert abs(out[1, 0] - (0.25 * 1.0 + 0.25 * 2.0 + 0.5 * 4.0)) < 1e-5


def test_debug_textures():
    from mitsuba_tpu.models.textures import Comb2DTexture, StarTexture

    class SI:
        uv = jnp.asarray([[0.01, 0.5], [0.5, 0.45]])

    c = Comb2DTexture(color0=jnp.zeros(3), color1=jnp.ones(3),
                      scale=jnp.asarray(1.0))
    out = np.asarray(c.eval(SI()))
    assert out[0].max() == 1.0 and out[1].max() == 0.0
    s = StarTexture(color0=jnp.zeros(3), color1=jnp.ones(3))
    out = np.asarray(s.eval(SI()))
    assert np.isfinite(out).all()


# ----------------------------------------------- hierarchical2d / tonemap

def test_hierarchical2d_matches_marginal():
    from mitsuba_tpu.core.distr2d import Hierarchical2D, Marginal2D

    rng_np = np.random.default_rng(0)
    table = jnp.asarray(rng_np.random((8, 16)).astype(np.float32) + 0.05)
    h2 = Hierarchical2D.create(table)
    n = 200000
    u = rng.sample_2d(11, jnp.arange(n), 0)
    uv, pdf = h2.sample(u)
    # pdf consistency: E[1/pdf] over samples == domain area == 1
    inv = 1.0 / np.maximum(np.asarray(pdf), 1e-12)
    assert abs(inv.mean() - 1.0) < 0.01
    # histogram matches the table distribution
    hist, _, _ = np.histogram2d(
        np.asarray(uv[:, 1]), np.asarray(uv[:, 0]),
        bins=(8, 16), range=((0, 1), (0, 1)))
    expect = np.asarray(table) / np.asarray(table).sum()
    got = hist / n
    assert np.abs(got - expect).max() < 0.003
    # pdf agrees with Marginal2D's normalized table density
    m2 = Marginal2D.create(table)
    pm = np.asarray(m2.pdf(uv)) if hasattr(m2, "pdf") else None
    if pm is not None:
        np.testing.assert_allclose(np.asarray(pdf), pm, rtol=1e-4)


def test_tonemap():
    from mitsuba_tpu.utils.tonemap import linear_to_srgb, tonemap

    img = jnp.asarray(np.linspace(0, 4, 48).reshape(4, 4, 3),
                      jnp.float32)
    out = tonemap(img, mode="reinhard")
    o = np.asarray(out)
    assert o.shape == img.shape and (o >= 0).all() and (o <= 1).all()
    u8 = tonemap(img, mode="linear", to_uint8=True)
    assert u8.dtype == np.uint8
    assert abs(float(linear_to_srgb(jnp.asarray(0.5))) - 0.7354) < 1e-3


def test_sys_info():
    from mitsuba_tpu.utils.sys_info import sys_info

    s = sys_info()
    assert "jax" in s and "backend" in s


def test_hero_wavelength_response_unbiased():
    """E[rgb_response_flat(lam)/pdf] = (1,1,1): the hero-wavelength
    estimator's expectation equals the RGB pipeline for flat-uplift
    materials (spectrum.py rgb_response_flat normalization)."""
    import jax.numpy as jnp
    from mitsuba_tpu.core.spectrum import (rgb_response_flat,
                                           sample_wavelength_visible)

    u = jnp.asarray(np.random.default_rng(0).random(400_000,
                                                    dtype=np.float32))
    lam, pdf = sample_wavelength_visible(u)
    w = np.asarray(rgb_response_flat(lam)
                   / np.maximum(np.asarray(pdf), 1e-12)[:, None])
    assert np.allclose(w.mean(0), 1.0, atol=0.02), w.mean(0)


def test_srgb_rgb2spec_roundtrip():
    """Fitted sigmoid spectra (rgb2spec, srgb.cpp:14-32) round-trip the
    target color through the renderer's response integration, stay in
    [0, max] and are smooth."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.models.spectra import SRGBSpectrum

    palette = [
        [0.2, 0.5, 0.8], [0.9, 0.1, 0.05], [0.05, 0.8, 0.1],
        [0.7, 0.7, 0.7], [0.01, 0.01, 0.9], [1.5, 0.4, 0.2],  # HDR-ish
    ]
    lam = jnp.linspace(380.0, 780.0, 401)
    for rgb in palette:
        s = SRGBSpectrum.create(jnp.asarray(rgb))
        back = np.asarray(s.to_rgb())
        np.testing.assert_allclose(back, rgb, rtol=2e-2, atol=5e-3)
        vals = np.asarray(s.eval(lam))
        assert (vals >= -1e-6).all()
        assert vals.max() <= max(max(rgb), 1.0) * 1.05
        # smoothness: a sigmoid of a quadratic has no oscillation —
        # at most two monotone sections (saturated colors are steep
        # but still monotone)
        sign_changes = int(np.abs(np.diff(np.sign(
            np.diff(vals) + 1e-12))).sum() // 2)
        assert sign_changes <= 1, sign_changes


def test_e_white_cache_no_tracer_leak():
    """The _e_white normalization cache must stay safe when the
    process's FIRST spectral user is itself inside a jit trace: caching
    a jnp constant built under an active trace leaks a tracer into
    every later trace (round-5 regression hit by the jitted lens
    gradient; jax.errors.UnexpectedTracerError)."""
    import jax
    import jax.numpy as jnp

    import mitsuba_tpu.core.spectrum as sp

    old = sp._E_WHITE_SRGB
    try:
        sp._E_WHITE_SRGB = None      # fresh process simulation
        f1 = jax.jit(lambda x: sp.rgb_response_flat(x).sum())
        f2 = jax.jit(lambda x: sp.rgb_response_flat(x).sum() * 2.0)
        a = float(f1(jnp.asarray([500.0])))
        b = float(f2(jnp.asarray([500.0])))   # raised pre-fix
        assert abs(b - 2.0 * a) < 1e-5
    finally:
        sp._E_WHITE_SRGB = old

"""Dupuy-Jakob measured BSDF: Warp2D marginal warps, tensor container
IO, NDF-warp sampling (reference: measured.cpp, distr_2d.h, tensor.cpp).

No RGL database files exist in this offline environment, so the tests
synthesize a valid .bsdf container for a known material (Lambertian)
and check the loaded plugin against the closed form.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core.warp2d import Warp2D
from mitsuba_tpu.utils.tensor_io import read_tensor_file, write_tensor_file


# ------------------------------------------------------------------ Warp2D


def test_warp2d_roundtrip(np_rng):
    tab = np_rng.uniform(0.1, 2.0, (16, 24)).astype(np.float32)
    w = Warp2D.create(tab)
    u = jnp.asarray(np_rng.uniform(0.01, 0.99, (512, 2)).astype(np.float32))
    pos, pdf = w.sample(u)
    u2, pdf2 = w.invert(pos)
    assert np.allclose(np.asarray(u2), np.asarray(u), atol=2e-3)
    assert np.allclose(np.asarray(pdf2), np.asarray(pdf), rtol=1e-3)
    # pdf equals the bilinear density at pos
    pdf3 = w.eval(pos)
    assert np.allclose(np.asarray(pdf3), np.asarray(pdf), rtol=1e-3)


def test_warp2d_mc_integral(np_rng):
    """mean(g(pos)/pdf) over warped samples = integral of g."""
    tab = np_rng.uniform(0.2, 3.0, (12, 12)).astype(np.float32)
    w = Warp2D.create(tab)
    n = 200_000
    u = jnp.asarray(np_rng.uniform(size=(n, 2)).astype(np.float32))
    pos, pdf = w.sample(u)
    g = pos[:, 0] ** 2 + pos[:, 1]          # integral = 1/3 + 1/2
    est = float(jnp.mean(g / jnp.maximum(pdf, 1e-20)))
    assert np.isclose(est, 1.0 / 3.0 + 0.5, rtol=1.5e-2)


def test_warp2d_parameterized_matches_slices(np_rng):
    """At param knots the interpolated warp equals the single-slice
    warp; between knots pdf interpolates monotonically."""
    t0 = np_rng.uniform(0.1, 1.0, (8, 10)).astype(np.float32)
    t1 = np_rng.uniform(0.1, 1.0, (8, 10)).astype(np.float32)
    knots = np.asarray([0.0, 1.0], np.float32)
    wp = Warp2D.create(np.stack([t0, t1]), (knots,))
    w0 = Warp2D.create(t0)
    u = jnp.asarray(np_rng.uniform(0.02, 0.98, (256, 2)).astype(np.float32))
    p_at0, pdf_at0 = wp.sample(u, (jnp.zeros(256),))
    p_ref, pdf_ref = w0.sample(u)
    assert np.allclose(np.asarray(p_at0), np.asarray(p_ref), atol=1e-5)
    assert np.allclose(np.asarray(pdf_at0), np.asarray(pdf_ref), rtol=1e-4)


# --------------------------------------------------------------- tensor IO


def test_tensor_file_roundtrip(tmp_path, np_rng):
    fields = {
        "theta_i": np.linspace(0, 1.5, 8).astype(np.float32),
        "ndf": np_rng.uniform(size=(16, 16)).astype(np.float32),
        "description": np.frombuffer(b"test material", np.uint8),
        "jacobian": np.asarray([0], np.uint8),
    }
    fn = str(tmp_path / "t.bsdf")
    write_tensor_file(fn, fields)
    back = read_tensor_file(fn)
    for k, v in fields.items():
        assert back[k].dtype == v.dtype and back[k].shape == v.shape
        assert np.array_equal(back[k], v)


# ------------------------------------------------- synthesized material


def _synthesize_lambertian(path, albedo=(0.7, 0.3, 0.1), res=64,
                           n_theta=16):
    """Build a valid .bsdf container whose spectra tables encode a
    Lambertian f*cos through a uniform VNDF warp (see measured.cpp
    conventions: eval() returns spectra(invert(u_m)) directly when
    jacobian=0)."""
    phi_i = np.asarray([-np.pi, np.pi], np.float32)
    theta_i = np.linspace(0, np.pi / 2 * 0.98, n_theta).astype(np.float32)
    H = W = res
    # uniform VNDF: sample() is the identity warp on [0,1]^2
    vndf = np.ones((2, n_theta, H, W), np.float32)

    # spectra at grid vertex s: f*cos for the wo generated from u_m = s
    u_x, u_y = np.meshgrid(np.linspace(0, 1, W), np.linspace(0, 1, H),
                           indexing="xy")
    theta_m = (u_y * 0 + u_x) ** 2 * (np.pi / 2)          # u2theta(s.x)
    # NOTE sample() returns pos=(x=col-axis, y=row-axis); measured.cpp
    # uses u_m.x=theta axis, u_m.y=phi axis
    theta_m = (u_x ** 2) * (np.pi / 2)
    phi_m = (2 * u_y - 1) * np.pi                          # u2phi(s.y)
    spectra = np.zeros((2, n_theta, 3, H, W), np.float32)
    lum = np.zeros((2, n_theta, H, W), np.float32)
    for t_idx, ti in enumerate(theta_i):
        wi = np.asarray([np.sin(ti), 0.0, np.cos(ti)])
        # isotropic: phi_m is relative to phi_i; wi has phi_i = 0
        sin_tm = np.sin(theta_m)
        m = np.stack([np.cos(phi_m) * sin_tm, np.sin(phi_m) * sin_tm,
                      np.cos(theta_m)], axis=-1)
        dot_wim = (m * wi).sum(-1)
        wo = m * (2 * dot_wim)[..., None] - wi
        fcos = np.maximum(wo[..., 2], 0.0) / np.pi
        for c, a in enumerate(albedo):
            spectra[:, t_idx, c] = a * fcos
        lum[:, t_idx] = fcos
    lum = np.maximum(lum, 1e-5)
    write_tensor_file(path, {
        "phi_i": phi_i,
        "theta_i": theta_i,
        "ndf": np.ones((H, W), np.float32),
        "sigma": np.ones((H, W), np.float32),
        "vndf": vndf,
        "luminance": lum,
        "rgb": spectra,
        "description": np.frombuffer(b"synthetic lambertian", np.uint8),
        "jacobian": np.asarray([0], np.uint8),
    })


@pytest.fixture(scope="module")
def lambertian_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rgl") / "lambert.bsdf")
    _synthesize_lambertian(p)
    return p


def _si(wi):
    from mitsuba_tpu.core.records import SurfaceInteraction

    n = wi.shape[0]
    z = jnp.zeros((n, 3))
    return SurfaceInteraction(
        t=jnp.ones(n), p=z, n=z, sh_n=z, sh_s=z, sh_t=z,
        uv=jnp.zeros((n, 2)), wi=wi,
        shape_index=jnp.zeros(n, jnp.int32),
        prim_index=jnp.zeros(n, jnp.int32),
        wavelengths=jnp.zeros((n, 0)), time=jnp.zeros(n))


def test_measured_eval_matches_lambertian(lambertian_file, np_rng):
    from mitsuba_tpu.models.bsdfs import measured_rgl_from_file

    b = measured_rgl_from_file(lambertian_file)
    n = 512
    wi = np_rng.normal(size=(n, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.15
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    wo = np_rng.normal(size=(n, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2]) + 0.15
    wo /= np.linalg.norm(wo, axis=1, keepdims=True)
    val, pdf = b.eval_pdf(_si(jnp.asarray(wi)), jnp.asarray(wo),
                          jnp.ones(n, bool))
    ref = 0.7 / np.pi * wo[:, 2]
    got = np.asarray(val)[:, 0]
    # bilinear table interpolation error budget
    ok = ref > 1e-3
    rel = np.abs(got[ok] - ref[ok]) / ref[ok]
    assert np.median(rel) < 0.03
    assert rel.mean() < 0.08


def test_measured_sample_integrates_to_albedo(lambertian_file, np_rng):
    """Furnace check: E[weight] = integral of f*cos = albedo."""
    from mitsuba_tpu.models.bsdfs import measured_rgl_from_file

    b = measured_rgl_from_file(lambertian_file)
    n = 100_000
    wi = jnp.tile(jnp.asarray([[0.3, 0.2, 0.933]]) /
                  jnp.linalg.norm(jnp.asarray([0.3, 0.2, 0.933])), (n, 1))
    s2 = jnp.asarray(np_rng.uniform(size=(n, 2)).astype(np.float32))
    bs, w = b.sample(_si(wi), jnp.zeros(n), s2, jnp.ones(n, bool))
    est = np.asarray(w).mean(axis=0)
    assert np.allclose(est, [0.7, 0.3, 0.1], rtol=0.05, atol=0.01)


def test_measured_sample_pdf_consistency(lambertian_file, np_rng):
    """pdf returned by sample() agrees with eval_pdf() at the sampled
    direction (vndf.invert is the inverse of vndf.sample)."""
    from mitsuba_tpu.models.bsdfs import measured_rgl_from_file

    b = measured_rgl_from_file(lambertian_file)
    n = 2048
    wi = np_rng.normal(size=(n, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2]) + 0.2
    wi /= np.linalg.norm(wi, axis=1, keepdims=True)
    s2 = jnp.asarray(np_rng.uniform(0.02, 0.98, (n, 2)).astype(np.float32))
    si = _si(jnp.asarray(wi))
    bs, w = b.sample(si, jnp.zeros(n), s2, jnp.ones(n, bool))
    val2, pdf2 = b.eval_pdf(si, bs.wo, jnp.ones(n, bool))
    m = np.asarray(bs.pdf) > 1e-3
    assert m.mean() > 0.9
    rel = np.abs(np.asarray(pdf2)[m] - np.asarray(bs.pdf)[m]) \
        / np.asarray(bs.pdf)[m]
    assert np.median(rel) < 0.02


def test_measured_loads_and_renders(lambertian_file):
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.models.integrators.common import render

    sc = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {"type": "perspective", "fov": 45,
                   "to_world": np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                                         [0, 0, 1, -4], [0, 0, 0, 1.]]),
                   "film": {"type": "hdrfilm", "width": 8, "height": 8},
                   "sampler": {"type": "independent", "sample_count": 8}},
        "sph": {"type": "sphere", "analytic": True,
                "bsdf": {"type": "measured",
                         "filename": lambertian_file}},
        "light": {"type": "point",
                  "intensity": {"type": "rgb", "value": [30, 30, 30]},
                  "position": [2, 2, -3]},
    })
    img = np.asarray(render(sc, seed=0))
    assert np.isfinite(img).all() and img.mean() > 0.001

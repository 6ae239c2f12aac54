"""Measured polarized pBRDF (measured_polarized.cpp / Baek et al. 2020).

No network egress here, so the KAIST `.pbsdf` files are synthesized
via utils.tensor_io with analytically-known Mueller content; this
checks the container parsing, the 4-D interpolation, the Rusinkiewicz
frame logic, and the cosine/VNDF mixture sampling against closed
forms.
"""
import os
import sys
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_tpu.utils.tensor_io import write_tensor_file
from mitsuba_tpu.models.bsdfs import make_measured_polarized
from mitsuba_tpu.core import rng


def _write_pbsdf(path, mueller_fn, rho_of_wvl=None):
    """mueller_fn() -> (4,4) base matrix; entries scaled by
    rho(wvl)/pi, constant over the angular grid."""
    P, D, H, W = 8, 8, 8, 5
    phi_d = np.linspace(-np.pi, np.pi, P, dtype=np.float32)
    theta_d = np.linspace(0, np.pi / 2, D, dtype=np.float32)
    theta_h = np.linspace(0, np.pi / 2, H, dtype=np.float32)
    wvls = np.array([450, 500, 550, 600, 650], np.uint16)
    rho = (np.ones(W, np.float32) if rho_of_wvl is None
           else rho_of_wvl(wvls.astype(np.float32)))
    M = np.zeros((P, D, H, W, 4, 4), np.float32)
    M[:] = mueller_fn()[None, None, None, None]
    M *= (rho / np.pi)[None, None, None, :, None, None]
    write_tensor_file(path, {
        "theta_h": theta_h[None], "theta_d": theta_d[None],
        "phi_d": phi_d[None], "wvls": wvls, "M": M})


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


def _depol():
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = 1.0
    return m


def test_depolarizing_diffuse_eval_and_energy():
    """Constant M00-only table == lambertian: eval matches rho/pi *
    cos, and the cosine/VNDF mixture integrates f*cos to rho."""
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "a.pbsdf")
        _write_pbsdf(p, _depol, rho_of_wvl=lambda w: 0.6 * np.ones_like(w))
        b = make_measured_polarized(p, alpha_sample=0.3)

        n = 100_000
        lane = jnp.arange(n, dtype=jnp.int32)
        wi = jnp.broadcast_to(
            jnp.asarray([0.3, 0.1, np.sqrt(1 - 0.3**2 - 0.1**2)]), (n, 3))
        si = _si(wi)
        s1 = rng.sample_1d(jnp.uint32(7), lane, jnp.int32(0))
        s2 = rng.sample_2d(jnp.uint32(7), lane, jnp.int32(1))
        act = jnp.ones((n,), bool)

        bs, w = b.sample(si, s1, s2, act)
        # E[f cos / pdf] over sampled dirs = albedo (white furnace)
        est = np.asarray(jnp.mean(w, axis=0))
        assert np.allclose(est, 0.6, rtol=0.02), est

        # pointwise eval: f*cos = rho/pi * cos_o
        wo = jnp.asarray([[0.0, 0.0, 1.0], [0.5, 0.0, np.sqrt(0.75)]])
        si2 = _si(jnp.broadcast_to(wi[:1], (2, 3)))
        v = np.asarray(b.eval(si2, wo, jnp.ones((2,), bool)))
        exp = 0.6 / np.pi * np.array([1.0, np.sqrt(0.75)])
        assert np.allclose(v, exp[:, None], rtol=1e-3), (v, exp)


def test_wavelength_interpolation_per_channel():
    """rho linear in wavelength -> RGB channels read exactly their
    representative-wavelength values (quadri-linear interp)."""
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "b.pbsdf")
        _write_pbsdf(p, _depol, rho_of_wvl=lambda w: (w - 400.0) / 500.0)
        b = make_measured_polarized(p, channel_wvls=(620.0, 532.0, 465.0))
        wi = jnp.asarray([[0.0, 0.0, 1.0]])
        wo = jnp.asarray([[0.0, 0.0, 1.0]])
        v = np.asarray(b.eval(_si(wi), wo, jnp.ones((1,), bool)))[0]
        exp = (np.array([620.0, 532.0, 465.0]) - 400.0) / 500.0 / np.pi
        assert np.allclose(v, exp, rtol=1e-3), (v, exp)
        # fixed-wavelength mode pins all channels
        b550 = make_measured_polarized(p, wavelength=550.0)
        v550 = np.asarray(b550.eval(_si(wi), wo, jnp.ones((1,), bool)))[0]
        assert np.allclose(v550, 150.0 / 500.0 / np.pi, rtol=1e-3), v550


def test_polarizer_table_mueller_structure():
    """An ideal-linear-polarizer table: M00 survives the basis
    rotations unchanged (rotators fix the intensity row/col) and the
    output is a physically valid Mueller matrix (|M_ij| <= M00)."""
    from mitsuba_tpu.core import mueller as mu

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "c.pbsdf")
        _write_pbsdf(
            p, lambda: np.asarray(mu.linear_polarizer(jnp.ones(()))))
        b = make_measured_polarized(p)
        n = 64
        lane = jnp.arange(n, dtype=jnp.int32)
        u = rng.sample_2d(jnp.uint32(3), lane, jnp.int32(0))
        from mitsuba_tpu.core import warp

        wi = warp.square_to_cosine_hemisphere(u)
        wo = warp.square_to_cosine_hemisphere(
            rng.sample_2d(jnp.uint32(3), lane, jnp.int32(1)))
        M, pdf = b.eval_mueller(_si(wi), wo, jnp.ones((n,), bool))
        M = np.asarray(M)
        cos_o = np.asarray(wo[:, 2])
        assert np.allclose(M[..., 0, 0],
                           0.5 / np.pi * cos_o[:, None], rtol=1e-3)
        assert (np.abs(M) <= M[..., 0:1, 0:1] + 1e-5).all()
        assert np.isfinite(M).all() and (np.asarray(pdf) > 0).all()


def test_loader_and_stokes_render():
    """measured_polarized through load_dict + the Stokes integrator:
    finite S0..S3, S0 > 0 where lit."""
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict
    from mitsuba_tpu.models.integrators.common import render

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "d.pbsdf")
        _write_pbsdf(p, _depol, rho_of_wvl=lambda w: 0.5 * np.ones_like(w))
        d = cornell_box_dict(width=8, height=8, spp=16)
        d["integrator"] = {"type": "stokes",
                           "integrator": {"type": "path", "max_depth": 3}}
        d["white"] = {"type": "measured_polarized", "filename": p,
                      "alpha_sample": 0.4}
        sc = load_dict(d)
        img = np.asarray(render(sc, sc.integrator, seed=1, spp=16))
        assert np.isfinite(img).all()
        assert img[..., :3].max() > 0.0

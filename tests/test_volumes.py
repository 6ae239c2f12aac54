"""Volumetric rendering tests.

Mirrors the reference's medium/phase test strategy (src/media/tests,
src/phase/tests): analytic Beer-Lambert attenuation, HG chi2, energy
checks, and volpath integration sanity."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu import load_dict, render
from mitsuba_tpu.core import rng
from mitsuba_tpu.models.media import (
    GridMedium,
    HGPhase,
    HomogeneousMedium,
    IsotropicPhase,
)
from mitsuba_tpu.utils.chi2 import SphericalDomain, chi2_test
from mitsuba_tpu.utils.scenes import cornell_box_dict


def test_hg_chi2():
    ph = HGPhase(g=jnp.asarray(0.6))
    wi = jnp.asarray([0.0, 0.0, 1.0])  # arriving from +z; propagation -z

    def sample_fn(n, seed):
        lanes = jnp.arange(n, dtype=jnp.uint32)
        s2 = rng.sample_2d(jnp.uint32(seed), lanes, jnp.uint32(0))
        wi_b = jnp.broadcast_to(wi, (n, 3))
        wo, pdf = ph.sample(wi_b, s2, jnp.ones((n,), bool))
        return np.asarray(wo)

    def pdf_fn(d):
        flat = d.reshape(-1, 3)
        wi_b = jnp.broadcast_to(wi, (flat.shape[0], 3))
        p = ph.pdf(wi_b, flat, jnp.ones((flat.shape[0],), bool))
        return np.asarray(p).reshape(d.shape[:-1])

    passed, msg = chi2_test(sample_fn, pdf_fn, SphericalDomain(),
                            sample_count=200_000)
    assert passed, msg
    # forward scattering for g > 0: mean cos against propagation == g
    wo = sample_fn(100_000, 1)
    mean_cos = (wo @ np.asarray(-wi)).mean()
    assert abs(mean_cos - 0.6) < 0.01


def test_homogeneous_free_flight_distribution():
    """Sampled distances follow the channel-MIS mixture; the estimator
    E[w * 1{medium}] equals albedo * (1 - Tr) per channel."""
    m = HomogeneousMedium(sigma_t=jnp.asarray([0.5, 1.0, 2.0]),
                          albedo=jnp.asarray([0.9, 0.8, 0.7]))
    n = 400_000
    lanes = jnp.arange(n, dtype=jnp.uint32)
    s1 = rng.sample_1d(jnp.uint32(0), lanes, jnp.uint32(0))
    s2 = rng.sample_1d(jnp.uint32(0), lanes, jnp.uint32(1))
    dist = jnp.full((n,), 1.5)
    t, is_med, w = m.sample_interaction(dist, s1, s2, jnp.ones((n,), bool))
    est_scatter = np.asarray(
        jnp.mean(jnp.where(is_med[:, None], w, 0.0), axis=0))
    expect = np.asarray(m.albedo) * (1.0 - np.exp(-np.asarray(m.sigma_t) * 1.5))
    np.testing.assert_allclose(est_scatter, expect, rtol=0.02)
    # surface estimator: E[w * 1{surface}] == Tr
    est_surf = np.asarray(jnp.mean(jnp.where(~is_med[:, None], w, 0.0),
                                   axis=0))
    np.testing.assert_allclose(
        est_surf, np.exp(-np.asarray(m.sigma_t) * 1.5), rtol=0.02)


def test_grid_medium_transmittance_unbiased():
    """Ratio tracking matches the analytic transmittance of a constant
    grid."""
    g = GridMedium(
        density=jnp.ones((4, 4, 4)),
        sigma_t=jnp.asarray([1.2, 1.2, 1.2]),
        albedo=jnp.full((3,), 0.8),
        bbox_min=jnp.asarray([-1.0, -1.0, -1.0]),
        bbox_max=jnp.asarray([1.0, 1.0, 1.0]),
    )
    n = 200_000
    lanes = jnp.arange(n, dtype=jnp.uint32)
    o = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    dist = jnp.full((n,), 1.6)
    tr = g.transmittance_rt(o, d, dist, lanes, jnp.uint32(0), jnp.int32(0),
                            jnp.ones((n,), bool))
    got = float(jnp.mean(tr[:, 0]))
    expect = float(np.exp(-1.2 * 1.6))
    assert abs(got - expect) < 0.01, (got, expect)


def test_volpath_absorbing_fog_beer_lambert():
    """Pure absorption: the rendered light dims by exp(-sigma*d) relative
    to the fog-free render."""
    base = cornell_box_dict(width=16, height=16, spp=64)
    base["integrator"] = {"type": "path", "max_depth": 2, "rr_depth": 16}
    clear = np.asarray(render(load_dict(base)))

    foggy_d = cornell_box_dict(width=16, height=16, spp=64)
    foggy_d["integrator"] = {"type": "volpath", "max_depth": 2,
                             "rr_depth": 16}
    sigma = 0.3
    foggy_d["fog"] = {"type": "homogeneous", "sigma_t": sigma, "albedo": 0.0}
    foggy = np.asarray(render(load_dict(foggy_d)))

    # light pixels: distance camera->light ~ 3.9+1.0ish; the direct LIGHT
    # image attenuates by exp(-sigma * path); check the mean ratio is in
    # the plausible attenuation band rather than per-pixel (paths differ)
    ratio = foggy.mean() / clear.mean()
    assert np.exp(-sigma * 8.0) < ratio < np.exp(-sigma * 3.0), ratio


def test_volpath_scattering_fog_renders():
    d = cornell_box_dict(width=16, height=16, spp=32)
    d["integrator"] = {"type": "volpath", "max_depth": 6, "rr_depth": 16}
    d["fog"] = {"type": "homogeneous", "sigma_t": 0.2, "albedo": 0.9,
                "phase": {"type": "hg", "g": 0.3}}
    img = np.asarray(render(load_dict(d)))
    assert np.isfinite(img).all()
    assert img.mean() > 0.02
    # scattering fog glows: off-surface regions receive in-scattered light
    assert (img > 0).mean() > 0.9


def test_volpath_zero_density_matches_path():
    d = cornell_box_dict(width=16, height=16, spp=128)
    d["integrator"] = {"type": "path", "max_depth": 3, "rr_depth": 16}
    a = np.asarray(render(load_dict(d)))
    d["integrator"] = {"type": "volpath", "max_depth": 3, "rr_depth": 16}
    d["fog"] = {"type": "homogeneous", "sigma_t": 1e-6, "albedo": 0.5}
    b = np.asarray(render(load_dict(d)))
    assert abs(a.mean() / b.mean() - 1.0) < 0.05


# ---------------------------------------------------------------- prbvolpath

def _fog_scene(sigma=0.4, albedo=0.7, g=0.0, res=16):
    d = cornell_box_dict(width=res, height=res, spp=32)
    d["integrator"] = {"type": "prbvolpath", "max_depth": 3, "rr_depth": 16}
    fog = {"type": "homogeneous", "sigma_t": sigma, "albedo": albedo}
    if g != 0.0:
        fog["phase"] = {"type": "hg", "g": g}
    d["fog"] = fog
    return load_dict(d)


def test_prbvolpath_primal_matches_volpath():
    """Replay invariant: the prbvolpath primal is volpath's walk."""
    from mitsuba_tpu.models.integrators import (
        PRBVolPathIntegrator, VolPathIntegrator,
    )

    scene = _fog_scene()
    a = np.asarray(render(scene, VolPathIntegrator(max_depth=3, rr_depth=16),
                          seed=0, spp=16))
    b = np.asarray(render(scene,
                          PRBVolPathIntegrator(max_depth=3, rr_depth=16),
                          seed=0, spp=16))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_prbvolpath_albedo_gradient_fd():
    """Albedo does not influence the detached sampler, so fixed-seed FD
    equals the PRB adjoint estimate tightly."""
    import jax
    from mitsuba_tpu.models.integrators import PRBVolPathIntegrator, prb_render

    integ = PRBVolPathIntegrator(max_depth=3, rr_depth=16)
    spp = 64

    def loss_of(albedo):
        scene = _fog_scene(albedo=albedo)
        return float(np.asarray(
            prb_render(scene, integ, 0, spp).mean()))

    scene = _fog_scene()
    g = jax.grad(
        lambda s: prb_render(s, integ, 0, spp).mean(), allow_int=True
    )(scene)
    ad = float(np.asarray(g.scene_medium.albedo).sum())
    eps = 1e-2
    fd = (loss_of(0.7 + eps) - loss_of(0.7 - eps)) / (2 * eps)
    assert np.isfinite(ad) and abs(ad - fd) < 0.05 * abs(fd) + 1e-5, (ad, fd)


def test_prbvolpath_sigma_t_gradient_fd():
    """sigma_t moves the free-flight sampler, so fixed-seed FD and the
    detached PRB gradient are different unbiased estimators — compare
    with MC-level tolerance at decent spp."""
    import jax
    from mitsuba_tpu.models.integrators import PRBVolPathIntegrator, prb_render

    integ = PRBVolPathIntegrator(max_depth=3, rr_depth=16)
    spp = 256

    def loss_of(sigma, seed):
        scene = _fog_scene(sigma=sigma)
        return float(np.asarray(prb_render(scene, integ, seed, spp).mean()))

    scene = _fog_scene()
    g = jax.grad(
        lambda s: prb_render(s, integ, 0, spp).mean(), allow_int=True
    )(scene)
    ad = float(np.asarray(g.scene_medium.sigma_t).sum())
    eps = 0.04
    fd = np.mean([(loss_of(0.4 + eps, s) - loss_of(0.4 - eps, s)) / (2 * eps)
                  for s in range(3)])
    assert np.isfinite(ad), ad
    assert abs(ad - fd) < 0.3 * abs(fd) + 2e-4, (ad, fd)


def test_prbvolpath_phase_g_gradient_finite():
    """HG anisotropy gradient flows (sign/finite check; FD includes
    sampler motion so only expectation-level agreement exists)."""
    import jax
    from mitsuba_tpu.models.integrators import PRBVolPathIntegrator, prb_render

    integ = PRBVolPathIntegrator(max_depth=3, rr_depth=16)
    scene = _fog_scene(g=0.3)
    g = jax.grad(
        lambda s: prb_render(s, integ, 0, 64).mean(), allow_int=True
    )(scene)
    gg = float(np.asarray(g.scene_medium.phase.g))
    assert np.isfinite(gg) and gg != 0.0, gg


def test_volpathmis_matches_volpath_with_lower_variance():
    """Product-form spectral MIS (volpathmis.cpp:596): same expectation
    as volpath on a strongly channel-dependent homogeneous medium, with
    lower per-pixel variance."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict
    from mitsuba_tpu.models.integrators.common import render
    from mitsuba_tpu.models.integrators import VolPathIntegrator
    from mitsuba_tpu.models.integrators.volpathmis import (
        VolPathMISIntegrator)

    d = cornell_box_dict(width=16, height=16, spp=8)
    d.pop("integrator", None)
    d["integrator"] = {"type": "volpathmis", "max_depth": 5}
    d["medium"] = {"type": "homogeneous",
                   "sigma_t": {"type": "rgb", "value": [0.15, 0.9, 2.5]},
                   "albedo": {"type": "rgb", "value": [0.8, 0.8, 0.8]},
                   "phase": {"type": "isotropic"}}
    sc = load_dict(d)
    assert isinstance(sc.integrator, VolPathMISIntegrator)

    vp = VolPathIntegrator(max_depth=5)
    vm = sc.integrator

    imgs_vp = [np.asarray(render(sc, vp, seed=s, spp=24))
               for s in range(4)]
    imgs_vm = [np.asarray(render(sc, vm, seed=s, spp=24))
               for s in range(4)]
    m_vp = np.mean(imgs_vp, axis=0)
    m_vm = np.mean(imgs_vm, axis=0)
    assert np.isfinite(m_vm).all()
    # same expectation (cross-estimator agreement within MC noise)
    rel = abs(m_vm.mean() - m_vp.mean()) / m_vp.mean()
    assert rel < 0.05, rel
    # the product-form MIS reduces seed-to-seed variance
    v_vp = np.var(imgs_vp, axis=0).mean()
    v_vm = np.var(imgs_vm, axis=0).mean()
    assert v_vm < 1.05 * v_vp, (v_vm, v_vp)


def test_sggx_phase_normalization_and_limits():
    """SGGX specular microflakes (sggx.cpp, microflake.h): S = I
    reduces to the isotropic phase; anisotropic S integrates to 1
    over the sphere and sampling is consistent with eval."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.models.media import SGGXPhase
    from mitsuba_tpu.core import rng, warp

    n = 200_000
    lane = jnp.arange(n, dtype=jnp.int32)
    act = jnp.ones((n,), bool)
    wi = jnp.broadcast_to(
        jnp.asarray([0.48, -0.36, np.sqrt(1 - 0.48**2 - 0.36**2)]),
        (n, 3))

    # spherical flakes == isotropic
    iso = SGGXPhase(S=jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0, 0.0]))
    u = rng.sample_2d(jnp.uint32(11), lane, jnp.int32(0))
    wo_u = warp.square_to_uniform_sphere(u)
    v = np.asarray(iso.eval(wi, wo_u, act))
    assert np.allclose(v, 1.0 / (4 * np.pi), rtol=1e-4), v[:4]

    # fiber-like flakes: MC normalization over the sphere
    fib = SGGXPhase(S=jnp.asarray([0.04, 0.04, 1.0, 0.0, 0.0, 0.0]))
    integ = float(jnp.mean(fib.eval(wi, wo_u, act)) * 4 * np.pi)
    assert abs(integ - 1.0) < 0.02, integ

    # sampling consistency: E[g(wo)] under sample() == MC(g * phase)
    wo_s, pdf_s = fib.sample(
        wi, rng.sample_2d(jnp.uint32(12), lane, jnp.int32(2)), act)
    assert np.isfinite(np.asarray(pdf_s)).all()
    assert np.allclose(
        np.asarray(jnp.sum(wo_s**2, -1)), 1.0, atol=1e-4)
    g_s = float(jnp.mean(wo_s[:, 2] ** 2))
    g_u = float(jnp.mean(wo_u[:, 2] ** 2 * fib.eval(wi, wo_u, act))
                * 4 * np.pi)
    assert abs(g_s - g_u) < 0.02, (g_s, g_u)


def test_sggx_volpath_render():
    """sggx phase through load_dict + volpath: finite, energy-sane."""
    import numpy as np
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict
    from mitsuba_tpu.models.integrators.common import render

    d = cornell_box_dict(width=8, height=8, spp=16)
    d["integrator"] = {"type": "volpath", "max_depth": 4}
    d["medium"] = {"type": "homogeneous",
                   "sigma_t": {"type": "rgb", "value": [0.4, 0.4, 0.4]},
                   "albedo": {"type": "rgb", "value": [0.7, 0.7, 0.7]},
                   "phase": {"type": "sggx",
                             "S": [0.04, 0.04, 1.0, 0.0, 0.0, 0.0]}}
    sc = load_dict(d)
    img = np.asarray(render(sc, sc.integrator, seed=2, spp=32))
    assert np.isfinite(img).all() and img.max() > 0

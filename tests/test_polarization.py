"""Polarization track: mueller calculus identities, polarized Fresnel,
polarizer/retarder/circular plugins, and the stokes integrator
(reference: mueller.h + its test_mueller.py harness, stokes.cpp,
polarizer.cpp, fresnel.h:150)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import mueller as mu


def _m(x):
    return np.asarray(x)


# ------------------------------------------------------------- elements


def test_malus_law():
    """Unpolarized light through a polarizer pair: I = I0/2 cos^2(t)."""
    s_in = mu.unpolarized_stokes(jnp.asarray(1.0))
    p0 = mu.linear_polarizer(1.0)
    for deg in (0.0, 30.0, 45.0, 60.0, 90.0):
        p1 = mu.rotated_element(jnp.asarray(np.radians(deg)),
                                mu.linear_polarizer(1.0))
        out = mu.apply_stokes(p1 @ p0, s_in)
        expect = 0.5 * np.cos(np.radians(deg)) ** 2
        assert np.allclose(_m(out)[0], expect, atol=1e-6), deg


def test_quarter_wave_plate_makes_circular():
    """Linear 45-degree light through a QWP -> fully circular (S3)."""
    # +45 linear polarized: [1, 0, 1, 0]
    s = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    qwp = mu.linear_retarder(jnp.asarray(np.pi / 2))
    out = _m(mu.apply_stokes(qwp, s))
    assert abs(out[0] - 1.0) < 1e-6
    assert abs(out[1]) < 1e-6 and abs(out[2]) < 1e-6
    assert abs(abs(out[3]) - 1.0) < 1e-6


def test_half_wave_plate_flips():
    s = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    hwp = mu.linear_retarder(jnp.asarray(np.pi))
    out = _m(mu.apply_stokes(hwp, s))
    assert np.allclose(out, [1.0, 0.0, -1.0, 0.0], atol=1e-6)


def test_circular_polarizer():
    s = mu.unpolarized_stokes(jnp.asarray(1.0))
    out_r = _m(mu.apply_stokes(mu.right_circular_polarizer(), s))
    out_l = _m(mu.apply_stokes(mu.left_circular_polarizer(), s))
    assert np.allclose(out_r, [0.5, 0, 0, 0.5], atol=1e-6)
    assert np.allclose(out_l, [0.5, 0, 0, -0.5], atol=1e-6)


def test_rotator_convention():
    """mueller.h:157: horizontal [1,1,0,0] under R(45 deg) becomes -45
    deg polarized [1,0,-1,0]."""
    s = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    out = _m(mu.apply_stokes(mu.rotator(jnp.asarray(np.pi / 4)), s))
    assert np.allclose(out, [1, 0, -1, 0], atol=1e-6)


def test_rotate_stokes_basis():
    """mueller.h:295 example: horizontal light in basis x re-expressed
    in a -45 deg basis reads as +45 deg polarized."""
    fwd = jnp.asarray([0.0, 0.0, 1.0])
    b0 = jnp.asarray([1.0, 0.0, 0.0])
    b1 = jnp.asarray([0.70710678, -0.70710678, 0.0])
    R = mu.rotate_stokes_basis(fwd, b0, b1)
    out = _m(mu.apply_stokes(R, jnp.asarray([1.0, 1.0, 0.0, 0.0])))
    assert np.allclose(out, [1, 0, 1, 0], atol=1e-5)


# -------------------------------------------------------------- fresnel


def test_fresnel_polarized_matches_scalar():
    """|a_s|^2/|a_p|^2 average equals the scalar Fresnel reflectance."""
    from mitsuba_tpu.core.fresnel import fresnel_dielectric

    ci = jnp.asarray(np.cos(np.radians([10.0, 35.0, 55.0, 80.0])),
                     jnp.float32)
    a_s, a_p, ctt, _, _ = mu.fresnel_polarized(ci, 1.5)
    r = 0.5 * (np.abs(_m(a_s)) ** 2 + np.abs(_m(a_p)) ** 2)
    F, *_ = fresnel_dielectric(ci, jnp.asarray(1.5))
    assert np.allclose(r, _m(F), atol=1e-5)


def test_brewster_angle_full_polarization():
    """At Brewster's angle r_p = 0: reflection is fully polarized with
    S1 = -S0 in the s/p basis (perpendicular component only)."""
    brewster = np.arctan(1.5)
    M = mu.specular_reflection(jnp.asarray(np.cos(brewster), jnp.float32),
                               1.5)
    out = _m(mu.apply_stokes(M, mu.unpolarized_stokes(jnp.asarray(1.0))))
    # dop = |S1|/S0 = 1, sign: s-component dominates -> S1 positive
    # with basis perpendicular to plane of incidence (a=b here)
    assert out[0] > 0.0
    assert abs(abs(out[1] / out[0]) - 1.0) < 1e-4
    # p reflectance zero -> a == b
    assert abs(out[1] - out[0]) < 1e-5


def test_conductor_phase_shift():
    """Complex-eta reflection produces circular coupling (nonzero 3,2
    entry) unlike the dielectric case."""
    eta = jnp.asarray(0.2 + 3.0j, jnp.complex64)
    M = _m(mu.specular_reflection(jnp.asarray(0.7, jnp.float32), eta))
    assert abs(M[3, 2]) > 1e-3
    Md = _m(mu.specular_reflection(jnp.asarray(0.7, jnp.float32), 1.5))
    assert abs(Md[3, 2]) < 1e-6


def test_specular_transmission_energy():
    """R + T = 1 at the interface (S0 entries, unpolarized input,
    accounting for the radiance compression factor)."""
    ci = jnp.asarray(0.9, jnp.float32)
    Mr = _m(mu.specular_reflection(ci, 1.5))
    Mt = _m(mu.specular_transmission(ci, 1.5))
    # transmission matrix includes the eta^2 radiance scaling factor
    # (factor = -eta_it * ctt/ci); undo to check energy conservation
    a_s, a_p, ctt, eta_it, eta_ti = mu.fresnel_polarized(ci, 1.5)
    factor = float(-eta_it * ctt / ci)
    T_energy = Mt[0, 0] / factor * float(-ctt / ci) / float(eta_ti)
    assert abs(Mr[0, 0] + T_energy - 1.0) < 1e-3


# ------------------------------------------------- plugins + integrator


def _flat_scene(bsdf_dicts):
    """Camera looking at a stack of polarizing plates in front of a
    directional-ish point source behind them."""
    from mitsuba_tpu.utils.load import load_dict

    d = {
        "type": "scene",
        "integrator": {"type": "stokes", "max_depth": 8},
        "sensor": {
            "type": "perspective", "fov": 10,
            "to_world": np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                                  [0, 0, 1, -6], [0, 0, 0, 1.0]],
                                 np.float32),
            "film": {"type": "hdrfilm", "width": 4, "height": 4},
            "sampler": {"type": "independent", "sample_count": 4},
        },
        # wall faces the camera (one-sided diffuse); the light sits
        # next to the wall so its shadow rays never cross the plates —
        # polarization happens only on the wall->camera leg
        "wall": {"type": "rectangle",
                 "to_world": np.asarray(
                     [[-4, 0, 0, 0], [0, 4, 0, 0], [0, 0, -1, 4],
                      [0, 0, 0, 1]], np.float32),
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb", "value": 1.0}}},
        "light": {"type": "point",
                  "intensity": {"type": "rgb", "value": [40, 40, 40]},
                  "position": [0, 3.0, 3.0]},
    }
    # plate 0 sits closest to the wall: light traverses the list in
    # order (wall -> plate0 -> plate1 -> ... -> camera)
    for i, b in enumerate(bsdf_dicts):
        d[f"plate{i}"] = {
            "type": "rectangle",
            "to_world": np.asarray(
                [[2, 0, 0, 0], [0, 2, 0, 0], [0, 0, 1, 2.5 - 0.5 * i],
                 [0, 0, 0, 1]], np.float32),
            "bsdf": b,
        }
    return load_dict(d)


def _stokes_center(scene, seed=0):
    from mitsuba_tpu.models.integrators.aov import render_aov

    imgs = render_aov(scene, scene.integrator, seed=seed)
    h, w = imgs["S0"].shape[:2]
    return {k: np.asarray(v)[h // 2, w // 2] for k, v in imgs.items()}


def test_stokes_polarizer_malus():
    """Two crossed polarizers in front of a diffuse wall: transmitted
    intensity follows Malus' law."""
    sc0 = _flat_scene([{"type": "polarizer"}])
    s_one = _stokes_center(sc0)

    sc90 = _flat_scene([{"type": "polarizer"},
                        {"type": "polarizer",
                         "theta": {"type": "rgb", "value": 90.0}}])
    s_crossed = _stokes_center(sc90)

    sc45 = _flat_scene([{"type": "polarizer"},
                        {"type": "polarizer",
                         "theta": {"type": "rgb", "value": 45.0}}])
    s_45 = _stokes_center(sc45)

    i1 = s_one["S0"].mean()
    assert i1 > 1e-4
    # crossed: extinction
    assert s_crossed["S0"].mean() < 0.02 * i1
    # 45 degrees: half of the single-polarizer intensity
    assert abs(s_45["S0"].mean() / i1 - 0.5) < 0.05
    # single polarizer output is fully linearly polarized
    dop = np.sqrt(s_one["S1"].mean() ** 2 + s_one["S2"].mean() ** 2
                  + s_one["S3"].mean() ** 2) / i1
    assert abs(dop - 1.0) < 0.02


def test_stokes_quarter_wave_circular():
    """Polarizer at 45 deg + QWP at 0 -> circularly polarized S3."""
    sc = _flat_scene([
        {"type": "polarizer",
         "theta": {"type": "rgb", "value": 45.0}},
        {"type": "retarder", "delta": {"type": "rgb", "value": 90.0}},
    ])
    s = _stokes_center(sc)
    i = s["S0"].mean()
    assert i > 1e-4
    assert abs(abs(s["S3"].mean()) / i - 1.0) < 0.05
    assert abs(s["S1"].mean() / i) < 0.05


def test_stokes_circular_plugin():
    sc = _flat_scene([{"type": "circular"}])
    s = _stokes_center(sc)
    i = s["S0"].mean()
    assert i > 1e-4
    assert abs(abs(s["S3"].mean()) / i - 1.0) < 0.05


def test_stokes_s0_matches_path():
    """S0 of the stokes integrator equals the scalar path render on an
    unpolarized scene (depolarizer promotion keeps transport equal)."""
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict
    from mitsuba_tpu.models.integrators.common import render

    d = cornell_box_dict(width=16, height=16, spp=8)
    d["integrator"] = {"type": "path", "max_depth": 4}
    img_path = np.asarray(render(load_dict(d), seed=5))
    d["integrator"] = {"type": "stokes", "max_depth": 4}
    img_stokes = np.asarray(render(load_dict(d), seed=5))
    np.testing.assert_allclose(img_stokes, img_path, atol=2e-3)


def test_polvis_outputs():
    from mitsuba_tpu.utils.polvis import apply_polarizer, polvis

    sc = _flat_scene([{"type": "polarizer"}])
    from mitsuba_tpu.models.integrators.aov import render_aov

    imgs = {k: np.asarray(v)
            for k, v in render_aov(sc, sc.integrator, seed=0).items()}
    out = polvis(imgs)
    for k in ("intensity", "s1", "s2", "s3", "dop", "top"):
        assert k in out and np.isfinite(out[k]).all()
    assert out["dop"][..., 0].max() > 0.9       # polarizer output
    # virtual analyzer at 90 deg to the (vertical-basis) polarization
    i_par = apply_polarizer(imgs, 90.0)
    i_perp = apply_polarizer(imgs, 0.0)
    hi = max(i_par.mean(), i_perp.mean())
    lo = min(i_par.mean(), i_perp.mean())
    assert lo < 0.1 * hi

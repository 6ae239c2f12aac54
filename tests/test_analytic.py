"""Analytic sphere/disk/cylinder shapes: exact intersections,
RayFlags differentiability modes, scene merge, cone-sampled emitters.

Reference parity targets: src/shapes/sphere.cpp (:560 intersect, :614
compute_surface_interaction, :236 cone sample_direction), disk.cpp,
cylinder.cpp.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mitsuba_tpu.core.records import Ray
from mitsuba_tpu.models.analytic import AnalyticShapes, SphereGeom, build_analytic
from mitsuba_tpu.utils.load import load_dict
from mitsuba_tpu.models.integrators.common import render


def _sphere(center=(0, 0, 0), radius=1.0, bsdf=0, emitter=-1):
    return ("sphere", np.asarray(center, np.float32), radius,
            bsdf, emitter, False, "s")


def _rays(np_rng, n=256, spread=4.0, unit=True):
    o = np_rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = np_rng.normal(size=(n, 3)).astype(np.float32)
    if unit:
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


# ------------------------------------------------------------ intersection


def test_sphere_intersection_matches_numpy(np_rng):
    an = build_analytic([_sphere((0.3, -0.2, 0.5), 0.8)])
    o, d = _rays(np_rng, unit=False)  # non-unit directions on purpose
    maxt = jnp.full((o.shape[0],), jnp.inf)
    t, prim = an.intersect(o, d, maxt, jnp.ones(o.shape[0], bool))
    # numpy closed form
    on, dn = np.asarray(o, np.float64), np.asarray(d, np.float64)
    c = np.asarray([0.3, -0.2, 0.5])
    L = c - on
    a = (dn * dn).sum(-1)
    b = (L * dn).sum(-1)
    disc = b * b - a * ((L * L).sum(-1) - 0.8**2)
    hit_np = disc > 0
    sq = np.sqrt(np.maximum(disc, 0))
    t0 = (b - sq) / a
    t1 = (b + sq) / a
    t_np = np.where(t0 > 0, t0, np.where(t1 > 0, t1, np.inf))
    t_np = np.where(hit_np, t_np, np.inf)
    tj = np.asarray(t)
    both = np.isfinite(t_np) & np.isfinite(tj)
    assert (np.isfinite(tj) == np.isfinite(t_np)).mean() > 0.995
    assert np.allclose(tj[both], t_np[both], rtol=1e-4, atol=1e-4)


def test_hit_points_on_surface(np_rng):
    """Every reported hit lies exactly on the primitive surface —
    the regression that caught non-unit sensor ray directions."""
    an = build_analytic([
        _sphere((0, 0, 0), 1.0),
        ("disk", np.zeros(3, np.float32),
         np.asarray([2, 0, 0], np.float32),
         np.asarray([0, 2, 0], np.float32),
         np.asarray([0, 0, 1], np.float32), 0, -1, False, "d"),
        ("cylinder", np.asarray([0, 0, -1], np.float32),
         np.asarray([0, 0, 1], np.float32), 2.0, 0.5, 0, -1, False, "c"),
    ])
    o, d = _rays(np_rng, n=512, unit=False)
    maxt = jnp.full((512,), jnp.inf)
    t, prim = an.intersect(o, d, maxt, jnp.ones(512, bool))
    hit = np.isfinite(np.asarray(t))
    p = np.asarray(o + d * t[:, None])[hit]
    pr = np.asarray(prim)[hit]
    # sphere hits: |p| == 1
    sp = pr == 0
    if sp.any():
        assert np.abs(np.linalg.norm(p[sp], axis=1) - 1).max() < 1e-3
    # disk hits: z == 0, r <= 2
    dk = pr == 1
    if dk.any():
        assert np.abs(p[dk][:, 2]).max() < 1e-3
        assert (np.linalg.norm(p[dk][:, :2], axis=1) <= 2.0 + 1e-3).all()
    # cylinder: dist to z-axis == 0.5, z in [-1, 1]
    cy = pr == 2
    if cy.any():
        assert np.abs(
            np.linalg.norm(p[cy][:, :2], axis=1) - 0.5).max() < 1e-3
        assert (np.abs(p[cy][:, 2]) <= 1.0 + 1e-3).all()


def test_si_fields(np_rng):
    an = build_analytic([_sphere((0, 0, 0), 1.0)])
    o = jnp.asarray([[0, 0, -4.0], [0.5, 0, -4.0]])
    d = jnp.asarray([[0, 0, 1.0], [0, 0, 1.0]])
    ray = Ray.make(o, d)
    t, prim = an.intersect(o, d, ray.maxt, jnp.ones(2, bool))
    si = an.compute_si(ray, t, prim, jnp.isfinite(t), shape_slot_base=7)
    assert np.allclose(np.asarray(si.p[0]), [0, 0, -1], atol=1e-5)
    assert np.allclose(np.asarray(si.n[0]), [0, 0, -1], atol=1e-5)
    assert int(si.shape_index[0]) == 7
    # wi points back at the camera in the local frame (z > 0)
    assert float(si.wi[0, 2]) > 0.99
    # uv: theta at -z pole = pi -> v = 1
    assert abs(float(si.uv[0, 1]) - 1.0) < 1e-5


# ----------------------------------------------------- differentiability


def _one_hit_setup():
    an = build_analytic([_sphere((0, 0, 0), 1.0)])
    o = jnp.asarray([[0.2, 0.1, -4.0]])
    d = jnp.asarray([[0, 0, 1.0]])
    ray = Ray.make(o, d)
    t, prim = an.intersect(o, d, ray.maxt, jnp.ones(1, bool))
    return an, ray, t, prim


def test_attach_mode_gradients():
    """attach: si.p slides along the fixed ray; dt/dr = -1/cos at the
    entry point; radius gradient flows."""
    an, ray, t, prim = _one_hit_setup()

    def f_t(r):
        si = an.replace(sp_radius=jnp.asarray([r])).compute_si(
            ray, t, prim, jnp.isfinite(t), mode="attach")
        return si.t[0]

    g = float(jax.grad(f_t)(1.0))
    # entry point ~(0.2, 0.1, -0.977): cos of incidence = |n.d| = 0.977
    assert np.isclose(g, -1.0 / 0.9772, rtol=1e-2)

    # p stays on the ray: dp/dr is parallel to d
    def f_p(r):
        si = an.replace(sp_radius=jnp.asarray([r])).compute_si(
            ray, t, prim, jnp.isfinite(t), mode="attach")
        return si.p[0]

    jp = jax.jacobian(f_p)(1.0)
    jp = np.asarray(jp)
    assert np.allclose(jp[:2], 0.0, atol=1e-5)   # moves only along z (=d)


def test_follow_shape_vs_detach_shape():
    """follow_shape: si.p moves 1:1 with the center; detach_shape: no
    shape gradient at all (interaction.h:19-68 semantics)."""
    an, ray, t, prim = _one_hit_setup()

    def p_of_center(cz, mode):
        an2 = an.replace(sp_center=jnp.asarray([[0.0, 0.0, cz]]))
        si = an2.compute_si(ray, t, prim, jnp.isfinite(t), mode=mode)
        return si.p[0]

    j_follow = np.asarray(jax.jacobian(
        lambda cz: p_of_center(cz, "follow_shape"))(0.0))
    # rigid: dp/dcz == (0, 0, 1)
    assert np.allclose(j_follow, [0, 0, 1], atol=1e-4)

    j_detach = np.asarray(jax.jacobian(
        lambda cz: p_of_center(cz, "detach_shape"))(0.0))
    assert np.allclose(j_detach, 0.0, atol=1e-7)

    # attach: p moves along the ray only (z component responds)
    j_attach = np.asarray(jax.jacobian(
        lambda cz: p_of_center(cz, "attach"))(0.0))
    assert np.allclose(j_attach[:2], 0.0, atol=1e-5)
    assert j_attach[2] != 0.0


# ------------------------------------------------------------ scene merge


def _scene_dict(analytic, light="point", spp=32, wh=16, subdiv=4):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 3},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": np.array(
                [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -4], [0, 0, 0, 1.]]),
            "film": {"type": "hdrfilm", "width": wh, "height": wh},
            "sampler": {"type": "independent", "sample_count": spp}},
        "sph": {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                "analytic": analytic, "subdiv": subdiv,
                "bsdf": {"type": "diffuse",
                         "reflectance": {"type": "rgb",
                                         "value": [0.8, 0.4, 0.2]}}},
    }
    if light == "point":
        d["light"] = {"type": "point",
                      "intensity": {"type": "rgb", "value": [30, 30, 30]},
                      "position": [2, 2, -3]}
    return d


def test_render_matches_tessellated():
    """Analytic and finely-tessellated renders converge to each other
    (the VERDICT item-6 'done' criterion)."""
    a = np.asarray(render(load_dict(_scene_dict(True)), seed=0))
    m = np.asarray(render(load_dict(_scene_dict(False, subdiv=5)), seed=0))
    assert np.abs(a - m).mean() < 0.01
    assert abs(a.mean() - m.mean()) / max(m.mean(), 1e-9) < 0.05


def test_analytic_occluder_shadows():
    """An analytic sphere between light and receiver casts a shadow
    (scene.ray_test merge)."""
    d = {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": np.array(
                [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -4], [0, 0, 0, 1.]]),
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
            "sampler": {"type": "independent", "sample_count": 16}},
        # wall at z=2 facing the camera (normal -z)
        "wall": {"type": "rectangle",
                 "to_world": np.array(
                     [[2, 0, 0, 0], [0, -2, 0, 0],
                      [0, 0, -1, 2.0], [0, 0, 0, 1.]]),
                 "bsdf": {"type": "diffuse"}},
        # blocker sits BEHIND the camera (invisible) between it and the
        # light, so only its cast shadow shows up on the wall
        "blocker": {"type": "sphere", "center": [0, 0, -6.0],
                    "radius": 0.6, "analytic": True,
                    "bsdf": {"type": "diffuse"}},
        "light": {"type": "point",
                  "intensity": {"type": "rgb", "value": [300, 300, 300]},
                  "position": [0, 0, -8.0]},
    }
    img_b = np.asarray(render(load_dict(d), seed=0))
    del d["blocker"]
    img_n = np.asarray(render(load_dict(d), seed=0))
    # with the blocker the image is strictly darker
    assert img_b.mean() < img_n.mean() * 0.9


# -------------------------------------------------------- sphere emitter


def test_cone_sampling_irradiance():
    """MC estimate of the cos-weighted radiance integral over the cone
    equals the closed form Le*pi*sin^2(theta_max) (sphere.cpp:236)."""
    geom = SphereGeom(center=jnp.asarray([0.0, 0.0, 3.0]),
                      radius=jnp.asarray(0.8))
    n = 4096
    key = np.random.default_rng(7)
    s2 = jnp.asarray(key.uniform(size=(n, 2)).astype(np.float32))
    ref = jnp.zeros((n, 3))
    p, nrm, pdf, outside = geom.cone_sample_direction(ref, s2)
    d = p - ref
    dist = jnp.linalg.norm(d, axis=-1, keepdims=True)
    dv = d / dist
    # receiver normal +z (toward sphere): integrand = cos(theta_ref)
    cos_ref = dv[:, 2]
    est = float(jnp.mean(cos_ref / pdf))
    sin2 = (0.8 / 3.0) ** 2
    exact = np.pi * sin2
    assert np.isclose(est, exact, rtol=2e-2)
    assert bool(outside.all())
    # pdf_direction consistency on the generated samples
    from mitsuba_tpu.core.records import DirectionSample
    ds = DirectionSample(
        p=p, n=nrm, uv=s2, d=dv, dist=dist[:, 0], pdf=pdf,
        delta=jnp.zeros(n, bool), emitter_index=jnp.zeros(n, jnp.int32))
    pdf2 = geom.cone_pdf_direction(ref, ds)
    assert np.allclose(np.asarray(pdf2), np.asarray(pdf), rtol=1e-4)


def test_sphere_emitter_render_matches_mesh_emitter():
    """Sphere area light: analytic cone-sampled NEE agrees with the
    tessellated-mesh area light."""
    def mk(analytic):
        return load_dict({
            "type": "scene",
            "integrator": {"type": "path", "max_depth": 3},
            "sensor": {
                "type": "perspective", "fov": 45,
                "to_world": np.array(
                    [[1, 0, 0, 0], [0, 1, 0, 0],
                     [0, 0, 1, -4], [0, 0, 0, 1.]]),
                "film": {"type": "hdrfilm", "width": 12, "height": 12},
                "sampler": {"type": "independent", "sample_count": 48}},
            "floor": {"type": "rectangle",
                      "to_world": np.array(
                          [[2, 0, 0, 0], [0, 2, 0, 0],
                           [0, 0, 1, 1.5], [0, 0, 0, 1.]]),
                      "bsdf": {"type": "diffuse"}},
            "lamp": {"type": "sphere", "center": [0, 0, -1.0],
                     "radius": 0.4, "analytic": analytic, "subdiv": 4,
                     "bsdf": {"type": "diffuse"},
                     "emitter": {"type": "area",
                                 "radiance": {"type": "rgb",
                                              "value": [8, 8, 8]}}},
        })
    a = np.asarray(render(mk(True), seed=3))
    m = np.asarray(render(mk(False), seed=3))
    assert abs(a.mean() - m.mean()) / max(m.mean(), 1e-9) < 0.06


# ---------------------------------------------------------- optimization


def test_radius_gradient_through_render():
    """End-to-end: d(image)/d(radius) via PRB is finite and matches
    finite differences in sign/scale — analytic shapes are optimizable
    (the interior term; silhouette terms live in prb_projective)."""
    from mitsuba_tpu.models.integrators.prb import PRBIntegrator, prb_render

    sc = load_dict(_scene_dict(True, spp=16, wh=8))
    integ = PRBIntegrator(max_depth=3, rr_depth=16)

    def loss(r):
        sc2 = sc.replace(scene_analytic=sc.scene_analytic.replace(
            sp_radius=jnp.asarray([r])))
        return jnp.mean(prb_render(sc2, integ, 0, 16, 8))

    g = float(jax.grad(loss)(1.0))
    f0, f1 = float(loss(0.98)), float(loss(1.02))
    fd = (f1 - f0) / 0.04
    assert np.isfinite(g) and g != 0.0
    # PRB yields the *interior* gradient only; the FD additionally sees
    # the (positive) silhouette term, so expect 0 < g < fd.
    assert np.sign(g) == np.sign(fd)
    assert abs(g) < abs(fd) * 1.5
    assert abs(g) > abs(fd) * 0.1


def test_traverse_exposes_analytic_params():
    from mitsuba_tpu.utils.params import traverse

    sc = load_dict(_scene_dict(True, spp=4, wh=4))
    params = traverse(sc, include="scene_analytic")
    keys = "\n".join(params)
    assert "sp_center" in keys and "sp_radius" in keys

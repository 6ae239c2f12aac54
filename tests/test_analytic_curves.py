"""Analytic swept-sphere curve primitives (models/analytic.py curve
prims vs the reference's linearcurve.cpp / bsplinecurve.cpp:1310).

The tube cross-section is exact (rounded cones per segment); a dense
tessellated tube provides the convergence reference: analytic hits must
match the high-res mesh within its faceting error, and normals must be
unit + consistent with the swept-sphere gradient.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.core.records import Ray
from mitsuba_tpu.utils.load import load_dict


CP = np.asarray([[-1.0, 0.0, 0.0], [-0.3, 0.4, 0.1],
                 [0.3, -0.2, -0.1], [1.0, 0.1, 0.0]], np.float32)
RADIUS = 0.25


def _curve_scene(analytic, curve_type="linearcurve", n_seg=48,
                 subdiv=8):
    d = {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 40,
            "to_world": np.asarray(
                tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])),
            "film": {"type": "hdrfilm", "width": 16, "height": 16},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "curve": {
            "type": curve_type,
            "control_points": CP,
            "radius": RADIUS,
            "analytic": analytic,
            "n_seg": n_seg,
            "subdiv": subdiv,
            "bsdf": {"type": "diffuse"},
        },
    }
    if not analytic:
        # the reference curve "is terminated by a spherical endcap"
        # (linearcurve.cpp:66-69); the tessellated tube is open, so the
        # mesh reference needs explicit cap spheres at the curve ends
        from mitsuba_tpu.models.shapes import bspline_centerline

        if curve_type == "bsplinecurve":
            pts, rads = bspline_centerline(CP, RADIUS, subdiv)
            ends = [(pts[0], rads[0]), (pts[-1], rads[-1])]
        else:
            ends = [(CP[0], RADIUS), (CP[-1], RADIUS)]
        for i, (c, r) in enumerate(ends):
            d[f"cap{i}"] = {"type": "sphere", "center": c,
                            "radius": float(r), "subdiv": 5,
                            "bsdf": {"type": "diffuse"}}
    return load_dict(d)


def _probe_rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    o = np.full((n, 3), [0.0, 0.0, 3.0], np.float32)
    tgt = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32) * \
        np.asarray([1.0, 0.6, 0.3], np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray.make(jnp.asarray(o), jnp.asarray(d))


@pytest.mark.parametrize("curve_type", ["linearcurve", "bsplinecurve"])
def test_analytic_curve_matches_dense_tessellation(curve_type):
    sc_a = _curve_scene(True, curve_type)
    sc_m = _curve_scene(False, curve_type, n_seg=96, subdiv=16)
    assert sc_a.scene_analytic is not None
    assert sc_a.scene_analytic.n_curves > 0

    ray = _probe_rays()
    si_a = sc_a.ray_intersect(ray)
    si_m = sc_m.ray_intersect(ray)
    hit_a = np.isfinite(np.asarray(si_a.t))
    hit_m = np.isfinite(np.asarray(si_m.t))
    # the tessellated tube (+cap spheres) is a subset of the swept
    # sphere: it lacks the spherical JOINTS between segments
    # (linearcurve.cpp:66 "connected by a smooth spherical joint"), so
    # analytic-only hits are expected at joints/silhouettes while
    # mesh-only hits must be (near) nonexistent
    assert (hit_m & ~hit_a).mean() < 0.005
    agree = (hit_a == hit_m).mean()
    assert agree > 0.94, agree
    both = hit_a & hit_m
    # mask BEFORE subtracting: miss lanes carry inf and inf-inf warns
    t_err = np.abs(np.asarray(si_a.t)[both] - np.asarray(si_m.t)[both])
    # the mitred mesh tube tilts its rings at joints (O(r*angle) there),
    # so compare quantiles: away from joints the two surfaces agree to
    # faceting error, near joints to the mitre error
    assert np.quantile(t_err, 0.25) < 2e-3
    assert np.median(t_err) < 1e-2
    # exact unit normals
    n_a = np.asarray(si_a.n)[both]
    assert np.allclose(np.linalg.norm(n_a, axis=1), 1.0, atol=1e-4)
    # normals roughly match the tessellated ones away from silhouettes
    n_m = np.asarray(si_m.n)[both]
    cosang = (n_a * n_m).sum(1)
    assert np.median(cosang) > 0.99


def test_curve_si_normal_is_swept_sphere_gradient():
    """On the cone side, |p - c(s)| == r(s) and n ~ (p - c(s)) up to
    the radius-taper tilt; check the implicit-surface residual."""
    sc = _curve_scene(True)
    ray = _probe_rays(2048, seed=2)
    si = sc.ray_intersect(ray)
    hit = np.isfinite(np.asarray(si.t))
    assert hit.sum() > 200
    ana = sc.scene_analytic
    pa = np.asarray(ana.cv_pa)
    pb = np.asarray(ana.cv_pb)
    ra = np.asarray(ana.cv_ra)
    rb = np.asarray(ana.cv_rb)
    p = np.asarray(si.p)[hit]
    # residual: min over segments of | |p - c(s*)| - r(s*) |
    res = np.full(p.shape[0], np.inf)
    for k in range(pa.shape[0]):
        ba = pb[k] - pa[k]
        m0 = float(ba @ ba)
        s = np.clip(((p - pa[k]) @ ba) / m0, 0.0, 1.0)
        c = pa[k][None] + s[:, None] * ba[None]
        r = ra[k] + s * (rb[k] - ra[k])
        res = np.minimum(res, np.abs(
            np.linalg.norm(p - c, axis=1) - r))
    # tangency s* differs from the projection s by O(taper angle);
    # bound stays well under the radius scale
    assert np.median(res) < 2e-3


def test_curve_gradients_attach_and_detach():
    """Radius gradients flow through attached curve SI and vanish in
    detach_shape mode (RayFlags semantics, interaction.h:19-68)."""
    sc = _curve_scene(True)
    ray = _probe_rays(512, seed=3)
    ana = sc.scene_analytic

    def mean_t(dr, mode):
        a2 = ana.replace(cv_ra=ana.cv_ra + dr, cv_rb=ana.cv_rb + dr)
        t_det, prim = a2.intersect(
            jax.lax.stop_gradient(ray.o), jax.lax.stop_gradient(ray.d),
            ray.maxt, jnp.ones((ray.o.shape[0],), bool))
        valid = jnp.isfinite(t_det)
        si = a2.compute_si(ray, jnp.where(valid, t_det, 1.0), prim,
                           valid, mode=mode)
        return jnp.sum(jnp.where(valid, si.t, 0.0))

    g_attach = jax.grad(mean_t)(jnp.asarray(0.0), "attach")
    g_detach = jax.grad(mean_t)(jnp.asarray(0.0), "detach_shape")
    # growing the radius moves hits closer -> negative dt/dr
    assert float(g_attach) < -1.0
    assert abs(float(g_detach)) < 1e-6


def test_curve_render_converges_to_mesh_render():
    from mitsuba_tpu.models.integrators import render

    img_a = np.asarray(render(_curve_scene(True), seed=0, spp=64))
    img_m = np.asarray(render(_curve_scene(False, n_seg=96, subdiv=16),
                              seed=0, spp=64))
    rel = abs(img_a.mean() - img_m.mean()) / img_m.mean()
    assert rel < 0.02, rel


def _dense_polyline_scene(cp, radius, subdiv=96):
    """Reference: the cubic centerline densely flattened into a
    LINEAR swept-sphere polyline (error O(1/subdiv^2))."""
    from mitsuba_tpu.models.shapes import bspline_centerline

    pts, rads = bspline_centerline(cp, np.full((cp.shape[0],), radius,
                                               np.float32), subdiv)
    return load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40,
                   "to_world": np.asarray(
                       tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])),
                   "film": {"type": "hdrfilm", "width": 16,
                            "height": 16}},
        "light": {"type": "constant", "radiance": 1.0},
        "curve": {"type": "linearcurve", "control_points": pts,
                  "radius": rads.tolist(), "analytic": True,
                  "bsdf": {"type": "diffuse"}},
    })


def _cubic_scene(cp, radius, subdiv=4):
    return load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {"type": "perspective", "fov": 40,
                   "to_world": np.asarray(
                       tf.look_at([0, 0, 4], [0, 0, 0], [0, 1, 0])),
                   "film": {"type": "hdrfilm", "width": 16,
                            "height": 16}},
        "light": {"type": "constant", "radiance": 1.0},
        "curve": {"type": "bsplinecurve", "control_points": cp,
                  "radius": radius, "analytic": True, "subdiv": subdiv,
                  "bsdf": {"type": "diffuse"}},
    })


def test_exact_cubic_matches_dense_polyline():
    """Round 4: the bsplinecurve analytic path intersects the TRUE
    cubic canal surface (Newton on the envelope conditions,
    bsplinecurve.cpp's per-ray solve) — hits agree with a very dense
    polyline flattening to its own convergence error, with NO
    centerline-flattening tolerance on the cubic side even at
    subdiv=3."""
    sc_exact = _cubic_scene(CP, RADIUS, subdiv=3)
    assert sc_exact.scene_analytic.any_cubic
    sc_ref = _dense_polyline_scene(CP, RADIUS, subdiv=96)

    ray = _probe_rays(4096, seed=5)
    t_e = np.asarray(sc_exact.ray_intersect(ray).t)
    t_r = np.asarray(sc_ref.ray_intersect(ray).t)
    hit_e, hit_r = np.isfinite(t_e), np.isfinite(t_r)
    # hit sets agree except a thin silhouette band (the dense polyline
    # still undercuts the true tube by its own flattening error)
    assert (hit_e != hit_r).mean() < 0.01, (hit_e != hit_r).mean()
    both = hit_e & hit_r
    err = np.abs(t_e[both] - t_r[both])
    assert np.median(err) < 2e-4, np.median(err)
    assert np.quantile(err, 0.95) < 2e-3, np.quantile(err, 0.95)


def test_exact_cubic_canal_residual():
    """Every exact-cubic hit lies ON the swept-sphere envelope:
    min_s | |p - c(s)| - r(s) | ~ 0 (the curvature-sensitive golden —
    a flattened centerline at subdiv=4 would violate this by the
    sagitta of each subsegment)."""
    from mitsuba_tpu.models.shapes import bspline_centerline

    # strongly curved spline: large angle between control legs
    cps = np.asarray([[-0.8, -0.5, 0.0], [-0.4, 0.7, 0.3],
                      [0.4, -0.7, -0.3], [0.8, 0.5, 0.0]], np.float32)
    sc = _cubic_scene(cps, 0.18, subdiv=4)
    ray = _probe_rays(4096, seed=7)
    si = sc.ray_intersect(ray)
    hit = np.isfinite(np.asarray(si.t))
    assert hit.sum() > 300
    p = np.asarray(si.p)[hit]

    dense, rdense = bspline_centerline(
        cps, np.full((4,), 0.18, np.float32), 256)
    d = np.linalg.norm(p[:, None, :] - dense[None], axis=-1) - rdense[None]
    res = np.abs(d).min(axis=1)
    assert np.median(res) < 2e-4, np.median(res)
    assert np.quantile(res, 0.95) < 2e-3, np.quantile(res, 0.95)
    # normals: unit and aligned with the touching-sphere gradient
    n = np.asarray(si.sh_n)[hit]
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)


def test_exact_cubic_gradients_flow():
    """Differentiable attachment: d(si.t)/d(radius) = -1 for a frontal
    hit on the cubic side surface (implicit-function correction)."""
    def t_of_r(r):
        sc = _cubic_scene(CP, 0.25, subdiv=4)
        ana = sc.scene_analytic
        # scale all radius control values by (1 + r)
        ana2 = ana.replace(cv_cr=ana.cv_cr * (1.0 + r),
                           cv_ra=ana.cv_ra * (1.0 + r),
                           cv_rb=ana.cv_rb * (1.0 + r))
        sc2 = sc.replace(scene_analytic=ana2)
        o = jnp.asarray([[0.0, 0.05, 3.0]])
        d = jnp.asarray([[0.0, 0.0, -1.0]])
        si = sc2.ray_intersect(Ray.make(o, d))
        return si.t[0]

    t0 = float(t_of_r(jnp.asarray(0.0)))
    assert np.isfinite(t0) and t0 < 3.5
    g = float(jax.grad(t_of_r)(jnp.asarray(0.0)))
    h = 1e-3
    fd = (float(t_of_r(jnp.asarray(h)))
          - float(t_of_r(jnp.asarray(-h)))) / (2 * h)
    assert abs(g - fd) < 0.05 * max(abs(fd), 1e-3), (g, fd)

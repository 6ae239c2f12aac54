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

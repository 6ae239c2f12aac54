"""Hair BSDF + curve shapes + measured BSDF."""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.core import rng


class _SI:
    def __init__(self, wi, n, u=0.3):
        self.wi = wi
        self.uv = jnp.full((n, 2), u)
        self.p = jnp.zeros((n, 3))
        self.wavelengths = jnp.zeros((n, 0))
        self.t = jnp.zeros((n,))


def _hair(sigma=0.0, **kw):
    from mitsuba_tpu.models.bsdfs import HairBSDF

    return HairBSDF(sigma_a=jnp.full((3,), sigma), **kw)


def test_hair_white_furnace():
    """sigma_a = 0: the 4-lobe model conserves energy — the sampled
    estimator's mean weight must be ~1 (hair.cpp tests do the same)."""
    n = 200000
    h = _hair(0.0, beta_m=jnp.asarray(0.4), beta_n=jnp.asarray(0.4))
    wi = jnp.broadcast_to(
        jnp.asarray([0.3, 0.8, jnp.sqrt(1.0 - 0.09 - 0.64)]), (n, 3))
    si = _SI(wi, n)
    s1 = rng.sample_1d(0, jnp.arange(n), 0)
    s2 = rng.sample_2d(0, jnp.arange(n), 1)
    bs, w = h.sample(si, s1, s2, jnp.ones(n, bool))
    w = np.asarray(w)
    assert np.isfinite(w).all()
    mean = w.mean(0)
    assert np.all(mean > 0.85) and np.all(mean < 1.15), mean


def test_hair_eval_normalization():
    """MC integral of eval over the sphere ~= total attenuation (<= 1),
    and absorption reduces it."""
    from mitsuba_tpu.core import warp

    n = 200000
    u = rng.sample_2d(2, jnp.arange(n), 0)
    wo = warp.square_to_uniform_sphere(u)
    wi = jnp.broadcast_to(jnp.asarray([0.2, 0.9, 0.3860]), (n, 3))
    si = _SI(wi, n)
    vals = {}
    for sig in (0.0, 0.5):
        h = _hair(sig)
        v, _ = h.eval_pdf(si, wo, jnp.ones(n, bool))
        vals[sig] = float(jnp.mean(v) * 4.0 * jnp.pi)
    assert 0.8 < vals[0.0] < 1.1, vals
    assert vals[0.5] < 0.8 * vals[0.0], vals


def test_hair_pdf_consistency():
    n = 50000
    h = _hair(0.1)
    wi = jnp.broadcast_to(jnp.asarray([0.1, 0.99, 0.1]) /
                          jnp.linalg.norm(jnp.asarray([0.1, 0.99, 0.1])),
                          (n, 3))
    si = _SI(wi, n)
    s1 = rng.sample_1d(5, jnp.arange(n), 0)
    s2 = rng.sample_2d(5, jnp.arange(n), 1)
    bs, w = h.sample(si, s1, s2, jnp.ones(n, bool))
    val, pdf = h.eval_pdf(si, bs.wo, jnp.ones(n, bool))
    m = np.asarray(bs.pdf) > 1e-6
    np.testing.assert_allclose(np.asarray(pdf)[m], np.asarray(bs.pdf)[m],
                               rtol=1e-4)
    # pdf integrates to 1 over the sphere
    from mitsuba_tpu.core import warp

    u = rng.sample_2d(3, jnp.arange(n), 7)
    wo_u = warp.square_to_uniform_sphere(u)
    _, pdf_u = h.eval_pdf(si, wo_u, jnp.ones(n, bool))
    tot = float(jnp.mean(pdf_u) * 4.0 * jnp.pi)
    assert abs(tot - 1.0) < 0.05, tot


def test_measured_matches_lambertian():
    from mitsuba_tpu.models.bsdfs import MeasuredBSDF, SmoothDiffuse
    from mitsuba_tpu.models.textures import ConstantTexture

    albedo = np.array([0.6, 0.4, 0.2], np.float32)
    data = jnp.broadcast_to(jnp.asarray(albedo / np.pi), (8, 8, 4, 3))
    mb = MeasuredBSDF(data=data)
    ref = SmoothDiffuse(reflectance=ConstantTexture(jnp.asarray(albedo)))
    n = 1000
    wi = jnp.broadcast_to(jnp.asarray([0.3, 0.2, 0.9327]), (n, 3))
    si = _SI(wi, n)
    s2 = rng.sample_2d(1, jnp.arange(n), 0)
    from mitsuba_tpu.core import warp

    wo = warp.square_to_cosine_hemisphere(s2)
    a, pa = mb.eval_pdf(si, wo, jnp.ones(n, bool))
    b, pb = ref.eval_pdf(si, wo, jnp.ones(n, bool))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-4)


def test_curve_meshes():
    from mitsuba_tpu.models.shapes import (
        bspline_curve_mesh, linear_curve_mesh,
    )

    cp = np.asarray([[0, 0, 0], [0, 0, 1], [0, 0.5, 2], [0, 1, 3]],
                    np.float32)
    v, f, n, uv = linear_curve_mesh(cp, 0.1, n_seg=8)
    assert v.shape[0] == 4 * 8 and f.shape[0] == 3 * 8 * 2
    # vertices lie at distance ~radius from their ring center
    ring0 = v[:8]
    d = np.linalg.norm(ring0 - cp[0], axis=1)
    np.testing.assert_allclose(d, 0.1, atol=1e-5)

    v2, f2, n2, uv2 = bspline_curve_mesh(cp, 0.1, n_seg=6, subdiv=5)
    assert v2.shape[0] > 0 and f2.shape[0] > 0
    # b-spline stays within the control hull
    assert v2[:, 1].min() > -0.2 and v2[:, 1].max() < 1.2


def test_curve_scene_renders():
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.integrators import DirectIntegrator, render
    from mitsuba_tpu.utils.load import load_dict

    scene = load_dict({
        "type": "scene",
        "strand": {"type": "bsplinecurve",
                   "control_points": [[-0.5, -0.5, 0], [-0.2, 0.3, 0],
                                      [0.2, -0.3, 0], [0.5, 0.5, 0]],
                   "radius": 0.08,
                   "bsdf": {"type": "hair"}},
        "light": {"type": "point", "position": [1, 1, 3],
                  "intensity": 20.0},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": np.asarray(
                tf.look_at([0, 0, 2.5], [0, 0, 0], [0, 1, 0]), np.float32),
            "film": {"width": 24, "height": 24},
            "sampler": {"type": "independent", "sample_count": 16},
        },
    })
    img = np.asarray(render(scene, DirectIntegrator(), seed=0, spp=16))
    assert np.isfinite(img).all() and img.max() > 1e-3

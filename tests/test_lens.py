"""[FORK] realistic-lens camera tests.

Mirrors the reference's built-in checks (realisticlens.cpp run_tests /
test_trace_ray_from_world reciprocity) plus optics ground truths: thick
lens focal length vs analytic lensmaker's equation, object-point imaging,
chromatic dispersion, and exit-pupil LUT consistency.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core.records import Ray
from mitsuba_tpu.lens import (
    make_lens_camera,
    thick_lens_approximation,
)
from mitsuba_tpu.models.film import Film, ReconstructionFilter

INF = float("inf")


@pytest.fixture(scope="module")
def singlet():
    return make_lens_camera("singlet", film=Film(width=32, height=32),
                            focus_distance=6.0)


def _film_point_trace(cam, o, d, wl=None):
    n = o.shape[0]
    wavelengths = (jnp.zeros((n, 0)) if wl is None
                   else jnp.full((n, 1), wl))
    ray = Ray(o=jnp.asarray(o), d=jnp.asarray(d),
              maxt=jnp.full((n,), INF), time=jnp.zeros((n,)),
              wavelengths=wavelengths)
    return cam.trace_ray_from_world(ray)


def test_thick_lens_focal_length(singlet):
    """Biconvex singlet R=50mm, n(589nm)=1.5046+0.021/0.589^2=1.565:
    thin-lens f = R/(2(n-1)) = 44.2mm; thick-lens slightly less."""
    p_img, f_img, p_obj, f_obj, ok = thick_lens_approximation(singlet)
    assert ok
    assert abs(f_img - 0.0444) < 0.002, f_img
    assert abs(f_img - f_obj) < 1e-4  # symmetric lens


def test_trace_reciprocity(singlet):
    """backward(forward(ray)) == ray (realisticlens.cpp:1987-2024)."""
    rng = np.random.default_rng(0)
    n = 512
    o = np.stack([rng.uniform(-0.01, 0.01, n), rng.uniform(-0.01, 0.01, n),
                  np.zeros(n)], axis=-1).astype(np.float32)
    tgt = np.stack(
        [rng.uniform(-0.004, 0.004, n), rng.uniform(-0.004, 0.004, n),
         np.full(n, float(singlet.rear_z))], axis=-1).astype(np.float32)
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    ray = Ray.make(jnp.asarray(o), jnp.asarray(d))
    out, active = singlet.trace_ray_from_film(ray)
    assert int(active.sum()) > n // 2
    back, ok2 = singlet.trace_ray_from_world(
        Ray.make(out.o, -out.d), active
    )
    t = -back.o[:, 2] / back.d[:, 2]
    p_back = np.asarray(back.o + back.d * t[:, None])
    m = np.asarray(active & ok2)
    err = np.linalg.norm(p_back[m] - o[m], axis=-1)
    assert err.max() < 1e-6, err.max()


def test_object_point_images_to_film_point(singlet):
    """Rays from the 6m focus point converge to a small on-axis spot."""
    rng = np.random.default_rng(1)
    n = 400
    front_z = float(singlet.interfaces[-1].z_intercept)
    ap = np.stack([rng.uniform(-0.004, 0.004, n),
                   rng.uniform(-0.004, 0.004, n),
                   np.full(n, front_z)], axis=-1).astype(np.float32)
    obj = np.array([0, 0, 6.0], np.float32)
    d = ap - obj
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out, ok = _film_point_trace(singlet, np.tile(obj, (n, 1)), d)
    t = -out.o[:, 2] / out.d[:, 2]
    pf = np.asarray(out.o + out.d * t[:, None])[np.asarray(ok)]
    assert len(pf) > 100
    rms = np.sqrt((np.linalg.norm(pf[:, :2], axis=-1) ** 2).mean())
    assert rms < 1e-4, rms  # focused to <0.1mm


def test_chromatic_dispersion():
    """Spot size at the d-line focus grows away from 589nm."""
    cam = make_lens_camera("singlet", film=Film(width=32, height=32),
                           spectral=True, focus_distance=6.0)
    rng = np.random.default_rng(2)
    n = 200
    front_z = float(cam.interfaces[-1].z_intercept)
    ap = np.stack([rng.uniform(-0.003, 0.003, n), np.zeros(n),
                   np.full(n, front_z)], axis=-1).astype(np.float32)
    obj = np.array([0, 0, 6.0], np.float32)
    d = ap - obj
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    def spot(wl):
        out, ok = _film_point_trace(cam, np.tile(obj, (n, 1)), d, wl)
        t = -out.o[:, 2] / out.d[:, 2]
        pf = np.asarray(out.o + out.d * t[:, None])[np.asarray(ok)]
        return np.sqrt(
            (np.linalg.norm(pf[:, :2] - pf[:, :2].mean(0), axis=-1) ** 2)
            .mean()
        )

    s_blue, s_d, s_red = spot(450.0), spot(589.3), spot(656.0)
    assert s_d < 2e-5
    assert s_blue > 3 * s_d
    assert s_red > 1.5 * s_d


def test_aperture_stop_vignettes():
    """The doublet's stop kills rays aimed outside its radius."""
    cam = make_lens_camera("doublet", film=Film(width=16, height=16),
                           focus_distance=6.0)
    kinds = [i.kind for i in cam.interfaces]
    assert kinds[-1] == "aperture"
    # a ray steeply angled at the rear element should die at the stop
    o = np.asarray([[0.012, 0.0, 0.0]], np.float32)
    d = np.asarray([[-0.5, 0.0, 1.0]], np.float32)
    d /= np.linalg.norm(d)
    ray = Ray.make(jnp.asarray(o), jnp.asarray(d))
    _, ok = cam.trace_ray_from_film(ray)
    assert not bool(ok[0])


def test_exit_pupil_lut_speedup_consistency():
    """LUT sampling must transmit a much larger fraction of rays while
    agreeing with the rear-element-disk reference image."""
    from mitsuba_tpu.core import rng as rngmod

    cam_lut = make_lens_camera(
        "singlet", film=Film(width=8, height=8), focus_distance=6.0,
        sample_exit_pupil=True, pupil_rays_per_segment=1 << 14,
        pupil_segments=16,
    )
    mn = np.asarray(cam_lut.pupil_min)
    mx = np.asarray(cam_lut.pupil_max)
    assert (mx > mn).all()
    # pupil bbox should be tighter than the full rear disk but not empty
    rear_r = float(cam_lut.rear_radius)
    area_lut = float(np.prod(mx[0] - mn[0]))
    assert area_lut < (3.0 * rear_r) ** 2
    assert area_lut > 0.0


def test_lens_render_cornell():
    from mitsuba_tpu.models.integrators import PathIntegrator, render
    from mitsuba_tpu.utils.scenes import cornell_box

    scene = cornell_box(width=24, height=24)
    cam = make_lens_camera(
        "singlet",
        film=Film(width=24, height=24, rfilter=ReconstructionFilter.box()),
        to_world=scene.sensor.to_world, focus_distance=3.9,
    )
    img = np.asarray(render(scene.replace(sensor=cam),
                            PathIntegrator(max_depth=3), seed=0, spp=16))
    assert np.isfinite(img).all()
    assert img.mean() > 0.02
    # image is upright: the ceiling light region is brighter than the floor
    assert img[2:8].mean() > img[16:22].mean()


def test_asph_lens_traces():
    """The all-aspheric design's Newton intersector transmits rays."""
    cam = make_lens_camera("asph", film=Film(width=8, height=8))
    rng = np.random.default_rng(3)
    n = 256
    # the rear element sits 0.235mm from the film: use near-axial rays
    # (steep rays are legitimately vignetted by this f/1.8 design)
    o = np.stack([rng.uniform(-2e-4, 2e-4, n), rng.uniform(-2e-4, 2e-4, n),
                  np.zeros(n)], axis=-1).astype(np.float32)
    ang = rng.uniform(-0.05, 0.05, (n, 2))
    d = np.stack([ang[:, 0], ang[:, 1], np.ones(n)], axis=-1).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out, ok = cam.trace_ray_from_film(Ray.make(jnp.asarray(o), jnp.asarray(d)))
    assert int(ok.sum()) > n // 2, int(ok.sum())
    assert np.isfinite(np.asarray(out.d)[np.asarray(ok)]).all()


def test_dispersive_dielectric_bsdf():
    """eta varies with the carried wavelength; energy conserved."""
    from mitsuba_tpu.models.bsdfs import DispersiveDielectric
    from mitsuba_tpu.core.records import SurfaceInteraction

    b = DispersiveDielectric(
        int_ior_d=jnp.asarray(1.5168), int_V_d=jnp.asarray(64.17),
        ext_ior_d=jnp.asarray(1.0), ext_V_d=jnp.asarray(0.0),
    )
    n = 64
    wi = jnp.broadcast_to(
        jnp.asarray([0.4, 0.0, np.sqrt(1 - 0.16)], jnp.float32), (n, 3)
    )
    si_blue = _fake_si(wi, 450.0)
    si_red = _fake_si(wi, 700.0)
    s1 = jnp.ones((n,))  # force transmission branch (sample1 > F)
    s2 = jnp.zeros((n, 2))
    bs_b, w_b = b.sample(si_blue, s1, s2, jnp.ones((n,), bool))
    bs_r, w_r = b.sample(si_red, s1, s2, jnp.ones((n,), bool))
    # blue refracts more strongly (higher IOR -> smaller |wo_x|)
    assert abs(float(bs_b.wo[0, 0])) < abs(float(bs_r.wo[0, 0]))
    assert float(bs_b.eta[0]) > float(bs_r.eta[0])


def _fake_si(wi, wl):
    from mitsuba_tpu.core.records import SurfaceInteraction

    n = wi.shape[0]
    z = jnp.zeros((n, 3))
    return SurfaceInteraction(
        t=jnp.ones((n,)), p=z,
        n=z.at[:, 2].set(1.0), sh_n=z.at[:, 2].set(1.0),
        sh_s=z.at[:, 0].set(1.0), sh_t=z.at[:, 1].set(1.0),
        uv=jnp.zeros((n, 2)), wi=wi,
        shape_index=jnp.zeros((n,), jnp.int32),
        prim_index=jnp.zeros((n,), jnp.int32),
        wavelengths=jnp.full((n, 1), wl),
        time=jnp.zeros((n,)),
    )

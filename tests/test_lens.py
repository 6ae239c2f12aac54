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


def _emitter_plane_scene(width=24, height=24, scale=0.35, smooth=False):
    """One white-emitter rectangle, black surroundings.  ``smooth`` swaps
    the constant radiance for a smoothly varying bitmap (differentiable
    in uv) so FD-vs-AD camera-gradient checks aren't visibility-bound."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.bsdfs import SmoothDiffuse
    from mitsuba_tpu.models.emitters import AreaEmitter
    from mitsuba_tpu.models.scene import make_scene
    from mitsuba_tpu.models.sensors import PerspectiveCamera
    from mitsuba_tpu.models.shapes import Mesh, rectangle
    from mitsuba_tpu.models.textures import BitmapTexture, ConstantTexture

    v, f, _, uv = rectangle(np.asarray(
        tf.compose(tf.translate([0.0, 0.0, 0.0]), tf.scale(scale)),
        np.float32))
    em = Mesh.make(jnp.asarray(v), jnp.asarray(f), normals=None,
                   uvs=jnp.asarray(uv), bsdf_index=0, emitter_index=0,
                   id="panel")
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.asarray([0.5, 0.5, 0.5])))
    if smooth:
        yy, xx = np.meshgrid(np.linspace(0, 1, 32), np.linspace(0, 1, 32),
                             indexing="ij")
        data = 1.0 + 4.0 * np.exp(-8.0 * ((xx - 0.5) ** 2 + (yy - 0.5) ** 2))
        rad = BitmapTexture(
            data=jnp.asarray(np.repeat(data[..., None], 3, -1), jnp.float32))
        emitter = AreaEmitter(radiance=rad)
    else:
        emitter = AreaEmitter(radiance=ConstantTexture(jnp.asarray([5.0, 5.0, 5.0])))
    film = Film(width=width, height=height, rfilter=ReconstructionFilter.box())
    sensor = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 3.0], [0, 0, 0], [0, 1, 0])),
        film=film, fov=40.0)
    return make_scene([em], [white], [emitter], sensor)


def test_spectral_camera_path_chromatic_fringing():
    """Camera-side spectral transport (endpoint.h:95-314): a white panel
    rendered through the spectral doublet with PathIntegrator shows
    R/B fringing at its edges; the RGB (non-spectral) camera shows none."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.integrators import PathIntegrator, render

    scene = _emitter_plane_scene()

    def fringe(spectral):
        cam = make_lens_camera(
            "doublet",
            film=Film(width=24, height=24, rfilter=ReconstructionFilter.box()),
            to_world=jnp.asarray(tf.look_at([0, 0, 3.0], [0, 0, 0],
                                            [0, 1, 0])),
            focus_distance=3.0, spectral=spectral)
        img = np.asarray(render(scene.replace(sensor=cam),
                                PathIntegrator(max_depth=2), seed=0, spp=64))
        assert np.isfinite(img).all() and img.mean() > 1e-3
        return np.abs(img[..., 0] - img[..., 2]).mean()

    f_rgb = fringe(False)
    f_spec = fringe(True)
    # white emitter + RGB camera -> identical channels (up to rounding);
    # the spectral camera disperses -> clear channel separation
    assert f_spec > 5.0 * max(f_rgb, 1e-6), (f_spec, f_rgb)


def test_camera_dispersion_gradient_fd():
    """d(render)/d(Cauchy B) through the camera-side path integrator:
    forward-mode AD vs finite differences (realisticlens.cpp:2215 +
    dispersive IOR, matched to test_ad_integrators.py-style FD checks)."""
    import jax
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.integrators import PathIntegrator, render

    scene = _emitter_plane_scene(width=12, height=12, scale=2.0, smooth=True)
    cam0 = make_lens_camera(
        "singlet",
        film=Film(width=12, height=12, rfilter=ReconstructionFilter.box()),
        to_world=jnp.asarray(tf.look_at([0, 0, 3.0], [0, 0, 0], [0, 1, 0])),
        focus_distance=3.0, spectral=True)

    def loss(db):
        ifaces = []
        for it in cam0.interfaces:
            left = it.left.replace(
                cauchy=it.left.cauchy + jnp.asarray([0.0, 1.0]) * db
                * (it.left.cauchy[0] > 1.01))
            right = it.right.replace(
                cauchy=it.right.cauchy + jnp.asarray([0.0, 1.0]) * db
                * (it.right.cauchy[0] > 1.01))
            ifaces.append(it.replace(left=left, right=right))
        cam = cam0.replace(interfaces=tuple(ifaces))
        img = render(scene.replace(sensor=cam), PathIntegrator(max_depth=2),
                     seed=0, spp=16)
        return jnp.mean(img * img)

    g = float(jax.jacfwd(loss)(0.0))
    eps = 2e-4
    fd = float((loss(eps) - loss(-eps)) / (2 * eps))
    assert np.isfinite(g)
    assert abs(g - fd) < 0.1 * max(abs(fd), 1e-6), (g, fd)


def test_camera_dispersion_gradient_backward_prb():
    """Sensor gradients through BACKWARD PRB: primary rays are
    regenerated from the attached scene in the adjoint pass
    (common.py:302 resume_grad around sample_ray_differential), so
    d(render)/d(Cauchy B) matches finite differences."""
    import jax
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.integrators import PRBIntegrator
    from mitsuba_tpu.models.integrators.prb import prb_render

    scene = _emitter_plane_scene(width=12, height=12, scale=2.0,
                                 smooth=True)
    cam0 = make_lens_camera(
        "singlet",
        film=Film(width=12, height=12,
                  rfilter=ReconstructionFilter.box()),
        to_world=jnp.asarray(tf.look_at([0, 0, 3.0], [0, 0, 0],
                                        [0, 1, 0])),
        focus_distance=3.0, spectral=True)
    sc0 = scene.replace(sensor=cam0)
    integ = PRBIntegrator(max_depth=2)

    def with_db(sc, db):
        ifaces = []
        for it in sc.sensor.interfaces:
            l_ = it.left.replace(
                cauchy=it.left.cauchy + jnp.asarray([0.0, 1.0]) * db
                * (it.left.cauchy[0] > 1.01))
            r_ = it.right.replace(
                cauchy=it.right.cauchy + jnp.asarray([0.0, 1.0]) * db
                * (it.right.cauchy[0] > 1.01))
            ifaces.append(it.replace(left=l_, right=r_))
        return sc.replace(sensor=sc.sensor.replace(
            interfaces=tuple(ifaces)))

    def loss(db):
        img = prb_render(with_db(sc0, db), integ, 0, 16, 16)
        return jnp.mean(img * img)

    g = float(jax.grad(loss)(jnp.float32(0.0)))
    eps = 2e-4
    fd = float((loss(eps) - loss(-eps)) / (2 * eps))
    assert np.isfinite(g)
    assert abs(g - fd) < 0.15 * max(abs(fd), 1e-6), (g, fd)

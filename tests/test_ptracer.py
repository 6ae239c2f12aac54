"""Particle tracer + prb_basic tests.

The headline check is cross-estimator agreement: light tracing and path
tracing estimate the same measurement integral, so their Cornell-box
images must agree (the reference validates ptracer the same way via
golden images, test_renders.py).
"""
import numpy as np
import jax.numpy as jnp

from mitsuba_tpu.models.integrators import (
    ParticleTracerIntegrator,
    PathIntegrator,
    PRBBasicIntegrator,
    render,
)
from mitsuba_tpu.utils.scenes import cornell_box


def test_ptracer_matches_path():
    scene = cornell_box(width=24, height=24)
    p = np.asarray(render(scene, PathIntegrator(max_depth=3, rr_depth=16),
                          seed=0, spp=384))
    t = np.asarray(
        render(scene, ParticleTracerIntegrator(max_depth=3, rr_depth=16),
               seed=0, spp=384))
    # overall flux agreement
    assert abs(t.mean() / p.mean() - 1.0) < 0.03, (p.mean(), t.mean())
    # per-channel interior agreement
    a, b = p[5:19, 5:19].mean((0, 1)), t[5:19, 5:19].mean((0, 1))
    assert np.all(np.abs(a - b) / a < 0.06), (a, b)


def test_ptracer_through_dielectric():
    """Flux agreement with a glass box in the scene (importance-mode eta
    handling)."""
    from mitsuba_tpu.models.bsdfs import SmoothDielectric

    scene = cornell_box(width=16, height=16)
    bsdfs = list(scene.bsdfs) + [SmoothDielectric(eta=jnp.asarray(1.5))]
    meshes = list(scene.meshes)
    meshes[6] = meshes[6].replace(bsdf_index=3)  # small box -> glass
    scene = scene.replace(bsdfs=tuple(bsdfs), meshes=tuple(meshes))
    p = np.asarray(render(scene, PathIntegrator(max_depth=6, rr_depth=16),
                          seed=0, spp=256))
    t = np.asarray(
        render(scene, ParticleTracerIntegrator(max_depth=6, rr_depth=16),
               seed=0, spp=256))
    assert abs(t.mean() / p.mean() - 1.0) < 0.08, (p.mean(), t.mean())


def test_prb_basic_matches_path_no_nee():
    """prb_basic's primal estimator (BSDF sampling only) converges to the
    same image as path for a scene dominated by direct emitter hits."""
    scene = cornell_box(width=16, height=16)
    a = np.asarray(render(scene, PRBBasicIntegrator(max_depth=4),
                          seed=0, spp=1024))
    b = np.asarray(render(scene, PathIntegrator(max_depth=4, rr_depth=32),
                          seed=1, spp=256))
    # BSDF-only sampling is noisy; compare means
    assert abs(a.mean() / b.mean() - 1.0) < 0.1, (a.mean(), b.mean())


def test_prb_basic_trace_through_glass_slab():
    """trace() forced-transmission propagation through a dielectric slab
    lands on the film plane behind it with the expected lateral offset."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.core.records import Ray
    from mitsuba_tpu.models.bsdfs import SmoothDielectric, SmoothDiffuse
    from mitsuba_tpu.models.scene import make_scene
    from mitsuba_tpu.models.sensors import PerspectiveCamera
    from mitsuba_tpu.models.shapes import Mesh, rectangle
    from mitsuba_tpu.models.textures import ConstantTexture

    # glass slab between z=1 and z=1.2 (normals facing OUT of the glass);
    # film plane at z=0
    def mk(z, b, flip=False):
        ops = [tf.translate([0, 0, z])]
        if flip:
            ops.append(tf.rotate([1, 0, 0], 180))
        ops.append(tf.scale([2, 2, 1]))
        return Mesh.make(
            *rectangle(np.asarray(tf.compose(*ops), np.float32)),
            bsdf_index=b,
        )

    glass = SmoothDielectric(eta=jnp.asarray(1.5))
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.ones(3)))
    film_plane = mk(0.0, 1)
    slab_a = mk(1.0, 0, flip=True)  # bottom face: normal -z (out of glass)
    slab_b = mk(1.2, 0)             # top face: normal +z
    cam = PerspectiveCamera(to_world=jnp.eye(4))
    scene = make_scene([slab_a, slab_b, film_plane], [glass, white], [], cam)

    integ = PRBBasicIntegrator(max_depth=8)
    # oblique ray from above aiming at the slab
    n = 1
    o = jnp.asarray([[0.3, 0.0, 2.0]])
    d = jnp.asarray([[-0.3, 0.0, -1.0]])
    d = d / jnp.linalg.norm(d)
    ray = Ray.make(o, d)
    pen_o, pen_d, valid, p = integ.trace(scene, ray, 3)
    assert bool(valid[0])
    # the slab laterally shifts the ray but keeps its direction:
    # final direction == initial direction
    np.testing.assert_allclose(np.asarray(pen_d[0]), np.asarray(d[0]),
                               atol=1e-4)
    # lateral displacement from a t=0.2 slab at 1.5 IOR, theta=16.7deg:
    # d = t*sin(th)*(1 - cos(th)/sqrt(n^2 - sin^2 th)) ~ 0.0197
    x_no_slab = 0.3 + (-0.3 / 1.0440307) * (2.0 / (1.0 / 1.0440307))
    # without the slab the ray hits x = 0.3 - 0.3*2 = -0.3
    expect_shift = 0.2 * np.sin(0.2914567) * (
        1 - np.cos(0.2914567) / np.sqrt(1.5**2 - np.sin(0.2914567) ** 2)
    )
    got_x = float(p[0, 0])
    assert abs(got_x - (-0.3 + expect_shift)) < 1e-3, (got_x, -0.3 + expect_shift)


def test_ptracer_loadable():
    from mitsuba_tpu import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict

    d = cornell_box_dict(width=8, height=8, spp=4)
    d["integrator"] = {"type": "ptracer", "max_depth": 3}
    scene = load_dict(d)
    img = np.asarray(render(scene))
    assert img.shape == (8, 8, 3) and np.isfinite(img).all()


def test_spectral_ptracer_flux():
    """Spectral (hero-wavelength) light tracing integrates back to the
    RGB estimate: total flux agrees with the RGB ptracer within MC noise
    + the flat-spectrum (E) vs sRGB (D65) white-point difference."""
    scene = cornell_box(width=16, height=16)
    rgbm = np.asarray(
        render(scene, ParticleTracerIntegrator(max_depth=3, rr_depth=16),
               seed=0, spp=512))
    spec = np.asarray(
        render(scene,
               ParticleTracerIntegrator(max_depth=3, rr_depth=16,
                                        spectral=True),
               seed=0, spp=512))
    assert np.isfinite(spec).all()
    assert abs(spec.mean() / rgbm.mean() - 1.0) < 0.08, (
        rgbm.mean(), spec.mean())


def test_spectral_rays_reach_dispersive_bsdf():
    """With spectral=True the walk's rays carry per-lane wavelengths, so
    a dispersive dielectric refracts differently across lanes."""
    from mitsuba_tpu.models.bsdfs import DispersiveDielectric

    scene = cornell_box(width=16, height=16)
    glass = DispersiveDielectric(
        int_ior_d=jnp.asarray(1.6), int_V_d=jnp.asarray(30.0),
        ext_ior_d=jnp.asarray(1.000277), ext_V_d=jnp.asarray(0.0))
    bsdfs = list(scene.bsdfs) + [glass]
    meshes = list(scene.meshes)
    meshes[6] = meshes[6].replace(bsdf_index=3)
    scene = scene.replace(bsdfs=tuple(bsdfs), meshes=tuple(meshes))
    img = np.asarray(
        render(scene,
               ParticleTracerIntegrator(max_depth=6, rr_depth=16,
                                        spectral=True),
               seed=0, spp=128))
    assert np.isfinite(img).all() and img.mean() > 0.01

"""Ray differentials + footprint-aware texture filtering (reference
sensor.h:62 sample_ray_differential, interaction.h:85 compute_uv_partials,
bitmap mip lookups)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.models.bsdfs import SmoothDiffuse
from mitsuba_tpu.models.emitters import AreaEmitter, ConstantEmitter
from mitsuba_tpu.models.film import Film, ReconstructionFilter
from mitsuba_tpu.models.integrators import PathIntegrator, render, sample_rays
from mitsuba_tpu.models.scene import make_scene
from mitsuba_tpu.models.sensors import PerspectiveCamera, sample_ray_differential
from mitsuba_tpu.models.shapes import Mesh, rectangle
from mitsuba_tpu.models.textures import BitmapTexture, ConstantTexture


def _tex_scene(tex, z=2.0, fov=40.0, w=24, h=24):
    quad = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, z]), tf.rotate([0, 1, 0], 180),
                   tf.scale(4.0)), np.float32)),
        bsdf_index=0, id="quad")
    white = SmoothDiffuse(reflectance=tex)
    em = ConstantEmitter(radiance=jnp.full((3,), 1.0),
                         scene_center=jnp.zeros(3),
                         scene_radius=jnp.asarray(1.0))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, -2], [0, 0, 0], [0, 1, 0])),
        fov=fov,
        film=Film(width=w, height=h, rfilter=ReconstructionFilter.box()))
    return make_scene([quad], [white], [em], cam, use_bvh=False)


def test_uv_partials_match_analytic():
    """For a fronto-parallel textured quad, duv/dpixel is the quad's uv
    extent over its pixel extent — closed form."""
    tex = ConstantTexture(jnp.full(3, 0.5))
    scene = _tex_scene(tex)
    rd, wgt, film_pos, lane = sample_rays(scene, jnp.uint32(0), 1,
                                          with_differentials=True)
    si = scene.ray_intersect(rd.ray)
    si = scene.compute_si_differentials(si, rd)
    duv = np.asarray(si.duv_dx)
    ok = np.asarray(si.is_valid())
    # quad spans uv in [0,1]^2 over 8 world units at z=4 from the camera;
    # the image plane at fov 40 spans 2*tan(20)*4 ~ 2.91 world units over
    # 24 px -> per-pixel du = (2.91/24)/8
    expect = (2 * np.tan(np.radians(20.0)) * 4.0 / 24.0) / 8.0
    got = np.abs(duv[ok][:, 0])
    assert np.isfinite(got).all()
    assert abs(np.median(got) - expect) < 0.25 * expect, (
        np.median(got), expect)


def test_mip_pyramid_build():
    data = jnp.asarray(np.random.default_rng(0).uniform(
        size=(16, 16, 3)), jnp.float32)
    t = BitmapTexture.with_mips(data)
    assert len(t.mips) == 4
    assert t.mips[-1].shape[:2] == (1, 1)
    np.testing.assert_allclose(np.asarray(t.mips[-1][0, 0]),
                               np.asarray(data.mean((0, 1))), rtol=1e-5)


def test_footprint_filtering_reduces_aliasing():
    """A 1-texel checker viewed at minification: the footprint-aware
    render converges to the checker mean; the point-sampled render
    retains high-variance aliasing."""
    rng = np.random.default_rng(1)
    checker = np.indices((64, 64)).sum(0) % 2
    data = np.repeat(checker[:, :, None], 3, -1).astype(np.float32)
    mean = data.mean()

    def render_with(tex, seed):
        scene = _tex_scene(tex, w=12, h=12)
        img = render(scene, PathIntegrator(max_depth=2, ray_diffs=True),
                     seed=seed, spp=4)
        return np.asarray(img)

    img_mip = render_with(BitmapTexture.with_mips(jnp.asarray(data)), 0)
    img_pt = render_with(BitmapTexture(data=jnp.asarray(data)), 0)
    assert np.isfinite(img_mip).all()
    # both renders average to the checker mean, but the filtered lookup
    # flattens the per-pixel aliasing pattern
    assert abs(img_mip.mean() - img_pt.mean()) < 0.15 * img_pt.mean()
    assert img_mip.std() < 0.7 * img_pt.std(), (img_mip.std(),
                                                img_pt.std())


def test_ray_diffs_do_not_change_constant_scene():
    """With no mip textures the ray_diffs path renders identically."""
    tex = ConstantTexture(jnp.full(3, 0.6))
    scene = _tex_scene(tex)
    a = np.asarray(render(scene, PathIntegrator(max_depth=2), seed=0,
                          spp=4))
    b = np.asarray(render(scene, PathIntegrator(max_depth=2,
                                                ray_diffs=True),
                          seed=0, spp=4))
    np.testing.assert_allclose(a, b, atol=1e-6)

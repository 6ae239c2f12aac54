"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The key invariant (SURVEY §4 'multi-chip tests'): a sharded render equals
the single-chip render bitwise-in-expectation — global lane ids feed the
stateless RNG, so partitioning cannot change any sample.
"""
import numpy as np
import jax
import pytest

from mitsuba_tpu.models.integrators import PathIntegrator, render
from mitsuba_tpu.parallel import make_mesh, render_sharded
from mitsuba_tpu.utils.scenes import cornell_box


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_render_matches_single_chip(n_dev):
    assert len(jax.devices()) >= n_dev
    scene = cornell_box(width=16, height=16)
    integ = PathIntegrator(max_depth=3)
    ref = np.asarray(render(scene, integ, seed=0, spp=8))
    mesh = make_mesh(n_dev)
    got = np.asarray(render_sharded(scene, integ, mesh, seed=0, spp=8))
    # identical samples; tolerance only for float32 accumulation-order
    # differences between the single scatter and per-shard partials + psum
    np.testing.assert_allclose(ref, got, rtol=1e-3, atol=1e-4)


def test_sharded_render_nondivisible_wavefront():
    """16x16x3 spp = 768 lanes over 8 devices = 96/chip (divisible), but
    spp=5 gives 1280... use a 10x10 film, spp=3 -> 300 lanes, pad to 304."""
    scene = cornell_box(width=10, height=10)
    integ = PathIntegrator(max_depth=2)
    ref = np.asarray(render(scene, integ, seed=0, spp=3))
    got = np.asarray(
        render_sharded(scene, integ, make_mesh(8), seed=0, spp=3)
    )
    np.testing.assert_allclose(ref, got, rtol=1e-3, atol=1e-4)


def test_sharded_megakernel_path_matches_single_chip():
    """The Pallas megakernel fast path (sorted per-bounce BVH pipeline)
    through shard_map: the sharded image must equal the single-chip one
    (VERDICT r3 next-step #5 — previously only the wavefront
    integrator was sharded).  Lane ids are global, so per-shard RNG
    streams are identical to the single-chip run by construction."""
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.integrators import MegakernelPathIntegrator
    from mitsuba_tpu.models.scene import make_scene
    from mitsuba_tpu.models.shapes import Mesh, sphere_mesh

    base = cornell_box(width=8, height=8)
    v, f, n, uv = sphere_mesh(
        3, np.asarray(tf.compose(tf.translate([0.3, 0.2, 0.2]),
                                 tf.scale(0.35))))
    ball = Mesh.make(v, f, normals=n, uvs=uv, bsdf_index=0, id="ball")
    scene = make_scene(list(base.meshes) + [ball], list(base.bsdfs),
                       list(base.emitters), base.sensor)
    assert scene.packet_accel is not None  # >1024 faces -> BVH kernel

    integ = MegakernelPathIntegrator(max_depth=2, rr_depth=16)
    ref = np.asarray(render(scene, integ, seed=0, spp=2))
    got = np.asarray(
        render_sharded(scene, integ, make_mesh(8), seed=0, spp=2))
    np.testing.assert_allclose(ref, got, rtol=1e-3, atol=1e-4)

"""Exact analytic-sphere silhouette gradients (projective boundary term).

VERDICT item 6 'done' criterion: sphere silhouette gradients beat
mesh-edge ones on a pose-recovery setup.  Reference:
sphere.cpp:383-475 sample_silhouette / projective.py boundary term.

Setup mirrors tests/test_projective.py: a constant-radiance emitter on
a black background has ~zero interior gradient, so the translation
gradient is purely the silhouette term; prb_projective must match FD.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.models.analytic import build_analytic
from mitsuba_tpu.models.bsdfs import SmoothDiffuse
from mitsuba_tpu.models.emitters import AreaEmitter
from mitsuba_tpu.models.film import Film, ReconstructionFilter
from mitsuba_tpu.models.integrators import (
    PathProjectiveIntegrator,
    build_silhouette_edges,
    prb_projective_render,
)
from mitsuba_tpu.models.scene import make_scene
from mitsuba_tpu.models.sensors import PerspectiveCamera
from mitsuba_tpu.models.shapes import Mesh, rectangle, sphere_mesh
from mitsuba_tpu.models.textures import ConstantTexture

RES = 32
_RAMP = jnp.arange(RES, dtype=jnp.float32)[None, :, None] / RES


def _cam():
    return PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])),
        fov=45.0,
        film=Film(width=RES, height=RES,
                  rfilter=ReconstructionFilter.box()),
    )


def _backdrop():
    """Large black quad behind the sphere: gives the edge table real
    (but out-of-frame / zero-contrast) edges."""
    w = np.asarray(tf.compose(tf.translate([0, 0, -4.0]),
                              tf.scale(20.0)), np.float32)
    return Mesh.make(*rectangle(w), bsdf_index=0, id="backdrop")


def _analytic_scene(dx=0.0):
    an = build_analytic([
        ("sphere", np.asarray([dx, 0.0, 0.0], np.float32), 0.5,
         0, 0, False, "ball")])
    em = AreaEmitter(radiance=ConstantTexture(jnp.ones(3)))
    black = SmoothDiffuse(reflectance=ConstantTexture(jnp.zeros(3)))
    return make_scene([_backdrop()], [black], [em], _cam(),
                      use_bvh=False, analytic=an)


def _mesh_scene(dx=0.0, subdiv=2):
    w = np.asarray(tf.compose(tf.translate([dx, 0.0, 0.0]),
                              tf.scale(0.5)), np.float32)
    ball = Mesh.make(*sphere_mesh(subdiv, w), bsdf_index=0,
                     emitter_index=0, id="ball")
    em = AreaEmitter(radiance=ConstantTexture(jnp.ones(3)))
    black = SmoothDiffuse(reflectance=ConstantTexture(jnp.zeros(3)))
    return make_scene([_backdrop(), ball], [black], [em], _cam(),
                      use_bvh=False)


def _W():
    return jnp.broadcast_to(_RAMP, (RES, RES, 3))


def _fd(make, h=0.05, spp=64, seed=0):
    W = _W()

    def primal(dx):
        s = make(dx)
        e = build_silhouette_edges(s)
        integ = PathProjectiveIntegrator(max_depth=2, sppp=4096, n_sub=2,
                                         indirect=False)
        return float(jnp.sum(
            prb_projective_render(s, e, integ, seed, spp) * W))

    return (primal(h) - primal(-h)) / (2 * h)


@pytest.mark.slow
def test_analytic_sphere_silhouette_matches_fd():
    spp, seed = 64, 0
    W = _W()
    scene = _analytic_scene()
    edges = build_silhouette_edges(scene)
    integ = PathProjectiveIntegrator(max_depth=2, sppp=4096, n_sub=2,
                                     indirect=False)

    def loss(s):
        return jnp.sum(prb_projective_render(s, edges, integ, seed, spp)
                       * W)

    g = jax.grad(loss, allow_int=True)(scene)
    ad = float(g.scene_analytic.sp_center[0, 0])
    fd = _fd(_analytic_scene)
    assert np.isfinite(ad) and ad != 0.0
    assert np.sign(ad) == np.sign(fd)
    assert abs(ad - fd) / max(abs(fd), 1e-6) < 0.30


@pytest.mark.slow
def test_analytic_beats_coarse_mesh_silhouette():
    """The exact contour sampler has lower bias than edge sampling on a
    coarse tessellated sphere (the mesh edge set only approximates the
    smooth silhouette)."""
    spp, seed = 64, 0
    W = _W()
    fd = _fd(_analytic_scene)

    # analytic gradient
    scene_a = _analytic_scene()
    integ = PathProjectiveIntegrator(max_depth=2, sppp=4096, n_sub=2,
                                     indirect=False)
    g_a = jax.grad(
        lambda s: jnp.sum(prb_projective_render(
            s, build_silhouette_edges(scene_a), integ, seed, spp) * W),
        allow_int=True)(scene_a)
    ad_a = float(g_a.scene_analytic.sp_center[0, 0])

    # coarse-mesh gradient (subdiv=1 icosphere, 80 faces)
    scene_m = _mesh_scene(subdiv=1)
    edges_m = build_silhouette_edges(scene_m)
    g_m = jax.grad(
        lambda s: jnp.sum(prb_projective_render(
            s, edges_m, integ, seed, spp) * W),
        allow_int=True)(scene_m)
    ad_m = float(jnp.sum(g_m.meshes[1].vertices[:, 0]))
    fd_m = _fd(lambda dx: _mesh_scene(dx, subdiv=1))

    err_a = abs(ad_a - fd) / max(abs(fd), 1e-6)
    err_m = abs(ad_m - fd_m) / max(abs(fd_m), 1e-6)
    # exact contour must be at least as accurate as the coarse mesh
    assert err_a < 0.30
    assert err_a <= err_m + 0.05

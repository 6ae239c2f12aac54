"""Projective (visibility-discontinuity) gradient tests.

The canonical check (test_ad_integrators.py style): a constant-radiance
quad on a black background gives ~zero interior gradient, so ALL of the
translation gradient is the silhouette boundary term.  Detached PRB
misses it; prb_projective must match finite differences.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.models.bsdfs import SmoothConductor, SmoothDiffuse
from mitsuba_tpu.models.emitters import AreaEmitter
from mitsuba_tpu.models.film import Film, ReconstructionFilter
from mitsuba_tpu.models.integrators import (
    PathProjectiveIntegrator,
    PRBIntegrator,
    build_silhouette_edges,
    prb_projective_render,
    prb_render,
)
from mitsuba_tpu.models.scene import make_scene
from mitsuba_tpu.models.sensors import PerspectiveCamera
from mitsuba_tpu.models.shapes import Mesh, rectangle
from mitsuba_tpu.models.textures import ConstantTexture


def _quad_scene(dx=0.0):
    """Emissive quad (half-size 0.5) at z=0 on black, camera at z=3."""
    w = np.asarray(tf.compose(tf.translate([dx, 0.0, 0.0]),
                              tf.scale(0.5)), np.float32)
    quad = Mesh.make(*rectangle(w), bsdf_index=0, emitter_index=0,
                     id="quad")
    em = AreaEmitter(radiance=ConstantTexture(jnp.ones(3)))
    black = SmoothDiffuse(reflectance=ConstantTexture(jnp.zeros(3)))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0])),
        fov=45.0,
        film=Film(width=32, height=32,
                  rfilter=ReconstructionFilter.box()),
    )
    return make_scene([quad], [black], [em], cam, use_bvh=False)


# x-ramp weighting makes the translation gradient nonzero (a plain sum
# is translation-invariant: both silhouette edges cancel)
_RAMP = jnp.arange(32, dtype=jnp.float32)[None, :, None] / 32.0


def _loss_weights():
    return jnp.broadcast_to(_RAMP, (32, 32, 3))


def _x_translation_grad(g_scene):
    gv = g_scene.meshes[0].vertices
    return float(jnp.sum(gv[:, 0]))


@pytest.mark.slow
def test_boundary_gradient_matches_fd():
    spp = 64
    seed = 0
    W = _loss_weights()

    scene = _quad_scene()
    edges = build_silhouette_edges(scene)
    integ = PathProjectiveIntegrator(max_depth=2, sppp=8192, n_sub=2)

    def loss(s):
        return jnp.sum(prb_projective_render(s, edges, integ, seed, spp)
                       * W)

    g = jax.grad(loss, allow_int=True)(scene)
    ad = _x_translation_grad(g)

    # finite differences of the same primal estimator
    h = 0.04
    def primal(dx):
        s = _quad_scene(dx)
        return float(jnp.sum(
            prb_projective_render(s, edges, integ, seed, spp) * W))

    fd = np.mean([
        (primal(h) - primal(-h)) / (2 * h),
    ])
    assert np.isfinite(ad), ad
    assert abs(ad - fd) < 0.25 * abs(fd) + 0.05, (ad, fd)

    # detached PRB alone misses (almost all of) this gradient
    prb = PRBIntegrator(max_depth=2)
    g0 = jax.grad(
        lambda s: jnp.sum(prb_render(s, prb, seed, spp) * W),
        allow_int=True)(scene)
    ad0 = _x_translation_grad(g0)
    assert abs(ad0) < 0.25 * abs(fd), (ad0, fd)


def test_edge_table():
    scene = _quad_scene()
    edges = build_silhouette_edges(scene)
    # rectangle: 4 verts, 2 tris -> 5 unique edges, 1 shared (diagonal)
    assert edges.v0.shape[0] == 5
    shared = int(jnp.sum(edges.f1 >= 0))
    assert shared == 1
    assert int(jnp.sum(edges.f1 < 0)) == 4


def test_boundary_samples_find_silhouette():
    """All four outer edges of the quad are silhouettes from the camera;
    the sampled boundary term is nonzero for a ramp adjoint."""
    from mitsuba_tpu.models.integrators.path import PathIntegrator
    from mitsuba_tpu.models.integrators.projective import (
        primary_boundary_grads,
    )

    scene = _quad_scene()
    edges = build_silhouette_edges(scene)
    g = primary_boundary_grads(
        scene, edges, PathIntegrator(max_depth=2), _loss_weights(),
        jnp.uint32(0), n_samples=2048, n_sub=2)
    floats_nonzero = sum(float(jnp.sum(jnp.abs(x))) for x in g)
    assert np.isfinite(floats_nonzero) and floats_nonzero > 0.0


def _shadow_scene(bx=0.0):
    """Floor seen top-down; area light high above; small blocker between
    them, OUTSIDE the camera frustum — only its SHADOW is visible, so
    the x-translation gradient is purely the indirect boundary term."""
    floor = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 0]), tf.scale(2.0)), np.float32)),
        bsdf_index=0, id="floor")
    # small blocker + small light: the shadow edge (not full umbra)
    # crosses the viewed floor region (half-size ~0.23)
    blocker = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([bx, 0.0, 1.0]), tf.scale(0.12)),
        np.float32)), bsdf_index=0, id="blocker")
    light = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 2.0]), tf.rotate([1, 0, 0], 180),
                   tf.scale(0.1)), np.float32)),
        bsdf_index=0, emitter_index=0, id="light")
    em = AreaEmitter(radiance=ConstantTexture(jnp.full((3,), 120.0)))
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.full((3,), 0.8)))
    # camera close to the floor, narrow fov: blocker at z=1 is behind it
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 0.5], [0, 0, 0],
                                        [0, 1, 0])),
        fov=50.0,
        film=Film(width=32, height=32,
                  rfilter=ReconstructionFilter.box()),
    )
    return make_scene([floor, blocker, light], [white], [em], cam,
                      use_bvh=False)


@pytest.mark.slow
def test_shadow_boundary_gradient_matches_fd():
    spp = 32
    seed = 0
    W = _loss_weights()

    scene = _shadow_scene()
    edges = build_silhouette_edges(scene)
    integ = PathProjectiveIntegrator(max_depth=2, sppp=4096, n_sub=2)

    def grad_at(s):
        g = jax.grad(
            lambda sc: jnp.sum(
                prb_projective_render(sc, edges, integ, seed, spp) * W),
            allow_int=True)(s)
        return float(jnp.sum(g.meshes[1].vertices[:, 0]))

    ad = grad_at(scene)

    h = 0.03
    def primal(bx):
        s = _shadow_scene(bx)
        return float(jnp.sum(
            prb_projective_render(s, edges, integ, seed, spp) * W))

    fd = (primal(h) - primal(-h)) / (2 * h)
    assert np.isfinite(ad), ad
    assert abs(ad - fd) < 0.3 * abs(fd) + 0.05, (ad, fd)

    # with the indirect term disabled, the gradient mostly vanishes
    integ0 = PathProjectiveIntegrator(max_depth=2, sppp=4096, n_sub=2,
                                      indirect=False)
    g0 = jax.grad(
        lambda sc: jnp.sum(
            prb_projective_render(sc, edges, integ0, seed, spp) * W),
        allow_int=True)(scene)
    ad0 = float(jnp.sum(g0.meshes[1].vertices[:, 0]))
    assert abs(ad0) < 0.3 * abs(fd), (ad0, fd)


def _recv_scene(fz=0.0):
    """_shadow_scene with an OFF-CENTER blocker and a movable floor:
    lifting the floor (receiver) sweeps the asymmetric shadow sideways,
    so d(loss)/d(floor_z) under an x-ramp loss is dominated by the
    receiver-motion boundary term."""
    floor = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, fz]), tf.scale(2.0)), np.float32)),
        bsdf_index=0, id="floor")
    blocker = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0.06, 0.0, 1.0]), tf.scale(0.12)),
        np.float32)), bsdf_index=0, id="blocker")
    light = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 2.0]), tf.rotate([1, 0, 0], 180),
                   tf.scale(0.1)), np.float32)),
        bsdf_index=0, emitter_index=0, id="light")
    em = AreaEmitter(radiance=ConstantTexture(jnp.full((3,), 120.0)))
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.full((3,), 0.8)))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 0.5], [0, 0, 0],
                                        [0, 1, 0])),
        fov=50.0,
        film=Film(width=32, height=32,
                  rfilter=ReconstructionFilter.box()),
    )
    return make_scene([floor, blocker, light], [white], [em], cam,
                      use_bvh=False)


@pytest.mark.slow
def test_receiver_motion_boundary_matches_fd():
    """Receiver-motion term of the shadow-boundary integral: moving
    the RECEIVER plane (all edge/light vertices fixed) must still
    reproduce the finite-difference gradient — the boundary point
    x_B is attached through the receiver plane, not just edge+light."""
    spp = 32
    seed = 0
    W = _loss_weights()
    scene = _recv_scene()
    edges = build_silhouette_edges(scene)
    integ = PathProjectiveIntegrator(max_depth=2, sppp=4096, n_sub=2)

    def loss(s):
        return jnp.sum(prb_projective_render(s, edges, integ, seed, spp)
                       * W)

    ads = []
    for sd in (0, 1, 2):
        integ_s = PathProjectiveIntegrator(max_depth=2, sppp=4096,
                                           n_sub=2)
        g = jax.grad(
            lambda s: jnp.sum(
                prb_projective_render(s, edges, integ_s, sd, spp) * W),
            allow_int=True)(scene)
        ads.append(float(jnp.sum(g.meshes[0].vertices[:, 2])))
    ad = float(np.mean(ads))

    h = 0.03
    fd = (float(loss(_recv_scene(h))) - float(loss(_recv_scene(-h)))) \
        / (2 * h)
    assert np.isfinite(ad), ad
    assert abs(ad - fd) < 0.35 * abs(fd) + 0.05, (ad, fd, ads)


def test_octree_guiding_distribution():
    """OcSpaceDistr: normalized density, pdf/sample agreement, and
    adaptive concentration (guiding.py:141 OcSpaceDistr)."""
    from mitsuba_tpu.models.integrators.guiding import OcSpaceDistr

    rng_np = np.random.default_rng(3)
    pts = rng_np.uniform(size=(4000, 3))
    mass = np.exp(-30 * np.sum((pts - [0.8, 0.2, 0.5]) ** 2, -1))
    oc = OcSpaceDistr.create_from_samples(jnp.asarray(pts),
                                          jnp.asarray(mass))
    assert oc.n_leaves > 8
    u1 = jnp.asarray(rng_np.uniform(size=(100_000,)), jnp.float32)
    u3 = jnp.asarray(rng_np.uniform(size=(100_000, 3)), jnp.float32)
    p, pdf = oc.sample(u1, u3)
    # density normalizes over the unit cube
    assert abs(float(jnp.mean(1.0 / pdf)) - 1.0) < 0.02
    # pdf() agrees with the sampling density
    np.testing.assert_allclose(np.asarray(oc.pdf(p[:2000])),
                               np.asarray(pdf[:2000]), rtol=3e-3)
    # samples concentrate near the mass peak
    mean = np.asarray(p).mean(0)
    assert abs(mean[0] - 0.8) < 0.15 and abs(mean[1] - 0.2) < 0.15


def test_octree_guided_integration_unbiased():
    """Guided MC through OcSpaceDistr reproduces a known integral
    (round-4 addition after the depth-3 tail investigation: the
    component itself is unbiased; heavy INTEGRAND tails, not the
    octree, are what starve guided boundary estimates)."""
    from mitsuba_tpu.core import rng
    from mitsuba_tpu.models.integrators.guiding import OcSpaceDistr

    def g(p):
        a = jnp.exp(-80.0 * jnp.sum((p - 0.2) ** 2, -1))
        return 3.0 * a + p[:, 0]

    rng_np = np.random.default_rng(0)
    truth = float(jnp.mean(g(jnp.asarray(
        rng_np.random((500_000, 3), np.float32)))))
    pts_w = jnp.asarray(rng_np.random((32768, 3), np.float32))
    oc = OcSpaceDistr.create_from_samples(pts_w, g(pts_w))
    lane = jnp.arange(1 << 18, dtype=jnp.int32)
    s = jnp.uint32(5)
    u1 = rng.sample_1d(s, lane, jnp.int32(11))
    u3 = jnp.stack([rng.sample_1d(s, lane, jnp.int32(12 + k))
                    for k in range(3)], -1)
    q, pdf = oc.sample(u1, u3)
    est = float(jnp.mean(g(q) / jnp.maximum(pdf, 1e-12)))
    assert abs(est - truth) < 0.01 * max(truth, 1e-3), (est, truth)


@pytest.mark.slow
def test_octree_guided_shadow_gradient():
    """Octree-guided indirect boundary sampling agrees with uniform and
    with finite differences on the blocker-translation gradient."""
    from mitsuba_tpu.models.integrators.projective import (
        indirect_boundary_grads)

    W = _loss_weights()
    scene = _shadow_scene()
    edges = build_silhouette_edges(scene)
    integ = PathProjectiveIntegrator(max_depth=2, sppp=64, n_sub=1)

    def primal_img(s):
        from mitsuba_tpu.models.integrators.common import render
        from mitsuba_tpu.models.integrators.path import PathIntegrator

        return render(s, PathIntegrator(max_depth=2), seed=0, spp=32)

    # FD reference of the loss wrt blocker x
    h = 0.03
    f = lambda bx: float(jnp.sum(primal_img(_shadow_scene(bx)) * W))
    fd = (f(h) - f(-h)) / (2 * h)

    from mitsuba_tpu.models.integrators.projective import _float_partition

    def ad(guiding, seeds):
        floats, rebuild, cot = _float_partition(scene)
        vals = []
        for sd in seeds:
            g = indirect_boundary_grads(scene, edges, W, jnp.uint32(sd),
                                        n_samples=8192, guiding=guiding)
            gs = cot(g)
            # blocker = meshes[1]; sum of x-gradients of its vertices
            vals.append(float(jnp.sum(gs.meshes[1].vertices[:, 0])))
        return float(np.mean(vals))

    a_uni = ad("uniform", (1, 2, 3))
    a_oct = ad("octree", (1, 2, 3))
    assert np.isfinite(a_oct)
    assert abs(a_oct - fd) < 0.35 * abs(fd) + 0.05, (a_oct, fd)
    assert abs(a_uni - a_oct) < 0.35 * abs(fd) + 0.05, (a_uni, a_oct)


def _wall_shadow_scene(bx=0.0):
    """The shadowed floor is OUT of frame: the camera sees only a
    vertical wall lit by the floor's bounce light, so d(image)/d(blocker)
    exists ONLY through the depth-2 indirect visibility boundary."""
    floor = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 0]), tf.scale(2.0)), np.float32)),
        bsdf_index=0, id="floor")
    blocker = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([bx, 0.0, 1.0]), tf.scale(0.12)),
        np.float32)), bsdf_index=0, id="blocker")
    light = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 2.0]), tf.rotate([1, 0, 0], 180),
                   tf.scale(0.1)), np.float32)),
        bsdf_index=0, emitter_index=0, id="light")
    wall = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0.9, 0, 0.45]), tf.rotate([0, 1, 0], -90),
                   tf.scale(0.45)), np.float32)),
        bsdf_index=0, id="wall")
    em = AreaEmitter(radiance=ConstantTexture(jnp.full((3,), 240.0)))
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.full((3,), 0.8)))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([-0.35, 0, 0.45], [0.9, 0, 0.45],
                                        [0, 0, 1])),
        fov=30.0,
        film=Film(width=24, height=24,
                  rfilter=ReconstructionFilter.box()),
    )
    return make_scene([floor, blocker, light, wall], [white], [em], cam,
                      use_bvh=False)


@pytest.mark.slow
def test_depth2_shadow_boundary_matches_fd():
    """Indirect visibility boundary observed through one extra bounce
    (indirect_depth=2, bidirectional x_2 connection): AD matches FD on
    a scene whose shadow is only indirectly visible; the depth-1
    estimator misses the gradient entirely."""
    from mitsuba_tpu.models.integrators.common import render
    from mitsuba_tpu.models.integrators.path import PathIntegrator
    from mitsuba_tpu.models.integrators.projective import (
        _float_partition, indirect_boundary_grads)

    yy, xx = np.mgrid[0:24, 0:24]
    W = jnp.asarray(((xx / 23.0) - 0.5)[..., None]
                    * np.ones((24, 24, 3)), jnp.float32)

    h = 0.04

    def loss(bx):
        s = _wall_shadow_scene(bx)
        return float(jnp.sum(
            render(s, PathIntegrator(max_depth=3), seed=0, spp=256) * W))

    fd = (loss(h) - loss(-h)) / (2 * h)
    assert abs(fd) > 0.3, fd      # the indirect shadow effect exists

    scene = _wall_shadow_scene()
    edges = build_silhouette_edges(scene)
    _, _, cot = _float_partition(scene)

    def ad(depth, seeds):
        vals = []
        for sd in seeds:
            g = indirect_boundary_grads(
                scene, edges, W, jnp.uint32(sd), n_samples=65536,
                indirect_depth=depth)
            gs = cot(g)
            vals.append(float(jnp.sum(gs.meshes[1].vertices[:, 0])))
        return float(np.mean(vals))

    ad2 = ad(2, (0, 1, 2, 3))
    ad1 = ad(1, (0, 1))
    assert np.isfinite(ad2)
    assert abs(ad2 - fd) < 0.5 * abs(fd), (ad2, fd)
    assert abs(ad1) < 0.25 * abs(fd), (ad1, fd)


def _two_bounce_shadow_scene(bx=0.0):
    """The depth-2 scene (_wall_shadow_scene: shadowed floor indirectly
    visible via the wall) viewed THROUGH a small mirror, so the
    receiver of the shadow boundary is TWO bounces from the camera
    (camera -> mirror -> wall -> floor + NEE).  The specular prefix
    bounce preserves the shadow signal undiminished (a diffuse relay
    bounce blurs it below FD noise), and the delta vertex contributes
    exactly zero to the depth-2 bidirectional connection — so depth 3
    carries the whole gradient."""
    floor = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 0]), tf.scale(2.0)), np.float32)),
        bsdf_index=0, id="floor")
    blocker = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([bx, 0.0, 1.0]), tf.scale(0.12)),
        np.float32)), bsdf_index=0, id="blocker")
    light = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0, 0, 2.0]), tf.rotate([1, 0, 0], 180),
                   tf.scale(0.1)), np.float32)),
        bsdf_index=0, emitter_index=0, id="light")
    # the wall covers the WHOLE mirrored frustum (half-diagonal
    # 1.4*tan(15 deg)*sqrt(2) ~ 0.53): rays leaking past its edges
    # would land on the floor — the same plane as the boundary point —
    # and the near-singular same-plane connections (1/r^2 with r -> 0)
    # make the depth-3 estimator heavy-tailed
    wall = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([0.9, 0, 0.45]), tf.rotate([0, 1, 0], -90),
                   tf.scale(0.65)), np.float32)),
        bsdf_index=0, id="wall")
    # small mirror where the depth-2 camera stood, facing +x; the real
    # camera looks -x into it from just in front, so the virtual camera
    # (-0.5, 0, 0.45) sees the wall exactly like the depth-2 test
    mirror = Mesh.make(*rectangle(np.asarray(
        tf.compose(tf.translate([-0.35, 0, 0.45]),
                   tf.rotate([0, 1, 0], 90),
                   tf.scale(0.1)), np.float32)),
        bsdf_index=1, id="mirror")
    em = AreaEmitter(radiance=ConstantTexture(jnp.full((3,), 240.0)))
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.full((3,), 0.8)))
    silver = SmoothConductor(eta=jnp.full((3,), 0.05),
                             k=jnp.full((3,), 4.0))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([-0.2, 0, 0.45],
                                        [-0.35, 0, 0.45], [0, 0, 1])),
        fov=30.0,
        film=Film(width=24, height=24,
                  rfilter=ReconstructionFilter.box()),
    )
    return make_scene([floor, blocker, light, wall, mirror],
                      [white, silver], [em], cam, use_bvh=False)


@pytest.mark.slow
@pytest.mark.xfail(
    reason="round-4 finding: the depth-3 boundary estimator is too "
    "heavy-tailed to converge at test budgets — on this mirrored-relay "
    "scene FD = -0.72 while unguided AD@1Mx6 seeds gives -0.21+-0.13 "
    "and octree guiding is no help (its warm-up cannot see the rare "
    "tail events, giving stable-looking but tail-starved estimates: "
    "+0.13).  The depth-2 connection correctly vanishes on the delta "
    "mirror vertex (ad2 = 0 exactly).  Needs the reference's clamped/"
    "guided boundary sampling before the depth-3 FD bar can be met.",
    strict=True)
def test_depth3_shadow_boundary_matches_fd():
    """Indirect visibility boundary observed through TWO extra bounces
    (round 4: arbitrary-depth camera prefixes, ref
    ad/projective.py:228-373): AD at indirect_depth=3 matches FD on a
    scene whose shadow is two bounces from the camera; depth<=2 misses
    most of the gradient."""
    from mitsuba_tpu.models.integrators.common import render
    from mitsuba_tpu.models.integrators.path import PathIntegrator
    from mitsuba_tpu.models.integrators.projective import (
        _float_partition, indirect_boundary_grads)

    # x-gradient weight over the mirrored image of the wall
    yy, xx = np.mgrid[0:24, 0:24]
    W = jnp.asarray(((xx / 23.0) - 0.5)[..., None]
                    * np.ones((24, 24, 3)), jnp.float32)

    h = 0.04

    def loss(bx):
        s = _two_bounce_shadow_scene(bx)
        vals = [jnp.sum(render(s, PathIntegrator(max_depth=4),
                               seed=sd, spp=256) * W)
                for sd in range(3)]
        return float(jnp.mean(jnp.asarray(vals)))

    fd = (loss(h) - loss(-h)) / (2 * h)

    scene = _two_bounce_shadow_scene()
    edges = build_silhouette_edges(scene)
    _, _, cot = _float_partition(scene)

    def ad(depth, seeds):
        vals = []
        for sd in seeds:
            g = indirect_boundary_grads(
                scene, edges, W, jnp.uint32(sd), n_samples=65536,
                indirect_depth=depth)
            gs = cot(g)
            vals.append(float(jnp.sum(gs.meshes[1].vertices[:, 0])))
        return float(np.mean(vals))

    ad3 = ad(3, (0, 1, 2, 3))
    ad2 = ad(2, (0, 1))
    assert np.isfinite(ad3)
    # the specular relay preserves the depth-2 scene's shadow signal
    assert abs(fd) > 0.1, fd
    # depth-3 recovers the FD signal; the depth-2 connection lands on
    # the delta mirror vertex and contributes ~nothing
    assert abs(ad3 - fd) < 0.5 * abs(fd), (ad3, fd)
    assert abs(ad2) < 0.25 * abs(fd), (ad2, fd)

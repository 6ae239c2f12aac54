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

def _probe_panel_scene(bx=0.0, mirror=False):
    """Round-5 redesign of the indirect-boundary FD scenes.

    The round-4 scenes measured d(image x-gradient)/d(blocker) of a
    wall lit by floor bounce — re-measured in round 5 with 48
    common-random-number FD seeds, their "signals" were statistically
    ZERO (depth-2: -0.10 +- 0.17; mirrored depth-3: +0.05 +- 0.13;
    the recorded FD = -0.72 was a 3-seed noise draw), so both tests
    compared noise to noise.  This scene has a verified strong signal
    (FD SNR ~200-500 at test budgets): a small white probe PANEL
    stands at the shadow's penumbra, lit PURELY by floor bounce (the
    light sits in the panel's plane, so direct light is exactly
    grazing), and the camera fills its frame with the panel — so
    d(panel brightness)/d(blocker x) flows ONLY through the indirect
    visibility boundary on the floor.  ``mirror=True`` interposes a
    small conductor mirror so the panel is seen via a specular relay:
    the bidirectional connection at the delta vertex is exactly zero
    and the whole gradient sits at indirect_depth=3.

    Measured anchors (CPU, 8 CRN seeds x 512 spp / 4 AD seeds x 65536):
      direct:  FD -253.0 +- 0.5   ad2 -245.7 +- 6.1   ad1 = 0
      mirror:  FD  -73.4 +- 0.4   ad3  -70.8 +- 2.5   ad2 = 0
    """
    meshes = [
        Mesh.make(*rectangle(np.asarray(tf.compose(
            tf.translate([0, 0, 0]), tf.scale(2.0)), np.float32)),
            bsdf_index=0, id="floor"),
        Mesh.make(*rectangle(np.asarray(tf.compose(
            tf.translate([bx, 0.0, 0.75]), tf.scale(0.2)), np.float32)),
            bsdf_index=0, id="blocker"),
        Mesh.make(*rectangle(np.asarray(tf.compose(
            tf.translate([0.6, 0, 1.5]), tf.rotate([1, 0, 0], 180),
            tf.scale(0.1)), np.float32)),
            bsdf_index=0, emitter_index=0, id="light"),
        # probe panel facing -x over the shadowed floor region
        Mesh.make(*rectangle(np.asarray(tf.compose(
            tf.translate([0.45, 0, 0.3]), tf.rotate([0, 1, 0], -90),
            tf.scale(0.2)), np.float32)),
            bsdf_index=0, id="panel"),
    ]
    bsdfs = [SmoothDiffuse(reflectance=ConstantTexture(jnp.full(3, 0.8)))]
    if mirror:
        meshes.append(Mesh.make(*rectangle(np.asarray(tf.compose(
            tf.translate([-0.1, 0.25, 0.3]), tf.rotate([0, 1, 0], 90),
            tf.scale(0.08)), np.float32)), bsdf_index=1, id="mirror"))
        bsdfs.append(SmoothConductor(eta=jnp.full(3, 0.05),
                                     k=jnp.full(3, 4.0)))
        cam_to = tf.look_at([0.18, 0.25, 0.3], [-0.1, 0.25, 0.3],
                            [0, 0, 1])
    else:
        cam_to = tf.look_at([-0.68, 0, 0.3], [0.45, 0, 0.3], [0, 0, 1])
    em = AreaEmitter(radiance=ConstantTexture(jnp.full((3,), 240.0)))
    cam = PerspectiveCamera(
        to_world=jnp.asarray(cam_to), fov=18.0,
        film=Film(width=24, height=24,
                  rfilter=ReconstructionFilter.box()))
    return make_scene(meshes, bsdfs, [em], cam, use_bvh=False)


def _fd_crn(mk_scene, depth, h=0.05, seeds=4, spp=512):
    """Common-random-number finite difference with an error bar."""
    from mitsuba_tpu.models.integrators.common import render
    from mitsuba_tpu.models.integrators.path import PathIntegrator

    sp = mk_scene(h)
    sm = mk_scene(-h)
    fds = []
    for sd in range(seeds):
        lp = float(jnp.sum(render(sp, PathIntegrator(max_depth=depth),
                                  seed=sd, spp=spp)))
        lm = float(jnp.sum(render(sm, PathIntegrator(max_depth=depth),
                                  seed=sd, spp=spp)))
        fds.append((lp - lm) / (2 * h))
    return (float(np.mean(fds)),
            float(np.std(fds) / max(np.sqrt(len(fds)), 1.0)))


def _boundary_ad(scene, depth, seeds, n_samples=65536):
    from mitsuba_tpu.models.integrators.projective import (
        _float_partition, indirect_boundary_grads)

    W1 = jnp.ones((24, 24, 3), jnp.float32)
    edges = build_silhouette_edges(scene)
    _, _, cot = _float_partition(scene)
    vals = []
    for sd in seeds:
        g = indirect_boundary_grads(scene, edges, W1, jnp.uint32(sd),
                                    n_samples=n_samples,
                                    indirect_depth=depth)
        vals.append(float(jnp.sum(cot(g).meshes[1].vertices[:, 0])))
    return float(np.mean(vals))


@pytest.mark.slow
def test_depth2_shadow_boundary_matches_fd():
    """Indirect visibility boundary observed through one extra bounce
    (indirect_depth=2, bidirectional x_2 connection, ref
    ad/projective.py:228-373): AD matches a CRN finite difference on a
    scene whose shadow is only indirectly visible; the depth-1
    estimator misses the gradient entirely."""
    fd, fd_err = _fd_crn(lambda b: _probe_panel_scene(b), depth=3)
    assert abs(fd) > 50.0, (fd, fd_err)        # strong verified signal
    assert fd_err < 0.05 * abs(fd), (fd, fd_err)

    scene = _probe_panel_scene()
    ad2 = _boundary_ad(scene, 2, (0, 1, 2, 3))
    ad1 = _boundary_ad(scene, 1, (0, 1))
    assert abs(ad2 - fd) < 0.12 * abs(fd), (ad2, fd)
    assert abs(ad1) < 0.05 * abs(fd), (ad1, fd)


@pytest.mark.slow
def test_depth3_shadow_boundary_matches_fd():
    """Indirect visibility boundary observed through TWO extra bounces
    — a specular relay (round 4: arbitrary-depth camera prefixes; the
    delta mirror vertex contributes exactly zero to the depth-2
    connection, so depth 3 carries the whole gradient).  Round 5: the
    previous xfail was a test-design artifact (FD noise), not an
    estimator failure — on this verified-signal scene AD matches FD.
    """
    fd, fd_err = _fd_crn(lambda b: _probe_panel_scene(b, mirror=True),
                         depth=4)
    assert abs(fd) > 20.0, (fd, fd_err)
    assert fd_err < 0.08 * abs(fd), (fd, fd_err)

    scene = _probe_panel_scene(mirror=True)
    ad3 = _boundary_ad(scene, 3, (0, 1, 2, 3, 4, 5))
    ad2 = _boundary_ad(scene, 2, (0, 1))
    assert np.isfinite(ad3)
    assert abs(ad3 - fd) < 0.15 * abs(fd), (ad3, fd)
    assert abs(ad2) < 0.05 * abs(fd), (ad2, fd)

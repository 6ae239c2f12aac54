"""PRB differentiable-rendering tests.

Strategy mirrors src/integrators/tests/test_ad_integrators.py: per-parameter
configs comparing backward-mode gradients against finite differences, plus
an Adam inverse-rendering loop (BASELINE config 3).
"""
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.models.integrators.prb import PRBIntegrator, prb_render
from mitsuba_tpu.models.textures import ConstantTexture
from mitsuba_tpu.utils.optimizers import Adam, SGD
from mitsuba_tpu.utils.scenes import cornell_box


def _scene():
    return cornell_box(width=16, height=16)


def _with_albedo(scene, a):
    b = list(scene.bsdfs)
    b[0] = b[0].replace(reflectance=ConstantTexture(a))
    return scene.replace(bsdfs=tuple(b))


def _with_radiance(scene, r):
    e = list(scene.emitters)
    e[0] = e[0].replace(radiance=ConstantTexture(r))
    return scene.replace(emitters=tuple(e))


def test_prb_albedo_grad_vs_fd():
    scene = _scene()
    integ = PRBIntegrator(max_depth=3, rr_depth=16)

    def loss(a):
        return jnp.mean(prb_render(_with_albedo(scene, a), integ, 0, 16, 16))

    a0 = jnp.asarray([0.6, 0.6, 0.6])
    g = float(jax.grad(loss)(a0)[0])
    eps = 5e-3
    fd = float(
        (loss(a0 + jnp.asarray([eps, 0, 0]))
         - loss(a0 - jnp.asarray([eps, 0, 0]))) / (2 * eps)
    )
    assert abs(g - fd) < 0.05 * abs(fd), (g, fd)


def test_prb_emitter_grad_vs_fd():
    scene = _scene()
    integ = PRBIntegrator(max_depth=3, rr_depth=16)

    def loss(r):
        return jnp.mean(prb_render(_with_radiance(scene, r), integ, 0, 16, 16))

    r0 = jnp.asarray([18.387, 13.9873, 6.75357])
    g = float(jax.grad(loss)(r0)[0])
    fd = float(
        (loss(r0 + jnp.asarray([0.2, 0, 0]))
         - loss(r0 - jnp.asarray([0.2, 0, 0]))) / 0.4
    )
    assert abs(g - fd) < 0.05 * abs(fd), (g, fd)


def test_prb_deep_grad_vs_fd():
    """Gradients through multiple indirect bounces (the Lr_ind ratio path)."""
    scene = _scene()
    integ = PRBIntegrator(max_depth=6, rr_depth=16)

    def loss(a):
        return jnp.mean(prb_render(_with_albedo(scene, a), integ, 0, 16, 16))

    a0 = jnp.asarray([0.75, 0.75, 0.75])
    g = float(jax.grad(loss)(a0)[1])
    eps = 5e-3
    fd = float(
        (loss(a0 + jnp.asarray([0, eps, 0]))
         - loss(a0 - jnp.asarray([0, eps, 0]))) / (2 * eps)
    )
    assert abs(g - fd) < 0.05 * abs(fd), (g, fd)


def test_prb_primal_matches_path():
    """prb's primal estimate must equal the plain path tracer's."""
    from mitsuba_tpu.models.integrators import PathIntegrator, render

    scene = _scene()
    a = np.asarray(render(scene, PathIntegrator(max_depth=3, rr_depth=16),
                          seed=0, spp=8))
    b = np.asarray(prb_render(scene, PRBIntegrator(max_depth=3, rr_depth=16),
                              0, 8, 8))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_adam_albedo_recovery():
    """Inverse rendering: recover the white-wall albedo from a target image
    (BASELINE config 3 scaled down)."""
    scene = _scene()
    integ = PRBIntegrator(max_depth=3, rr_depth=16)
    a_true = jnp.asarray([0.8, 0.3, 0.5])
    # same seed/spp for target and iterates: the loss is exactly 0 at the
    # optimum, making convergence deterministic (MC noise cancels)
    target = prb_render(_with_albedo(scene, a_true), integ, 0, 16, 16)

    def loss(a, seed):
        img = prb_render(_with_albedo(scene, a), integ, seed, 16, 16)
        return jnp.mean((img - target) ** 2)

    opt = Adam(lr=0.05)
    params = {"a": jnp.asarray([0.4, 0.6, 0.2])}
    state = opt.init(params)
    grad_fn = jax.jit(jax.grad(lambda p, s: loss(p["a"], s)))
    l0 = float(loss(params["a"], 0))
    for it in range(60):
        grads = grad_fn(params, 0)
        params, state = opt.step(params, grads, state)
        params["a"] = jnp.clip(params["a"], 0.0, 1.0)
    l1 = float(loss(params["a"], 0))
    assert l1 < 0.02 * l0, (l0, l1)
    np.testing.assert_allclose(np.asarray(params["a"]), np.asarray(a_true),
                               atol=0.05)


def test_sgd_momentum_descends():
    f = lambda p: jnp.sum((p["x"] - 3.0) ** 2)
    opt = SGD(lr=0.1, momentum=0.9)
    params = {"x": jnp.zeros(3)}
    state = opt.init(params)
    for _ in range(200):
        grads = jax.grad(f)(params)
        params, state = opt.step(params, grads, state)
    np.testing.assert_allclose(np.asarray(params["x"]), 3.0, atol=0.05)


def test_prb_forward_mode_matches_backward():
    """Forward-mode dimage: <grad, tangent> == d mean(image) computed by
    render_forward (test_ad_integrators.py forward-vs-backward parity)."""
    from mitsuba_tpu.models.integrators.prb import prb_render_forward

    scene = _scene()
    integ = PRBIntegrator(max_depth=3, rr_depth=16)

    a0 = jnp.asarray([0.6, 0.6, 0.6])
    tangent_dir = jnp.asarray([1.0, 0.0, 0.0])

    # backward gradient of mean(image) w.r.t. albedo
    g = jax.grad(
        lambda a: jnp.mean(prb_render(_with_albedo(scene, a), integ,
                                      0, 16, 16)))(a0)
    expect = float(jnp.dot(g, tangent_dir))

    # forward tangent: a scene-shaped pytree with d(albedo) = tangent_dir
    base = _with_albedo(scene, a0)
    zeros = jax.tree_util.tree_map(
        lambda x: jnp.zeros_like(x)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x, base)
    tangent = _with_albedo(zeros, tangent_dir)
    img, dimg = prb_render_forward(base, tangent, integ, seed=0, spp=16)
    got = float(jnp.mean(dimg))
    assert abs(got - expect) < 0.05 * max(abs(expect), 1e-4), (got, expect)

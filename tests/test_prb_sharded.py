"""Multi-chip PRB: sharded gradients must equal single-chip gradients
(SURVEY §4 multi-chip test strategy — same samples via global lane ids,
psum'd parameter cotangents)."""
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.models.integrators.prb import PRBIntegrator, prb_render
from mitsuba_tpu.models.textures import ConstantTexture
from mitsuba_tpu.parallel import make_mesh, make_sharded_prb
from mitsuba_tpu.utils.scenes import cornell_box


def _with_albedo(scene, a):
    b = list(scene.bsdfs)
    b[0] = b[0].replace(reflectance=ConstantTexture(a))
    return scene.replace(bsdfs=tuple(b))


def test_sharded_prb_matches_single_chip():
    scene = cornell_box(width=12, height=12)
    integ = PRBIntegrator(max_depth=3, rr_depth=16)
    mesh = make_mesh(8)
    f_sh = make_sharded_prb(integ, mesh, spp=8)

    img_sh = np.asarray(f_sh(scene, 0))
    img_1 = np.asarray(prb_render(scene, integ, 0, 8, 8))
    np.testing.assert_allclose(img_sh, img_1, rtol=1e-3, atol=1e-5)

    a0 = jnp.asarray([0.6, 0.6, 0.6])
    g_sh = np.asarray(jax.grad(
        lambda a: jnp.mean(f_sh(_with_albedo(scene, a), 0)))(a0))
    g_1 = np.asarray(jax.grad(
        lambda a: jnp.mean(prb_render(_with_albedo(scene, a), integ,
                                      0, 8, 8)))(a0))
    np.testing.assert_allclose(g_sh, g_1, rtol=1e-3, atol=1e-7)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, len(jax.devices())))

"""Film splat/develop tests (reference: imageblock.cpp put/read,
hdrfilm.cpp:304 develop)."""
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.models.film import (
    Film,
    ReconstructionFilter,
    develop,
    splat,
)


def test_box_filter_single_tap():
    f = ReconstructionFilter.box()
    pos = jnp.asarray([[2.5, 3.5]])  # center of pixel (2, 3)
    val = jnp.asarray([[1.0, 2.0, 3.0]])
    img = splat(pos, val, 8, 8, f)
    assert img.shape == (8, 8, 4)
    np.testing.assert_allclose(np.asarray(img[3, 2]), [1, 2, 3, 1], atol=1e-6)
    assert float(jnp.sum(img[..., 3])) == 1.0


def test_develop_weight_division():
    f = ReconstructionFilter.box()
    pos = jnp.asarray([[2.5, 3.5], [2.5, 3.5]])
    val = jnp.asarray([[1.0, 1.0, 1.0], [3.0, 3.0, 3.0]])
    img = splat(pos, val, 8, 8, f)
    out = develop(img)
    np.testing.assert_allclose(np.asarray(out[3, 2]), [2, 2, 2], atol=1e-6)


def test_gaussian_energy_conserved():
    """Total splatted data / total weight == value for a uniform splat."""
    f = ReconstructionFilter.gaussian()
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(4, 12, (128, 2)), jnp.float32)
    val = jnp.ones((128, 3))
    img = splat(pos, val, 16, 16, f)
    total_v = float(jnp.sum(img[..., 0]))
    total_w = float(jnp.sum(img[..., 3]))
    assert abs(total_v / total_w - 1.0) < 1e-5


def test_splat_differentiable():
    """grad of develop(splat(...)) w.r.t. sample values is the PRB adjoint
    splat (common.py:702-758 differentiated ImageBlock.read)."""
    f = ReconstructionFilter.box()
    pos = jnp.asarray([[1.5, 1.5]])

    def loss(v):
        img = splat(pos, v, 4, 4, f)
        return jnp.sum(develop(img))

    g = jax.grad(loss)(jnp.asarray([[0.5, 0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(g), np.ones((1, 3)), atol=1e-5)


def test_out_of_bounds_clipped():
    f = ReconstructionFilter.gaussian()
    pos = jnp.asarray([[-0.4, 0.1], [15.9, 15.9]])
    val = jnp.ones((2, 3))
    img = splat(pos, val, 16, 16, f)
    assert np.isfinite(np.asarray(img)).all()
    # no wraparound: opposite corner stays empty
    assert float(img[15, 15, 3]) > 0.0
    assert float(img[8, 8, 3]) == 0.0


def test_splat_grouped_matches_scatter():
    """Dense pixel-grouped splat == general scatter splat (same taps)."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.models.film import (
        ReconstructionFilter, splat, splat_grouped,
    )

    rng = np.random.default_rng(0)
    H, W, spp = 9, 7, 3
    P = H * W
    pix = np.arange(P).repeat(spp)
    jitter = rng.random((P * spp, 2)).astype(np.float32)
    pos = np.stack([pix % W, pix // W], -1).astype(np.float32) + jitter
    vals = rng.random((P * spp, 3)).astype(np.float32)
    active = rng.random(P * spp) > 0.2

    for rf in (ReconstructionFilter.gaussian(), ReconstructionFilter.box(),
               ReconstructionFilter.tent(), ReconstructionFilter.mitchell()):
        a = splat(jnp.asarray(pos), jnp.asarray(vals), H, W, rf,
                  jnp.asarray(active))
        b = splat_grouped(jnp.asarray(pos), jnp.asarray(vals), H, W, spp,
                          rf, jnp.asarray(active))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

"""Statistical and determinism tests for the stateless counter-based RNG."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import rng


def test_uniformity_and_range():
    lanes = jnp.arange(1_000_000, dtype=jnp.uint32)
    u = np.asarray(rng.sample_1d(jnp.uint32(42), lanes, jnp.uint32(0)))
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 2e-3
    assert abs(u.var() - 1 / 12) < 2e-3
    # bin uniformity
    h, _ = np.histogram(u, bins=64, range=(0, 1))
    assert (np.abs(h - len(u) / 64) < 5 * np.sqrt(len(u) / 64)).all()


def test_dimension_decorrelation():
    lanes = jnp.arange(100_000, dtype=jnp.uint32)
    a = np.asarray(rng.sample_1d(jnp.uint32(1), lanes, jnp.uint32(0)))
    b = np.asarray(rng.sample_1d(jnp.uint32(1), lanes, jnp.uint32(1)))
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.01


def test_seed_decorrelation():
    lanes = jnp.arange(100_000, dtype=jnp.uint32)
    a = np.asarray(rng.sample_1d(jnp.uint32(1), lanes, jnp.uint32(5)))
    b = np.asarray(rng.sample_1d(jnp.uint32(2), lanes, jnp.uint32(5)))
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.01


def test_replay_determinism():
    """PRB invariant: same (seed, lane, dim) -> identical sample, regardless
    of batch shape or order."""
    lanes = jnp.arange(1024, dtype=jnp.uint32)
    full = rng.sample_2d(jnp.uint32(9), lanes, jnp.uint32(3))
    # recompute a permuted subset
    idx = jnp.array([5, 900, 17, 3], dtype=jnp.uint32)
    sub = rng.sample_2d(jnp.uint32(9), idx, jnp.uint32(3))
    assert np.allclose(np.asarray(full)[np.asarray(idx)], np.asarray(sub))


def test_tea():
    v0, v1 = rng.sample_tea_32(jnp.uint32(1), jnp.uint32(1))
    w0, w1 = rng.sample_tea_32(jnp.uint32(1), jnp.uint32(2))
    assert int(v0) != int(w0)


def test_permute_pow2_bijection():
    from mitsuba_tpu.core.rng import permute_pow2
    for n in (2, 8, 16, 64, 256):
        for key in (0, 1, 0xDEAD, 12345):
            p = np.asarray(permute_pow2(jnp.arange(n, dtype=jnp.uint32),
                                        n, jnp.uint32(key)))
            assert sorted(p.tolist()) == list(range(n)), (n, key)


def test_stratified_spec_covers_all_strata():
    """With spec=(kind, spp), the spp samples of one pixel land in spp
    distinct strata (1D) / the sqrt grid cells (2D) exactly once."""
    from mitsuba_tpu.core import rng
    spp = 16
    lane = jnp.arange(spp, dtype=jnp.int32) + 7 * spp  # pixel 7
    for dim in (9, 10, 42):
        u = np.asarray(rng.sample_1d(0, lane, jnp.int32(dim), ("stratified", spp)))
        strata = np.floor(u * spp).astype(int)
        assert sorted(strata.tolist()) == list(range(spp)), dim
        u2 = np.asarray(rng.sample_2d(0, lane, jnp.int32(dim), ("stratified", spp)))
        cell = (np.floor(u2[:, 0] * 4) + 4 * np.floor(u2[:, 1] * 4)).astype(int)
        assert sorted(cell.tolist()) == list(range(spp)), dim


def test_stratified_spec_variance_reduction():
    """MC mean of a smooth integrand: stratified variance must drop well
    below independent (1/spp^2 vs 1/spp scaling)."""
    from mitsuba_tpu.core import rng
    spp, n_pix = 64, 256
    lane = jnp.arange(spp * n_pix, dtype=jnp.int32)
    dim = jnp.int32(11)
    f = lambda u: u * u  # integral 1/3
    ui = np.asarray(rng.sample_1d(3, lane, dim)).reshape(n_pix, spp)
    us = np.asarray(rng.sample_1d(3, lane, dim, ("stratified", spp))).reshape(n_pix, spp)
    est_i = (ui ** 2).mean(1)
    est_s = (us ** 2).mean(1)
    assert abs(est_s.mean() - 1 / 3) < 1e-3
    assert est_s.var() < est_i.var() * 0.05


def test_stratified_spec_nonpow2_falls_back():
    from mitsuba_tpu.core import rng
    lane = jnp.arange(24, dtype=jnp.int32)
    a = np.asarray(rng.sample_1d(0, lane, jnp.int32(5)))
    b = np.asarray(rng.sample_1d(0, lane, jnp.int32(5), ("stratified", 24)))
    assert np.allclose(a, b)

"""Native C++ SAH BVH builder tests: compiles via g++ + ctypes, emits the
same traversal-compatible layout, and produces identical closest hits to
both the numpy builder and brute force."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.core.records import Ray
from mitsuba_tpu.models.shapes import sphere_mesh
from mitsuba_tpu.native import build_bvh_native, get_bvh_lib
from mitsuba_tpu.ops.bvh import _build_bvh_median, build_bvh, intersect_bvh
from mitsuba_tpu.ops.intersect import intersect_brute

pytestmark = pytest.mark.skipif(get_bvh_lib() is None,
                                reason="g++ toolchain unavailable")


def _mesh():
    return sphere_mesh(3)  # 1280 faces


def _rays(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    o[:, 2] = 3.0
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.5
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return Ray.make(jnp.asarray(o), jnp.asarray(d))


def test_native_layout_valid():
    v, f, *_ = _mesh()
    out = build_bvh_native(v, f)
    assert out is not None
    lo, hi, first, count, miss, prims = out
    n_nodes = lo.shape[0]
    assert n_nodes >= 1
    # all leaves small enough for the unrolled traversal
    assert count.max() <= 4
    # every primitive appears exactly once
    used = prims[prims >= 0]
    assert sorted(used.tolist()) == list(range(f.shape[0]))
    # miss links point forward (DFS threading) or exit
    idx = np.arange(n_nodes)
    m = miss[miss >= 0]
    assert (miss[miss >= 0] > idx[miss >= 0]).all()


def test_native_matches_brute_and_median():
    v, f, *_ = _mesh()
    ray = _rays()
    pi_brute = intersect_brute(jnp.asarray(v), jnp.asarray(f), ray)

    bvh_sah = build_bvh(v, f, method="sah")
    pi_sah = intersect_bvh(bvh_sah, jnp.asarray(v), jnp.asarray(f), ray)

    bvh_med = _build_bvh_median(v, f)
    pi_med = intersect_bvh(bvh_med, jnp.asarray(v), jnp.asarray(f), ray)

    tb = np.asarray(pi_brute.t)
    ts = np.asarray(pi_sah.t)
    tm = np.asarray(pi_med.t)
    np.testing.assert_allclose(
        np.where(np.isfinite(tb), tb, -1),
        np.where(np.isfinite(ts), ts, -1), atol=1e-5)
    np.testing.assert_allclose(
        np.where(np.isfinite(tm), tm, -1),
        np.where(np.isfinite(ts), ts, -1), atol=1e-5)
    hit = np.isfinite(tb)
    assert (np.asarray(pi_brute.prim_index)[hit]
            == np.asarray(pi_sah.prim_index)[hit]).mean() > 0.999


def test_native_builder_speed():
    """The C++ SAH builder should build a 20k-face mesh quickly (the
    numpy recursive builder takes seconds at this size)."""
    import time

    v, f, *_ = sphere_mesh(5)  # 20480 faces
    t0 = time.perf_counter()
    out = build_bvh_native(v, f)
    dt = time.perf_counter() - t0
    assert out is not None
    assert dt < 1.0, dt

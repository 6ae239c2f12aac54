"""Failure detection & elastic recovery (utils/elastic.py, SURVEY §5.3
— new scope beyond the reference's cancel/timeout)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu.models.integrators import PathIntegrator, render
from mitsuba_tpu.utils import elastic
from mitsuba_tpu.utils.optimizers import Adam
from mitsuba_tpu.utils.scenes import cornell_box


@pytest.fixture(scope="module")
def scene():
    return cornell_box(width=16, height=16)


def test_retry_pass_recovers_from_transient_faults():
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient device fault")
        return x * 2.0

    out = elastic.retry_pass(flaky, jnp.asarray(3.0), max_retries=3,
                             _sleep=lambda s: None)
    assert float(out) == 6.0 and calls["n"] == 3

    calls["n"] = 0

    def dead(x):
        calls["n"] += 1
        raise RuntimeError("persistent fault")

    with pytest.raises(RuntimeError, match="persistent"):
        elastic.retry_pass(dead, jnp.asarray(1.0), max_retries=2,
                           _sleep=lambda s: None)
    assert calls["n"] == 3


def test_spp_shard_render_matches_plain_render(scene):
    integ = PathIntegrator(max_depth=3)
    ref = np.asarray(render(scene, integ, seed=0, spp=8))

    fails = {0: 2, 2: 1}      # shard -> remaining simulated faults

    def fail_hook(p):
        if fails.get(p, 0) > 0:
            fails[p] -= 1
            raise RuntimeError(f"simulated fault in shard {p}")

    img = np.asarray(elastic.spp_shard_render(
        scene, integ, seed=0, spp=8, spp_per_shard=2,
        _fail_hook=fail_hook))
    # stateless seeds: the sharded + retried render is bit-identical
    assert np.allclose(img, ref, atol=1e-6)
    assert all(v == 0 for v in fails.values())


def test_nan_guard_skips_bad_steps():
    opt = Adam(lr=0.1)
    params = {"a": jnp.asarray([1.0, 2.0])}
    state = opt.init(params)

    bad = {"a": jnp.asarray([jnp.nan, 1.0])}
    p2, s2, ok = elastic.nan_guard_step(opt, params, bad, state)
    assert not ok
    assert np.allclose(p2["a"], params["a"])

    good = {"a": jnp.asarray([0.5, -0.5])}
    p3, s3, ok = elastic.nan_guard_step(opt, params, good, state)
    assert ok
    assert not np.allclose(p3["a"], params["a"])


def test_checkpointed_loop_resume(tmp_path):
    opt = Adam(lr=0.05)
    params = {"w": jnp.asarray([1.0, -1.0, 0.5])}
    state = opt.init(params)
    grads = {"w": jnp.asarray([0.1, 0.2, -0.3])}
    path = str(tmp_path / "ck")
    loop = elastic.CheckpointedLoop(path, every=2)

    # fresh start
    p, s, start = loop.resume(params, state)
    assert start == 0
    hist = []
    for it in range(4):
        p, s, _ = elastic.nan_guard_step(opt, p, grads, s)
        hist.append(np.asarray(p["w"]).copy())
        loop.maybe_save(it, p, s)

    # "crash" + resume: continues from step 4 with identical params
    p2, s2, start2 = loop.resume(params, state)
    assert start2 == 4
    assert np.allclose(p2["w"], hist[3], atol=1e-7)
    p2, s2, _ = elastic.nan_guard_step(opt, p2, grads, s2)
    # one more step from the restored state matches an uninterrupted run
    p_ref, s_ref = p, s
    p_ref, s_ref, _ = elastic.nan_guard_step(opt, p_ref, grads, s_ref)
    assert np.allclose(p2["w"], p_ref["w"], atol=1e-6)

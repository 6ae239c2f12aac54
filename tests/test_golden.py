"""Golden-image z-test harness (reference test_renders.py:159-187).

Each committed golden (tests/golden/*.npz, regenerated deliberately via
tests/golden_gen.py) carries a high-spp mean image + per-pixel variance.
A fresh render at moderate spp must pass a Šidák-corrected per-pixel
Z-test against it — this catches silent drift in MIS weights, sampling
conventions, or plugin behavior that analytic tests miss.
"""
import glob
import os

import numpy as np
import jax.numpy as jnp
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SIGNIFICANCE = 0.01
TEST_SPP = 128


def _z_test_np(mean, sample_count, reference, reference_var):
    """test_renders.py:159 z_test."""
    reference_var = np.maximum(reference_var, 1e-4)
    z_stat = np.abs(mean - reference) * np.sqrt(
        sample_count / reference_var)
    # erf via numpy-compatible approximation when scipy is absent
    try:
        from scipy.special import erf
        cdf = 0.5 * (1.0 + erf(z_stat / np.sqrt(2.0)))
    except ImportError:
        import math
        v = np.vectorize(math.erf)(np.clip(z_stat / np.sqrt(2.0), 0, 6))
        cdf = 0.5 * (1.0 + v)
    return 2.0 * (1.0 - cdf)


def _configs():
    import golden_gen

    return golden_gen.scene_configs()


@pytest.mark.parametrize(
    "name", [os.path.splitext(os.path.basename(p))[0]
             for p in sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.npz")))]
    or ["__missing__"])
def test_golden_z(name):
    if name == "__missing__":
        pytest.skip("no goldens generated (run tests/golden_gen.py)")
    from mitsuba_tpu.models.integrators.common import render
    from mitsuba_tpu.utils.load import load_dict

    ref = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
    cfg = _configs()[name]
    scene = load_dict(cfg)
    img = np.asarray(render(scene, scene.integrator, seed=77,
                            spp=TEST_SPP))

    p_value = _z_test_np(img, TEST_SPP, ref["mean"], ref["var"])
    # Šidák correction over all pixels/channels (test_renders.py:231).
    # Specular/volumetric estimators are heavy-tailed, so a small
    # fraction of caustic pixels legitimately fails the normal
    # approximation at this spp; require near-total pass plus a tight
    # aggregate bound (the reference gives such configs extra spp).
    alpha = 1.0 - (1.0 - SIGNIFICANCE) ** (1.0 / p_value.size)
    frac = (p_value > alpha).mean()
    assert frac > 0.98, (name, frac, float(p_value.min()))
    # aggregate-mean 5-sigma bound derived from the golden variance
    sigma = np.sqrt(ref["var"].mean() / (TEST_SPP * img.size))
    diff = abs(float(img.mean()) - float(ref["mean"].mean()))
    assert diff < 5.0 * sigma + 1e-4, (name, diff, 5.0 * sigma)

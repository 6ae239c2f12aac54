"""[FORK] lens-design toolkit tests (BASELINE config 5 scaled down).

Mirrors the reference notebooks' validation: paraxial vs exact tracing
(design_problem.py:430 __test_geo_tracer), fixed-EFL constraint solve,
and gradient-driven spot-size reduction (doublet experiment shape).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mitsuba_tpu.lens import (
    ConicSurface,
    DesignProblem,
    LensMaterial,
    LensSystem,
    rms_loss,
)


def _singlet(z0=22.0, R=24.0, n_rings=8, n_sectors=16):
    glass = LensMaterial.create("nbk7", ior=1.5168, V_d=64.17)
    surfs = [ConicSurface.create(8.0, -1.0 / R, 0.0, z0),
             ConicSurface.create(8.0, +1.0 / R, 0.0, z0 + 4.0)]
    return LensSystem.create(surfs, [glass], n_rings=n_rings,
                             n_sectors=n_sectors)


def test_paraxial_efl_matches_lensmaker():
    ls = _singlet()
    efl = float(ls.compute_EFL())
    # thick-lens formula: 1/f = (n-1)[1/R1 - 1/R2 + (n-1)d/(n R1 R2)]
    n, R, d = 1.5168, 24.0, 4.0
    inv_f = (n - 1) * (2.0 / R - (n - 1) * d / (n * R * R))
    assert abs(efl - 1.0 / inv_f) < 0.05, (efl, 1.0 / inv_f)


def test_paraxial_vs_exact_trace():
    """Paraxial front->film trace vs the geometric mesh tracer for
    near-axis rays (design_problem.py:430)."""
    ls = _singlet(n_rings=16, n_sectors=32)
    dp = DesignProblem(ls, resolution=(8, 8), spp=4, iters=1)
    dp.build()
    z_init = float(ls.front_z) * 1.2
    r = 0.02
    from mitsuba_tpu.core.records import Ray

    ray = Ray.make(jnp.asarray([[r, 0.0, z_init]]),
                   jnp.asarray([[0.0, 0.0, -1.0]]))
    _, _, valid, p = dp.geo_tracer(ray)
    assert bool(valid[0])
    y_exact = float(p[0, 0])
    yu = ls.trace_paraxial_front2film(jnp.asarray([r, 0.0]))
    # mesh discretization limits the agreement; the sign + magnitude match
    assert abs(y_exact - float(yu[0])) < 5e-3, (y_exact, float(yu[0]))


def test_fixed_efl_constraint_solve():
    """rear_surface_params_for_EFL must make compute_EFL() == target."""
    ls = _singlet()
    target = 21.0
    rear = ls.rear_surface_params_for_EFL(target)
    s0 = ls.surfaces[0].with_params(rear)
    ls2 = ls.replace(surfaces=(s0,) + ls.surfaces[1:])
    assert abs(float(ls2.compute_EFL()) - target) < 1e-2


def test_pupils_finite():
    ls = _singlet()
    z_ex, z_en, r_ex, r_en = ls.compute_pupils()
    for v in (z_ex, z_en, r_ex, r_en):
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_design_gradient_matches_fd():
    # defocused start + zoomed-in sensor -> non-degenerate loss landscape
    ls = _singlet(z0=20.0)
    dp = DesignProblem(ls, resolution=(24, 24), spp=128, iters=1,
                       sensor_fov=10.0)
    dp.build()
    p = dp.params()
    g = jax.grad(dp.loss)(p, 0)
    eps = 2e-3
    pp = dict(p, lens0_c=p["lens0_c"] + eps)
    pm = dict(p, lens0_c=p["lens0_c"] - eps)
    fd = (float(dp.loss(pp, 0)) - float(dp.loss(pm, 0))) / (2 * eps)
    ad = float(g["lens0_c"])
    assert abs(ad - fd) < 0.1 * abs(fd) + 1e-3, (ad, fd)


def test_split_jits_matches_fused_gradient():
    """Per-sensor split jits (round 5: the remote-compile-cap
    workaround for the 22-surface Nikon problem) accumulate to exactly
    the fused multi-sensor gradient: the loss is a mean of per-sensor
    terms, so grad distributes over the sum."""
    ls = _singlet(z0=20.0)
    dp = DesignProblem(ls, resolution=(16, 16), spp=32, iters=1,
                       num_sources=2, max_field_angle=3.0,
                       sensor_fov=10.0)
    dp.build()
    p = dp.params()
    val_fused, g_fused = jax.value_and_grad(dp.loss)(p, 0)

    # replicate the split accumulation optimize() uses
    from mitsuba_tpu.lens.losses import rms_loss
    from mitsuba_tpu.models.integrators import render

    n = len(dp.sensors)

    def loss_si(p, si):
        scene, _ = dp.scene_for(p, si)
        img = render(scene, seed=0, spp=dp.spp)
        return dp.loss_scale * rms_loss(img) / n

    val_s, g_s = None, None
    for si in range(n):
        v, gi = jax.value_and_grad(
            lambda p, si=si: loss_si(p, si))(p)
        if g_s is None:
            val_s, g_s = v, gi
        else:
            val_s = val_s + v
            g_s = jax.tree_util.tree_map(jnp.add, g_s, gi)

    assert abs(float(val_s) - float(val_fused)) < 1e-4 * max(
        1.0, abs(float(val_fused)))
    for k in g_fused:
        a, b = np.asarray(g_fused[k]), np.asarray(g_s[k])
        assert np.allclose(a, b, rtol=1e-4, atol=1e-6), (k, a, b)


@pytest.mark.slow
def test_defocus_recovery():
    """Start 2mm defocused; optimizing z0 must shrink the RMS spot."""
    ls = _singlet(z0=20.0)
    dp = DesignProblem(ls, resolution=(24, 24), spp=96,
                       learning_rate=2e-3, iters=25, num_sources=1,
                       sensor_fov=10.0)
    dp.build()
    # axial position moves mm-scale; shape/material params stay gentle
    dp.optimize(lr_overrides={"lens0_z0": 0.12, "lens1_z0": 0.12})
    h = dp.loss_history
    start = np.mean(h[:3])
    end = np.mean(h[-3:])
    # with the reference's FULL-aperture field source (radius =
    # front_radial_extent, createSourceArray) the singlet spot is
    # spherical-aberration-dominated: a pure-defocus scan floors at
    # ~0.77x the start loss, and 25 Adam iters (which also nudge
    # curvature/glass) measured 0.64x — assert the defocus recovery
    # with margin for MC noise
    assert end < 0.75 * start, (start, end)


def test_dispersion_gradient_nonzero_when_spectral():
    """Chromatic chain check: with spectral light tracing the glass Abbe
    number (V_d) changes the rendered spot, so its gradient is nonzero;
    with monochromatic (d-line) tracing it is ~0 by construction
    (cauchy_from_abbe pins n(lambda_d) = n_d)."""
    ls = _singlet(z0=20.0)
    g = {}
    for spectral in (True, False):
        dp = DesignProblem(ls, resolution=(24, 24), spp=256, iters=1,
                           sensor_fov=10.0, spectral=spectral)
        dp.build()
        assert dp.spectral == spectral
        p = dp.params()
        grads = jax.grad(dp.loss)(p, 0)
        key = [k for k in grads if k.endswith("_V_d")][0]
        g[spectral] = float(grads[key])
        assert np.isfinite(g[spectral])
    assert abs(g[True]) > 50.0 * max(abs(g[False]), 1e-12), g


def test_accumulate_sensor_grads_resamples_before_dropping():
    """A sensor whose gradient is non-finite for the base seed must be
    RETRIED with a decorrelated seed (round-5 Nikon post-mortem: silent
    drops concentrated on the hardest fields and left them
    under-optimized), and only dropped when every redraw fails."""
    from mitsuba_tpu.lens.design import accumulate_sensor_grads

    calls = {0: [], 1: [], 2: []}

    def mk(si, bad_seeds=(), always_bad=False):
        def fn(p, seed):
            calls[si].append(int(seed))
            bad = always_bad or int(seed) in bad_seeds
            v = jnp.float32(jnp.nan if bad else 1.0 + si)
            g = {"c": jnp.full((2,), jnp.nan if bad else float(si + 1))}
            return v, g
        return fn

    # sensor 0 clean; sensor 1 bad on the base seed only; sensor 2
    # bad on every draw
    fns = [mk(0), mk(1, bad_seeds=(7,)), mk(2, always_bad=True)]
    val, g, used = accumulate_sensor_grads(fns, {"c": jnp.zeros(2)}, 7,
                                           retries=2)
    assert used == [True, True, False]
    # sensor 1 recovered on its first redraw: contributes its gradient
    assert np.allclose(np.asarray(g["c"]), 3.0)   # 1 (s0) + 2 (s1)
    assert float(val) == pytest.approx(3.0)       # 1.0 + 2.0
    assert calls[0] == [7]                        # no wasted redraws
    assert len(calls[1]) == 2 and calls[1][0] == 7
    assert calls[1][1] != 7                       # decorrelated redraw
    assert len(calls[2]) == 3                     # 1 + retries, then drop
    # retry seeds must differ across sensors (independent redraws)
    assert calls[1][1] != calls[2][1]

    # all sensors failing every draw -> g is None (caller skips step)
    fns_bad = [mk(0, always_bad=True)]
    calls[0].clear()
    val, g, used = accumulate_sensor_grads(fns_bad, {"c": jnp.zeros(2)},
                                           7, retries=1)
    assert g is None and used == [False]

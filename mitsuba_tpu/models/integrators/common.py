"""Integrator common machinery: sampler-dimension layout, MIS weight,
primary-ray generation, and the render orchestration loop.

Reference: src/render/integrator.cpp:120-367 (SamplingIntegrator::render —
wavefront setup :247, per-lane pixel arithmetic :293-310, render_sample
:419, film put/develop :339) and the MIS helper
src/python/python/ad/integrators/common.py:1318.

TPU design: the wavefront is W*H*spp lanes of SoA state; the per-lane
sample sequence is the stateless counter RNG (core/rng.py) indexed by
(seed, lane, dim) — dimension slots below are the fixed per-bounce layout
that makes PRB replay exact by construction.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import rng
from ...core.records import Ray

# ------------------------------------------------------- dimension layout
# Camera-level dims:
DIM_POS = 0          # 2D film position jitter
DIM_APERTURE = 1     # 2D aperture sample
DIM_WAVELENGTH = 2   # 1D spectral sample
DIM_TIME = 3         # 1D shutter-time sample (motion blur)
DIM_BOUNCE_BASE = 8  # first per-bounce slot
DIMS_PER_BOUNCE = 8
# per-bounce slots:
SLOT_EM_SELECT = 0   # 1D emitter selection / reuse
SLOT_EM_POS = 1      # 2D emitter position
SLOT_BSDF_LOBE = 2   # 1D BSDF lobe selection
SLOT_BSDF_DIR = 3    # 2D BSDF direction
SLOT_RR = 4          # 1D russian roulette


def bounce_dim(depth, slot):
    return DIM_BOUNCE_BASE + depth * DIMS_PER_BOUNCE + slot


def sampler_spec(scene):
    """Static stratification spec for the scene's sampler, threaded into
    rng.sample_1d/2d so *every* requested dimension is stratified (the
    reference stratifies each request, stratified.cpp:195 /
    sampler.h:64-172 — not just the film jitter).  None = independent;
    non-power-of-two sample counts fall back to independent streams."""
    s = getattr(scene.sensor, "sampler", None)
    if s is None or getattr(s, "id", "independent") == "independent":
        return None
    spp = int(s.sample_count)
    if spp <= 1 or (spp & (spp - 1)):
        return None
    return (s.id, spp)


def mis_weight(pdf_a, pdf_b):
    """Power heuristic (beta=2), ad/integrators/common.py:1318."""
    a2 = pdf_a * pdf_a
    w = a2 / jnp.maximum(a2 + pdf_b * pdf_b, 1e-32)
    return jnp.where(pdf_a > 0.0, w, 0.0)


def sample_rays(scene, seed, spp: int, spp_pass: int | None = None,
                pass_index: int = 0, with_differentials: bool = False):
    """Generate the primary-ray wavefront for one spp pass.

    Mirrors integrator.cpp:293-310 (idx -> pixel position arithmetic) +
    sensor sample_ray dispatch.  Returns (ray, weight, film_pos, lane).
    ``lane`` is the global RNG lane id = pixel * spp + sample — invariant
    to pass splitting and sharding, so results are bitwise independent of
    how the wavefront is partitioned.
    """
    sensor = scene.sensor
    w, h = sensor.film.width, sensor.film.height
    if spp_pass is None:
        spp_pass = spp
    n = w * h * spp_pass
    i = jnp.arange(n, dtype=jnp.int32)
    pixel = i // spp_pass
    lane = pixel * spp + pass_index * spp_pass + (i % spp_pass)
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)

    jitter = rng.sample_2d(seed, lane, jnp.int32(DIM_POS))
    sampler = getattr(sensor, "sampler", None)
    if sampler is not None:
        jitter = sampler.film_jitter(jitter, lane % spp)
    film_pos = jnp.stack([px, py], axis=-1) + jitter
    pos_unit = film_pos / jnp.asarray([w, h], jnp.float32)

    spec = sampler_spec(scene)
    aperture = rng.sample_2d(seed, lane, jnp.int32(DIM_APERTURE), spec)
    wav = rng.sample_1d(seed, lane, jnp.int32(DIM_WAVELENGTH), spec)
    # shutter-interval time sampling (integrator.cpp sample time;
    # sensor.h shutter_open/shutter_open_time)
    sh_t = float(getattr(sensor, "shutter_open_time", 0.0) or 0.0)
    if sh_t > 0.0:
        u_t = rng.sample_1d(seed, lane, jnp.int32(DIM_TIME), spec)
        time = float(getattr(sensor, "shutter_open", 0.0)) + u_t * sh_t
    else:
        time = jnp.zeros((n,))
    if with_differentials:
        from ..sensors import sample_ray_differential

        rd, weight = sample_ray_differential(sensor, time, wav, pos_unit,
                                             aperture)
        return rd, weight, film_pos, lane
    ray, weight = sensor.sample_ray(time, wav, pos_unit, aperture)
    return ray, weight, film_pos, lane


def render(scene, integrator=None, seed: int = 0, spp: int | None = None,
           spp_per_pass: int | None = None, timeout: float | None = None):
    """Full primal render: wavefront -> integrator.sample -> splat -> develop.

    ``integrator``/``spp`` default to the scene's own integrator and the
    sensor sampler's sample_count (mi.render() semantics, util.py:410).
    Multi-pass over spp (integrator.cpp:249-265 wavefront splitting) with
    image-space accumulation before the develop division.

    ``timeout`` (seconds; default the integrator's own ``timeout``
    property, 0 = unlimited) and utils.interrupt.cancel() stop the render
    cooperatively between spp passes (integrator.h:290 cancel/timeout;
    integrator.cpp:219 should_stop) — the partial image is developed
    normally and stays unbiased (weight-normalized).
    """
    if integrator is None:
        integrator = scene.integrator
        assert integrator is not None, "scene has no integrator; pass one"
    # adjoint (light-tracing) integrators use their own render loop
    if getattr(integrator, "id", "") == "ptracer":
        from .ptracer import render_ptracer

        return render_ptracer(scene, integrator, seed=seed, spp=spp)
    sensor = scene.sensor
    film = sensor.film
    if spp is None:
        sampler = getattr(sensor, "sampler", None)
        spp = sampler.sample_count if sampler is not None else 16
    if spp_per_pass is None or spp_per_pass >= spp:
        passes = [(0, spp)]
    else:
        assert spp % spp_per_pass == 0
        passes = [(p, spp_per_pass) for p in range(spp // spp_per_pass)]

    from ...utils.interrupt import RenderWatchdog

    if timeout is None:
        timeout = float(getattr(integrator, "timeout", 0.0) or 0.0)
    watchdog = RenderWatchdog(timeout)
    image = None
    for pass_index, spp_pass in passes:
        if image is not None and watchdog.should_stop():
            break
        img = _render_pass(scene, integrator, jnp.uint32(seed), spp,
                           spp_pass, pass_index)
        image = img if image is None else image + img
    return film.develop(image)


def _render_pass(scene, integrator, seed, spp, spp_pass, pass_index):
    use_rd = bool(getattr(integrator, "ray_diffs", False))
    ray, weight, film_pos, lane = sample_rays(
        scene, seed, spp, spp_pass, pass_index, with_differentials=use_rd
    )
    if use_rd:
        rd, ray = ray, ray.ray
        active = jnp.ones((ray.o.shape[0],), bool)
        L = integrator.sample(scene, ray, lane, seed, active, rd=rd)
    else:
        active = jnp.ones((ray.o.shape[0],), bool)
        L = integrator.sample(scene, ray, lane, seed, active)
    # spp normalization happens in develop() via the filter-weight channel;
    # lanes are pixel-major so the dense scatter-free splat applies
    return scene.sensor.film.put_grouped(film_pos, L * weight, spp_pass,
                                         active)

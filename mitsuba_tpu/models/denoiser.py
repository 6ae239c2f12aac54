"""Guided image denoiser.

Reference: src/render/optixdenoiser.cpp (326 LoC) wraps NVIDIA's
OptiX AI denoiser with optional albedo/normal guide buffers.  The
TPU-native equivalent is an edge-avoiding à-trous wavelet filter with
variance-normalized luminance weights (Dammertz et al. 2010 +
the SVGF spatial pass, Schied et al. 2017): a cascade of dilated 5x5
B3-spline convolutions whose per-pixel weights collapse across
color/albedo/normal discontinuities.  Distances are measured in
log(1+L) so HDR sources (lamps, fireflies) behave; when a per-pixel
variance buffer is supplied (MomentIntegrator — the reference's
moment.cpp), the luminance edge-stopper is scaled by the local noise
level, so noisy regions smooth aggressively while converged edges
stay sharp.  Everything is elementwise math + static shifts, so XLA
fuses the cascade — no host round-trips, differentiable for free.

API mirrors the reference's ``OptixDenoiser(input, albedo, normals)``
call shape: ``denoise(noisy, albedo=None, normals=None,
variance=None)``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# 5-tap B3 spline, outer product gives the 5x5 kernel
_B3 = (1.0 / 16, 4.0 / 16, 6.0 / 16, 4.0 / 16, 1.0 / 16)


def _shift2d(x, dy, dx):
    """Shift (H, W, C) by (dy, dx) with edge replication."""
    H, W = x.shape[0], x.shape[1]
    pad = max(abs(dy), abs(dx), 1)
    xp = jnp.pad(x, ((pad, pad), (pad, pad), (0, 0)), mode="edge")
    return jax.lax.dynamic_slice(
        xp, (pad + dy, pad + dx, 0), (H, W, x.shape[2]))


def _blur3(x):
    """3x3 binomial blur of (H, W, C)."""
    k = (0.25, 0.5, 0.25)
    out = jnp.zeros_like(x)
    for iy in (-1, 0, 1):
        for ix in (-1, 0, 1):
            out = out + (k[iy + 1] * k[ix + 1]) * _shift2d(x, iy, ix)
    return out


@partial(jax.jit, static_argnames=("steps",))
def denoise(noisy, albedo=None, normals=None, variance=None,
            emission=None, steps: int = 4, sigma_color: float = 4.0,
            sigma_albedo: float = 0.1, sigma_normal: float = 0.25):
    """Edge-avoiding à-trous denoise of an (H, W, 3) radiance image.

    ``albedo``/``normals`` are optional (H, W, 3) guide buffers (from
    ``render_aov`` with aovs=("albedo", "sh_normals")); ``variance``
    is the optional (H, W, 3) per-pixel variance of the noisy mean
    (``render_moments``).  ``emission`` is the first-hit emitted
    radiance (the "emission" AOV): directly-seen emitters carry
    subpixel-coverage detail, not shading noise, so that component is
    subtracted, kept unfiltered, and added back at the end.  ``steps``
    dilated passes give an effective footprint of ~2^(steps+1) px.
    """
    img = jnp.asarray(noisy, jnp.float32)
    if emission is not None:
        emission = jnp.asarray(emission, jnp.float32)
        img = jnp.maximum(img - emission, 0.0)
    inv2_a = 1.0 / (2.0 * sigma_albedo * sigma_albedo)
    inv2_n = 1.0 / (2.0 * sigma_normal * sigma_normal)
    # luminance variance in log space: var(log1p(L)) ~ var(L)/(1+L)^2
    if variance is not None:
        var = jnp.mean(
            jnp.asarray(variance, jnp.float32)
            / jnp.square(1.0 + img), axis=-1, keepdims=True)
        var = jnp.maximum(var, 0.0)
    else:
        var = None

    for step in range(steps):
        d = 1 << step
        lum = jnp.mean(jnp.log1p(jnp.maximum(img, 0.0)), -1,
                       keepdims=True)
        if var is not None:
            denom = sigma_color * jnp.sqrt(_blur3(var)) + 1e-4
        else:
            # absolute log-lum scale
            denom = jnp.full(img.shape[:2] + (1,),
                             0.45 * sigma_color / 4.0)
        acc = jnp.zeros_like(img)
        vacc = jnp.zeros_like(var) if var is not None else None
        wacc = jnp.zeros(img.shape[:2] + (1,))
        w2acc = jnp.zeros(img.shape[:2] + (1,))
        for iy in range(-2, 3):
            for ix in range(-2, 3):
                kw = _B3[iy + 2] * _B3[ix + 2]
                q = _shift2d(img, iy * d, ix * d)
                ql = _shift2d(lum, iy * d, ix * d)
                # symmetric denom: a converged pixel (tiny variance,
                # e.g. a directly-seen lamp) must not bleed into noisy
                # neighbors whose own denom is wide open
                qd = jnp.minimum(denom, _shift2d(denom, iy * d, ix * d))
                w = kw * jnp.exp(-jnp.abs(ql - lum) / qd)
                if albedo is not None:
                    qa = _shift2d(albedo, iy * d, ix * d)
                    w = w * jnp.exp(-jnp.sum((qa - albedo) ** 2, -1,
                                             keepdims=True) * inv2_a)
                if normals is not None:
                    qn = _shift2d(normals, iy * d, ix * d)
                    w = w * jnp.exp(-jnp.sum((qn - normals) ** 2, -1,
                                             keepdims=True) * inv2_n)
                acc = acc + w * q
                wacc = wacc + w
                w2acc = w2acc + w * w
                if var is not None:
                    vacc = vacc + w * w * _shift2d(var, iy * d, ix * d)
        img = acc / jnp.maximum(wacc, 1e-8)
        if var is not None:
            # SVGF variance propagation: var' = sum w^2 var / (sum w)^2
            var = vacc / jnp.maximum(wacc * wacc, 1e-12)
    if emission is not None:
        img = img + emission
    return img


def denoise_render(scene, integrator=None, seed: int = 0,
                   spp: int | None = None, steps: int = 4):
    """Render + denoise convenience (the reference's denoiser
    tutorial flow): renders radiance + per-pixel variance with the
    scene's integrator (moment.cpp wrapper) and the albedo/sh_normals
    guide AOVs, then runs :func:`denoise`."""
    from .integrators.aov import (AOVIntegrator, MomentIntegrator,
                                  render_aov, render_moments)

    integ = integrator or scene.integrator
    if spp is None:
        sampler = getattr(scene.sensor, "sampler", None)
        spp = sampler.sample_count if sampler is not None else 16
    mean, m2 = render_moments(scene, integ, seed=seed, spp=spp)
    var = jnp.maximum(m2 - mean * mean, 0.0) / max(spp - 1, 1)
    aovs = render_aov(
        scene,
        AOVIntegrator(aovs=("albedo", "sh_normals", "emission")),
        seed=seed, spp=max(16, (spp or 16) // 4))
    return denoise(mean, aovs["albedo"], aovs["sh_normals"],
                   variance=var, emission=aovs["emission"],
                   steps=steps)

"""Tonemapping utilities (reference: src/python/python/tonemap.py CLI +
Bitmap pixel-format conversions in src/core/bitmap.cpp).

HDR (H, W, 3) linear radiance -> display-ready LDR, with the standard
operators: linear exposure, Reinhard (global), gamma/sRGB encoding.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def linear_to_srgb(x):
    """IEC 61966-2-1 transfer function."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(
        x <= 0.0031308, 12.92 * x,
        1.055 * jnp.power(jnp.maximum(x, 1e-8), 1.0 / 2.4) - 0.055)


def exposure(img, ev: float = 0.0):
    return img * (2.0 ** ev)


def reinhard(img, key: float = 0.18, burn: float = 0.0):
    """Global Reinhard operator (Reinhard et al. 2002, eq. 3/4)."""
    lum = (0.212671 * img[..., 0] + 0.715160 * img[..., 1]
           + 0.072169 * img[..., 2])
    log_avg = jnp.exp(jnp.mean(jnp.log(jnp.maximum(lum, 1e-8))))
    scaled = key / jnp.maximum(log_avg, 1e-12) * lum
    white2 = jnp.maximum(
        (1.0 + burn) * jnp.max(scaled), 1e-8) ** 2
    mapped = scaled * (1.0 + scaled / white2) / (1.0 + scaled)
    ratio = jnp.where(lum > 1e-8, mapped / jnp.maximum(lum, 1e-8), 0.0)
    return img * ratio[..., None]


def tonemap(img, mode: str = "reinhard", ev: float = 0.0,
            gamma: float | None = None, to_uint8: bool = False):
    """HDR -> LDR.  mode: 'linear' | 'reinhard'.  gamma=None uses sRGB."""
    img = exposure(jnp.asarray(img, jnp.float32), ev)
    if mode == "reinhard":
        img = reinhard(img)
    elif mode != "linear":
        raise ValueError(f"unknown tonemap mode {mode!r}")
    if gamma is None:
        out = linear_to_srgb(img)
    else:
        out = jnp.clip(img, 0.0, 1.0) ** (1.0 / gamma)
    if to_uint8:
        return np.asarray(
            jnp.clip(out * 255.0 + 0.5, 0, 255)).astype(np.uint8)
    return out

"""Spot-size losses for lens design.

Reference: notebooks/scripts/lens_design/losses.py:8-41 [FORK] —
intensity-weighted second moment (RMS spot radius squared) of a rendered
spot image, with a detached centroid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_loss_and_center(image):
    """(rms_sq, ibar, jbar) — losses.py:31.  image: (H, W, 3)."""
    scaled = image / jnp.maximum(
        jnp.mean(jax.lax.stop_gradient(image)), 1e-20
    )
    h, w = image.shape[0], image.shape[1]
    ii, jj = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    intens = jnp.mean(scaled, axis=-1)
    inv_sum = 1.0 / jnp.maximum(jnp.sum(intens), 1e-20)
    ibar = jax.lax.stop_gradient(jnp.sum(ii * intens) * inv_sum)
    jbar = jax.lax.stop_gradient(jnp.sum(jj * intens) * inv_sum)
    rms_sq = jnp.sum(
        intens * (jnp.square(ii - ibar) + jnp.square(jj - jbar))
    ) * inv_sum
    return rms_sq, ibar, jbar


def rms_loss(image):
    """RMS spot radius squared (losses.py:8)."""
    return rms_loss_and_center(image)[0]

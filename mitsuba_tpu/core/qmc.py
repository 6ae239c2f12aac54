"""Quasi-Monte-Carlo: radical inverse / Halton points.

Reference: src/core/qmc.cpp (180 LoC) + qmc.h — used by the [FORK] lens
camera's exit-pupil LUT construction (realisticlens.cpp:915,1697) with
bases 2 and 3.  Vectorized over uint32 indices.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def radical_inverse_2(i):
    """Base-2 radical inverse (bit reversal), i: uint32 array -> [0,1)."""
    v = jnp.asarray(i, _U32)
    v = ((v >> 16) | (v << 16)) & _U32(0xFFFFFFFF)
    v = ((v & _U32(0x00FF00FF)) << 8) | ((v & _U32(0xFF00FF00)) >> 8)
    v = ((v & _U32(0x0F0F0F0F)) << 4) | ((v & _U32(0xF0F0F0F0)) >> 4)
    v = ((v & _U32(0x33333333)) << 2) | ((v & _U32(0xCCCCCCCC)) >> 2)
    v = ((v & _U32(0x55555555)) << 1) | ((v & _U32(0xAAAAAAAA)) >> 1)
    return v.astype(jnp.float32) * jnp.float32(2.3283064365386963e-10)


def radical_inverse(base: int, i, digits: int = 20):
    """General base-b radical inverse with a static digit count."""
    if base == 2:
        return radical_inverse_2(i)
    i = jnp.asarray(i, jnp.int64) if False else jnp.asarray(i, jnp.int32)
    inv_base = 1.0 / base
    value = jnp.zeros(jnp.shape(i), jnp.float32)
    factor = jnp.float32(inv_base)
    n = i
    for _ in range(digits):
        digit = n % base
        value = value + digit.astype(jnp.float32) * factor
        factor = factor * inv_base
        n = n // base
    return value


def halton_2d(i):
    """(base2, base3) Halton point for index array i -> (..., 2)."""
    return jnp.stack(
        [radical_inverse_2(i), radical_inverse(3, i)], axis=-1
    )

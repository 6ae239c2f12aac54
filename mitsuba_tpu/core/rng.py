"""Stateless counter-based RNG for Monte-Carlo sampling.

The reference carries a mutable PCG32 state per lane (include/mitsuba/core/
random.h) and relies on replaying the *state sequence* to make the PRB
adjoint pass re-draw identical samples (src/python/python/ad/integrators/
common.py:764-777).  On TPU we instead make every sample a pure function

    u = U(seed, lane, dim)

of a global seed, the lane index (pixel*spp+sample), and a dimension counter
that the integrator increments per request.  This gives PRB replay
determinism *by construction* and is invariant to how lanes are sharded
across chips.

The hash is PCG4D/PCG3D (Jarzynski & Olano, "Hash Functions for GPU
Rendering", JCGT 2020) over uint32 lanes — a few fused VPU ops per sample,
no carried state.
"""
from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def _pcg3d(v0, v1, v2):
    """PCG3D hash: 3x uint32 -> 3x uint32, high quality, cheap."""
    v0 = v0 * _U32(1664525) + _U32(1013904223)
    v1 = v1 * _U32(1664525) + _U32(1013904223)
    v2 = v2 * _U32(1664525) + _U32(1013904223)
    v0 = v0 + v1 * v2
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v0 = v0 + v1 * v2
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    return v0, v1, v2


def _to_unit(bits):
    """uint32 -> float32 in [0, 1).  Uses the top 24 bits."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def hash_u32(*words):
    """Mix an arbitrary number of uint32 words into one uint32."""
    v0 = jnp.asarray(words[0], _U32)
    v1 = jnp.asarray(words[1], _U32) if len(words) > 1 else _U32(0x9E3779B9)
    v2 = jnp.asarray(words[2], _U32) if len(words) > 2 else _U32(0x85EBCA6B)
    for w in words[3:]:
        v2 = v2 ^ jnp.asarray(w, _U32)
        v0, v1, v2 = _pcg3d(v0, v1, v2)
    v0, v1, v2 = _pcg3d(v0, v1, v2)
    return v0


def permute_pow2(s, n: int, key):
    """Keyed bijection of [0, n), n a power of two.

    Composition of masked bijections mod 2^k (odd multiply, add, xor,
    masked xorshift-right) keyed per (pixel, dim) — the stateless
    replacement for the reference's per-dimension stratum shuffles
    (stratified.cpp:195).  Stateless, so PRB replay and sharding
    invariance hold by construction.
    """
    w = _U32(n - 1)
    i = jnp.asarray(s, _U32) & w
    k = jnp.asarray(key, _U32)
    for c1, c2, sh in ((0xE170893D, 0x0929EB3F, 1),
                       (0x6935FA69, 0x74DCCA23, 2),
                       (0x9EFE26B9, 0x42F0E1EB, 3)):
        i = (i ^ k) & w
        i = (i * _U32(c1 | 1)) & w
        i = (i + (k >> 8)) & w
        i = (i ^ (i >> sh)) & w
        i = (i * _U32(c2 | 1)) & w
        k = k * _U32(1664525) + _U32(1013904223)
    return i


def _strat_split(lane, spp: int):
    lane = jnp.asarray(lane, _U32)
    return lane // _U32(spp), lane % _U32(spp)


def sample_1d(seed, lane, dim, spec=None):
    """One uniform float per lane.  seed: scalar; lane, dim: int32 arrays.

    ``spec`` optionally stratifies the dimension: a static
    ``(kind, spp)`` tuple (kind unused beyond identity; spp a power of
    two) splits ``lane`` into (pixel, sample) and stratifies the spp
    samples of each pixel into spp jittered strata, visited in a keyed
    per-(pixel, dim) permutation (reference sampler.h:64-172 /
    stratified.cpp:195 — here stateless over (seed, lane, dim))."""
    v0, _, _ = _pcg3d(
        jnp.asarray(lane, _U32),
        jnp.asarray(dim, _U32),
        jnp.asarray(seed, _U32) ^ _U32(0xDEADBEEF),
    )
    u = _to_unit(v0)
    if spec is None:
        return u
    _, spp = spec
    if spp <= 1 or (spp & (spp - 1)):
        return u
    pixel, s = _strat_split(lane, spp)
    key = hash_u32(pixel, jnp.asarray(dim, _U32) ^ _U32(0xA511E9B3),
                   jnp.asarray(seed, _U32))
    p = permute_pow2(s, spp, key).astype(jnp.float32)
    return (p + u) * jnp.float32(1.0 / spp)


def sample_2d(seed, lane, dim, spec=None):
    """Two uniform floats per lane, shape (..., 2).

    With ``spec`` (see sample_1d): even powers of two stratify on a
    sqrt(spp)^2 grid through one keyed permutation; odd powers fall back
    to per-component latin-hypercube stratification."""
    v0, v1, _ = _pcg3d(
        jnp.asarray(lane, _U32),
        jnp.asarray(dim, _U32),
        jnp.asarray(seed, _U32) ^ _U32(0xDEADBEEF),
    )
    u0, u1 = _to_unit(v0), _to_unit(v1)
    if spec is None:
        return jnp.stack([u0, u1], axis=-1)
    _, spp = spec
    if spp <= 1 or (spp & (spp - 1)):
        return jnp.stack([u0, u1], axis=-1)
    pixel, s = _strat_split(lane, spp)
    key = hash_u32(pixel, jnp.asarray(dim, _U32) ^ _U32(0x51633E2D),
                   jnp.asarray(seed, _U32))
    r = 1 << (spp.bit_length() // 2)
    if r * r == spp:
        p = permute_pow2(s, spp, key)
        sx = (p % _U32(r)).astype(jnp.float32)
        sy = (p // _U32(r)).astype(jnp.float32)
        inv = jnp.float32(1.0 / r)
        return jnp.stack([(sx + u0) * inv, (sy + u1) * inv], axis=-1)
    px = permute_pow2(s, spp, key).astype(jnp.float32)
    py = permute_pow2(s, spp, key ^ _U32(0x6D2B79F5)).astype(jnp.float32)
    inv = jnp.float32(1.0 / spp)
    return jnp.stack([(px + u0) * inv, (py + u1) * inv], axis=-1)


def sample_3d(seed, lane, dim):
    v0, v1, v2 = _pcg3d(
        jnp.asarray(lane, _U32),
        jnp.asarray(dim, _U32),
        jnp.asarray(seed, _U32) ^ _U32(0xDEADBEEF),
    )
    return jnp.stack([_to_unit(v0), _to_unit(v1), _to_unit(v2)], axis=-1)


def sample_tea_32(v0, v1, rounds: int = 4):
    """TEA-based seed decorrelation (reference: src/python/python/util.py:517).

    Used to derive independent per-frame / per-pass seeds from (seed, index).
    """
    v0 = jnp.asarray(v0, _U32)
    v1 = jnp.asarray(v1, _U32)
    s = _U32(0)
    for _ in range(rounds):
        s = s + _U32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + _U32(0xA341316C)) ^ (v1 + s) ^ ((v1 >> 5) + _U32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + _U32(0xAD90777D)) ^ (v0 + s) ^ ((v0 >> 5) + _U32(0x7E95761E)))
    return v0, v1

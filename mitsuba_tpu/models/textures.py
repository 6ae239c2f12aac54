"""Textures: spatially-varying spectra over surface UVs.

Reference: src/textures/{bitmap.cpp (803), checkerboard.cpp (137)} and the
Texture interface (src/render/texture.cpp).  Each texture is a pytree
dataclass with ``eval(si) -> (N, C)``; bitmap texel grids are differentiable
leaves (the classic texture-optimization workload, BASELINE config 3).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static


@pytree
class ConstantTexture:
    value: jnp.ndarray  # (C,) — typically (3,) RGB
    id: str = static("const")

    def eval(self, si):
        n = si.uv.shape[0]
        return jnp.broadcast_to(self.value, (n,) + self.value.shape)

    def mean(self):
        return jnp.mean(self.value)


@pytree
class CheckerboardTexture:
    color0: jnp.ndarray  # (C,)
    color1: jnp.ndarray  # (C,)
    scale: jnp.ndarray   # (2,) uv tiling frequency
    id: str = static("checker")

    def eval(self, si):
        uv = si.uv * self.scale
        mask = (
            (jnp.floor(uv[..., 0]) + jnp.floor(uv[..., 1])) % 2.0
        ) < 1.0
        return jnp.where(mask[..., None], self.color0, self.color1)

    def mean(self):
        return 0.5 * (jnp.mean(self.color0) + jnp.mean(self.color1))


@pytree
class BitmapTexture:
    """Bilinear/nearest texel lookup; data is a differentiable leaf.

    Reference: src/textures/bitmap.cpp (differentiable texture used by the
    prb texture-recovery benchmark).
    """

    data: jnp.ndarray  # (H, W, C)
    filter_nearest: bool = static(False)
    wrap_repeat: bool = static(True)
    id: str = static("bitmap")

    def eval(self, si):
        h, w = self.data.shape[0], self.data.shape[1]
        u = si.uv[..., 0]
        v = si.uv[..., 1]
        if self.wrap_repeat:
            u = u - jnp.floor(u)
            v = v - jnp.floor(v)
        else:
            u = jnp.clip(u, 0.0, 1.0)
            v = jnp.clip(v, 0.0, 1.0)
        # image convention: v=0 is the top row (matches the reference loader)
        x = u * w - 0.5
        y = (1.0 - v) * h - 0.5
        if self.filter_nearest:
            xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
            return self.data[yi, xi]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        d = self.data
        return (
            d[y0i, x0i] * (1 - fx) * (1 - fy)
            + d[y0i, x1i] * fx * (1 - fy)
            + d[y1i, x0i] * (1 - fx) * fy
            + d[y1i, x1i] * fx * fy
        )

    def mean(self):
        return jnp.mean(self.data)


@pytree
class CheckerlinesTexture:
    """[FORK-era] debug grid-lines texture (src/textures/checkerlines.cpp):
    thin dark lines on a light background along uv gridlines."""

    color0: jnp.ndarray  # line color
    color1: jnp.ndarray  # background
    scale: jnp.ndarray   # (2,) tiling
    line_width: float = static(0.05)
    id: str = static("checkerlines")

    def eval(self, si):
        uv = si.uv * self.scale
        fu = uv[..., 0] - jnp.floor(uv[..., 0])
        fv = uv[..., 1] - jnp.floor(uv[..., 1])
        w = self.line_width
        on_line = (fu < w) | (fu > 1 - w) | (fv < w) | (fv > 1 - w)
        return jnp.where(on_line[..., None], self.color0, self.color1)

    def mean(self):
        return 0.5 * (jnp.mean(self.color0) + jnp.mean(self.color1))


@pytree
class PolarLinesTexture:
    """[FORK-era] polar debug texture (src/textures/polarlines.cpp):
    rings + spokes around the uv center."""

    color0: jnp.ndarray
    color1: jnp.ndarray
    rings: float = static(8.0)
    spokes: float = static(16.0)
    line_width: float = static(0.08)
    id: str = static("polarlines")

    def eval(self, si):
        c = si.uv - 0.5
        r = jnp.sqrt(jnp.maximum(jnp.sum(c * c, axis=-1), 1e-20))
        theta = jnp.arctan2(c[..., 1], c[..., 0])
        fr = r * self.rings - jnp.floor(r * self.rings)
        ft = (theta / (2 * jnp.pi) * self.spokes)
        ft = ft - jnp.floor(ft)
        w = self.line_width
        on = (fr < w) | (ft < w)
        return jnp.where(on[..., None], self.color0, self.color1)

    def mean(self):
        return 0.5 * (jnp.mean(self.color0) + jnp.mean(self.color1))

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
    mips: tuple = ()   # optional box-filtered pyramid (coarser levels)
    filter_nearest: bool = static(False)
    wrap_repeat: bool = static(True)
    id: str = static("bitmap")

    @staticmethod
    def with_mips(data, filter_nearest=False, wrap_repeat=True):
        """Build the mip pyramid for footprint-aware (ray-differential)
        lookups: repeated 2x2 box downsampling to 1x1.  The pyramid is
        detached — gradients flow through the base level only, like the
        reference's differentiable bitmap."""
        import jax

        data = jnp.asarray(data, jnp.float32)
        mips = []
        cur = jax.lax.stop_gradient(data)
        while cur.shape[0] > 1 or cur.shape[1] > 1:
            h = max(cur.shape[0] // 2, 1)
            w = max(cur.shape[1] // 2, 1)
            cur = cur[: 2 * h, : 2 * w]
            cur = 0.25 * (cur[0::2, 0::2] + cur[1::2, 0::2]
                          + cur[0::2, 1::2] + cur[1::2, 1::2])
            mips.append(cur)
        return BitmapTexture(data=data, mips=tuple(mips),
                             filter_nearest=filter_nearest,
                             wrap_repeat=wrap_repeat)

    def _level_eval(self, data, u, v):
        h, w = data.shape[0], data.shape[1]
        # image convention: v=0 is the top row (matches the loader)
        x = u * w - 0.5
        y = (1.0 - v) * h - 0.5
        if self.filter_nearest:
            xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
            yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
            return data[yi, xi]
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        return (
            data[y0i, x0i] * (1 - fx) * (1 - fy)
            + data[y0i, x1i] * fx * (1 - fy)
            + data[y1i, x0i] * (1 - fx) * fy
            + data[y1i, x1i] * fx * fy
        )

    def eval(self, si):
        u = si.uv[..., 0]
        v = si.uv[..., 1]
        if self.wrap_repeat:
            u = u - jnp.floor(u)
            v = v - jnp.floor(v)
        else:
            u = jnp.clip(u, 0.0, 1.0)
            v = jnp.clip(v, 0.0, 1.0)
        base = self._level_eval(self.data, u, v)
        duv_dx = getattr(si, "duv_dx", None)
        if not self.mips or duv_dx is None:
            return base
        # footprint-aware trilinear lookup: isotropic LOD from the
        # larger screen-space uv derivative (si.bsdf(ray) ray-diff
        # path; bitmap.cpp + interaction.h:85)
        h, w = self.data.shape[0], self.data.shape[1]
        fp = jnp.maximum(
            jnp.sqrt(jnp.sum(duv_dx ** 2, -1)) * w,
            jnp.sqrt(jnp.sum(si.duv_dy ** 2, -1)) * h)
        lod = jnp.log2(jnp.maximum(fp, 1e-8))
        n_lv = len(self.mips)
        lod = jnp.clip(lod, 0.0, float(n_lv))
        lo = jnp.floor(lod)
        fr = (lod - lo)[..., None]
        levels = (self.data,) + self.mips
        out_lo = jnp.zeros_like(base)
        out_hi = jnp.zeros_like(base)
        for k, lv in enumerate(levels):
            val = self._level_eval(lv, u, v)
            out_lo = jnp.where((lo == k)[..., None], val, out_lo)
            out_hi = jnp.where(
                (jnp.minimum(lo + 1, n_lv) == k)[..., None], val, out_hi)
        return out_lo * (1.0 - fr) + out_hi * fr

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


@pytree
class Volume3DTexture:
    """3D volume lookup at the hit POSITION (src/textures/volume.cpp +
    src/render/volume.cpp): trilinear sample of a (D, H, W, C) grid
    placed in [bbox_min, bbox_max]; differentiable in ``data``."""

    data: jnp.ndarray      # (D, H, W, C)
    bbox_min: jnp.ndarray  # (3,)
    bbox_max: jnp.ndarray  # (3,)
    id: str = static("volume")

    def eval(self, si):
        p = si.p
        u = (p - self.bbox_min) / (self.bbox_max - self.bbox_min)
        d, h, w = self.data.shape[0], self.data.shape[1], self.data.shape[2]
        # grid coords (z, y, x) — cell centers at half-integers
        g = jnp.stack([
            u[..., 2] * d - 0.5, u[..., 1] * h - 0.5, u[..., 0] * w - 0.5,
        ], axis=-1)
        i0 = jnp.floor(g).astype(jnp.int32)
        f = g - i0
        out = 0.0
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    iz = jnp.clip(i0[..., 0] + dz, 0, d - 1)
                    iy = jnp.clip(i0[..., 1] + dy, 0, h - 1)
                    ix = jnp.clip(i0[..., 2] + dx, 0, w - 1)
                    wgt = (
                        jnp.where(dz, f[..., 0], 1 - f[..., 0])
                        * jnp.where(dy, f[..., 1], 1 - f[..., 1])
                        * jnp.where(dx, f[..., 2], 1 - f[..., 2])
                    )
                    out = out + wgt[..., None] * self.data[iz, iy, ix]
        inside = jnp.all((u >= 0.0) & (u <= 1.0), axis=-1)
        return jnp.where(inside[..., None], out, 0.0)

    def mean(self):
        return jnp.mean(self.data)


@pytree
class MeshAttributeTexture:
    """Per-vertex mesh attribute, barycentrically interpolated
    (src/textures/mesh_attribute.cpp).  ``faces``/``attr`` are the
    GLOBAL face table and per-vertex attribute rows of the scene
    geometry; lookup uses si.prim_index + the barycentric uv that
    meshes without explicit UVs expose."""

    attr: jnp.ndarray   # (V, C) per-vertex values (differentiable)
    faces: jnp.ndarray  # (F, 3) int32
    id: str = static("mesh_attribute")

    def eval(self, si):
        f = self.faces[jnp.maximum(si.prim_index, 0)]
        b1 = si.uv[..., 0]
        b2 = si.uv[..., 1]
        b0 = 1.0 - b1 - b2
        a0 = self.attr[f[..., 0]]
        a1 = self.attr[f[..., 1]]
        a2 = self.attr[f[..., 2]]
        return (b0[..., None] * a0 + b1[..., None] * a1
                + b2[..., None] * a2)

    def mean(self):
        return jnp.mean(self.attr)


@pytree
class Comb2DTexture:
    """[FORK-era debug texture] 2D comb: thin bright lines at regular uv
    intervals on a dark field (src/textures/comb2d.cpp)."""

    color0: jnp.ndarray  # (C,) background
    color1: jnp.ndarray  # (C,) lines
    scale: jnp.ndarray = None   # () lines per unit uv
    line_width: float = static(0.05)
    id: str = static("comb2d")

    def __post_init__(self):
        if self.scale is None:
            object.__setattr__(self, "scale", jnp.asarray(8.0))

    def eval(self, si):
        fu = si.uv * self.scale - jnp.floor(si.uv * self.scale)
        on = jnp.any((fu < self.line_width)
                     | (fu > 1.0 - self.line_width), axis=-1)
        return jnp.where(on[..., None], self.color1, self.color0)

    def mean(self):
        return jnp.mean(self.color0)


@pytree
class StarTexture:
    """[FORK-era debug texture] Siemens-star sectors around the uv
    center (src/textures/star.cpp) — resolution target for lens spots."""

    color0: jnp.ndarray  # (C,)
    color1: jnp.ndarray  # (C,)
    n_spokes: int = static(16)
    id: str = static("star")

    def eval(self, si):
        d = si.uv - 0.5
        theta = jnp.arctan2(d[..., 1], d[..., 0])
        sector = jnp.floor(theta / (2.0 * jnp.pi) * self.n_spokes * 2.0)
        on = (sector % 2.0) == 0.0
        return jnp.where(on[..., None], self.color1, self.color0)

    def mean(self):
        return 0.5 * (jnp.mean(self.color0) + jnp.mean(self.color1))

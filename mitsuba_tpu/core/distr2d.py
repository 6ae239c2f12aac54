"""2D sampling distributions (reference: include/mitsuba/core/distr_2d.h,
1467 LoC — Hierarchical2D / Marginal2D used by envmap and measured-BSDF
importance sampling).

TPU design: the marginal-conditional formulation (Marginal2D) vectorizes
cleanly — a row marginal CDF plus per-row conditional CDFs, sampled with
two inverse-CDF lookups.  For the table sizes involved (envmaps up to
~2k x 1k) the inner searchsorted is fine (log2 steps); the reference's
hierarchical mipmap walk exists to save memory traffic on CPUs and is not
needed here.
"""
from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree, static
from .math import safe_div


@pytree
class Marginal2D:
    """Piecewise-constant 2D distribution over [0,1]^2.

    ``pdf_table`` is (H, W) cell weights (unnormalized); sampling returns
    continuous (u, v) in [0,1]^2 with density pdf(u,v) (per unit area).
    """

    pdf_table: jnp.ndarray   # (H, W) nonnegative
    row_cdf: jnp.ndarray     # (H,) inclusive normalized
    cond_cdf: jnp.ndarray    # (H, W) inclusive normalized per row
    row_weight: jnp.ndarray  # (H,) row sums
    total: jnp.ndarray       # ()

    @staticmethod
    def create(table):
        table = jnp.asarray(table, jnp.float32)
        row_w = jnp.sum(table, axis=1)
        total = jnp.sum(row_w)
        row_cdf = safe_div(jnp.cumsum(row_w), total)
        cond = safe_div(jnp.cumsum(table, axis=1), row_w[:, None])
        return Marginal2D(pdf_table=table, row_cdf=row_cdf, cond_cdf=cond,
                          row_weight=row_w, total=total)

    @property
    def shape(self):
        return self.pdf_table.shape

    def _searchsorted_rows(self, cdf_rows, u):
        """Vectorized per-lane searchsorted of u into gathered CDF rows.

        cdf_rows: (N, W), u: (N,) -> int32 (N,) first index with
        cdf >= u."""
        return jnp.sum((cdf_rows < u[:, None]).astype(jnp.int32), axis=1)

    def sample(self, sample2):
        """(N,2) uniforms -> ((N,2) uv, (N,) pdf per unit area)."""
        h, w = self.shape
        u1 = sample2[..., 1]
        # row (v) via the marginal
        row = jnp.sum((self.row_cdf[None, :] < u1[:, None]).astype(jnp.int32),
                      axis=1)
        row = jnp.clip(row, 0, h - 1)
        lo_r = jnp.where(row > 0, self.row_cdf[jnp.maximum(row - 1, 0)], 0.0)
        pr = safe_div(self.row_weight[row], self.total)
        v_frac = jnp.clip(safe_div(u1 - lo_r, pr), 0.0, 1.0 - 1e-7)
        v = (row.astype(jnp.float32) + v_frac) / h
        # column (u) via the conditional
        cdf_rows = self.cond_cdf[row]          # (N, W)
        u0 = sample2[..., 0]
        col = jnp.clip(self._searchsorted_rows(cdf_rows, u0), 0, w - 1)
        lo_c = jnp.where(
            col > 0,
            jnp.take_along_axis(cdf_rows, jnp.maximum(col - 1, 0)[:, None],
                                axis=1)[:, 0],
            0.0,
        )
        pc = safe_div(self.pdf_table[row, col], self.row_weight[row])
        u_frac = jnp.clip(safe_div(u0 - lo_c, pc), 0.0, 1.0 - 1e-7)
        u = (col.astype(jnp.float32) + u_frac) / w
        pdf = self.pdf(jnp.stack([u, v], axis=-1))
        return jnp.stack([u, v], axis=-1), pdf

    def pdf(self, uv):
        """Density at uv (per unit area of [0,1]^2)."""
        h, w = self.shape
        col = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        row = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        cell = self.pdf_table[row, col]
        return safe_div(cell * (h * w), self.total)


@pytree
class Hierarchical2D:
    """Hierarchical sample warping over a 2D table (distr_2d.h
    Hierarchical2D<0>): a mip pyramid of cell masses descended one level
    at a time, choosing the quadrant proportionally to its mass and
    rescaling the uniforms.  Equivalent distribution to Marginal2D with
    a different (locality-preserving) warp; kept for API parity and for
    workloads that warp-blend nearby samples (measured BSDFs).

    Table sides are padded to the next power of two; levels are a static
    tuple from finest (0) to the 1x1 root.
    """

    levels: tuple            # tuple of (H_l, W_l) arrays, fine -> coarse
    size: tuple = static((1, 1))  # original (H, W)

    @staticmethod
    def create(table):
        import numpy as np

        table = jnp.asarray(table, jnp.float32)
        h, w = int(table.shape[0]), int(table.shape[1])
        n = 1
        while n < max(h, w):
            n *= 2
        padded = jnp.zeros((n, n), jnp.float32).at[:h, :w].set(table)
        levels = [padded]
        while levels[-1].shape[0] > 1:
            c = levels[-1]
            levels.append(
                c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2]
                + c[1::2, 1::2])
        return Hierarchical2D(levels=tuple(levels), size=(h, w))

    def sample(self, sample2):
        """(N,2) uniforms -> ((N,2) uv in [0,1]^2 over the ORIGINAL
        table extent, (N,) pdf per unit area)."""
        n_side = self.levels[0].shape[0]
        u = sample2[..., 0]
        v = sample2[..., 1]
        x = jnp.zeros(u.shape, jnp.int32)
        y = jnp.zeros(u.shape, jnp.int32)
        # descend from the root: levels[-1] is 1x1
        for li in range(len(self.levels) - 2, -1, -1):
            lvl = self.levels[li]
            x = x * 2
            y = y * 2
            c00 = lvl[y, x]
            c01 = lvl[y, x + 1]
            c10 = lvl[y + 1, x]
            c11 = lvl[y + 1, x + 1]
            left = c00 + c10
            right = c01 + c11
            p_left = left / jnp.maximum(left + right, 1e-20)
            go_right = u >= p_left
            u = jnp.where(go_right,
                          (u - p_left) / jnp.maximum(1.0 - p_left, 1e-20),
                          u / jnp.maximum(p_left, 1e-20))
            x = x + go_right.astype(jnp.int32)
            top = jnp.where(go_right, c01, c00)
            bot = jnp.where(go_right, c11, c10)
            p_top = top / jnp.maximum(top + bot, 1e-20)
            go_bot = v >= p_top
            v = jnp.where(go_bot,
                          (v - p_top) / jnp.maximum(1.0 - p_top, 1e-20),
                          v / jnp.maximum(p_top, 1e-20))
            y = y + go_bot.astype(jnp.int32)
        u = jnp.clip(u, 0.0, 1.0 - 2 ** -24)
        v = jnp.clip(v, 0.0, 1.0 - 2 ** -24)
        h, w = self.size
        uv = jnp.stack([
            (x.astype(jnp.float32) + u) / w,
            (y.astype(jnp.float32) + v) / h,
        ], axis=-1)
        pdf = self.pdf(uv)
        return uv, pdf

    def pdf(self, uv):
        """Density per unit area of the ORIGINAL [0,1]^2 domain."""
        h, w = self.size
        lvl = self.levels[0]
        x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
        y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
        total = self.levels[-1][0, 0]
        return lvl[y, x] / jnp.maximum(total, 1e-20) * (h * w)

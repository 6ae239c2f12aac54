"""Parameterized continuous Marginal2D warps (reference:
include/mitsuba/core/distr_2d.h Marginal2D<Float, Dim, Continuous=true>
— the ``Warp2D0/2D2/2D3`` family used by the measured BSDF,
src/bsdfs/measured.cpp:77-79).

The density is piecewise-BILINEAR over an (H, W) vertex grid on
[0,1]^2, optionally parameterized by up to three conditioning
parameters (e.g. phi_i, theta_i, wavelength); conditioning
interpolates linearly between parameter slices *inside* the CDF
inversion, exactly like the reference's ``lookup`` recursion.

TPU design: the per-lane binary searches run as statically-unrolled
bisection loops (log2(H) steps of 2^D-corner gathers); everything else
is elementwise.  All tables are flat jnp arrays; the warp is a pytree
and traces cleanly under jit/grad.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .pytree import pytree, static


def _sample_segment(sample, inv_width, v0, v1):
    """Invert the linear-density segment CDF (distr_2d.h:1429)."""
    non_const = jnp.abs(v0 - v1) > 1e-4 * (v0 + v1)
    divisor = jnp.where(non_const, v0 - v1, v0 + v1)
    s = sample * (2.0 * inv_width)
    s_nc = v0 - jnp.sqrt(jnp.maximum(v0 * v0 + s * (v1 - v0), 0.0))
    s = jnp.where(non_const, s_nc, s)
    return jnp.where(divisor != 0.0, s / jnp.where(divisor != 0.0,
                                                   divisor, 1.0), s)


def _invert_segment(sample, width, v0, v1):
    """CDF of the linear-density segment (distr_2d.h:1440)."""
    return sample * (v0 + 0.5 * sample * (v1 - v0)) * width


@pytree
class Warp2D:
    """data layout: all tables carry a leading flattened param-slice
    axis S = prod(param sizes) (S=1 when unparameterized)."""

    data: jnp.ndarray       # (S, H, W) vertex densities (normalized)
    marg_cdf: jnp.ndarray   # (S, H-1)
    cond_cdf: jnp.ndarray   # (S, H, W-1)
    param_values: tuple     # tuple of knot arrays (jnp, ascending)
    param_strides: tuple = static(())
    normalized: bool = static(True)

    # ------------------------------------------------------------- build

    @staticmethod
    def create(data, param_values=(), normalize=True, build_cdf=True):
        """``data``: (*param_sizes, H, W) vertex values (host numpy).
        Mirrors the Marginal2D<...,true> constructor (distr_2d.h:870)."""
        data = np.asarray(data, np.float64)
        p_sizes = data.shape[:-2]
        H, W = data.shape[-2], data.shape[-1]
        S = int(np.prod(p_sizes)) if p_sizes else 1
        d = data.reshape(S, H, W)

        # conditional CDF along x per vertex row (piecewise-linear)
        scale_x = 0.5 / (W - 1)
        scale_y = 0.5 / (H - 1)
        cond = np.cumsum(scale_x * (d[:, :, :-1] + d[:, :, 1:]), axis=2)
        row_int = cond[:, :, -1]                       # (S, H)
        marg = np.cumsum(scale_y * (row_int[:, :-1] + row_int[:, 1:]),
                         axis=1)                       # (S, H-1)
        if normalize:
            norm = 1.0 / np.maximum(marg[:, -1:], 1e-30)   # (S, 1)
            d = d * norm[:, :, None]
            cond = cond * norm[:, :, None]
            marg = marg * norm
        strides = []
        acc = 1
        for n in reversed([int(s) for s in p_sizes]):
            strides.append(acc)
            acc *= n
        strides = tuple(reversed(strides))
        return Warp2D(
            data=jnp.asarray(d, jnp.float32),
            marg_cdf=jnp.asarray(marg if build_cdf
                                 else np.zeros((S, 1)), jnp.float32),
            cond_cdf=jnp.asarray(cond if build_cdf
                                 else np.zeros((S, 1, 1)), jnp.float32),
            param_values=tuple(jnp.asarray(p, jnp.float32)
                               for p in param_values),
            param_strides=strides,
            normalized=bool(normalize),
        )

    # --------------------------------------------------- param weighting

    def _param_weights(self, params):
        """Per-dim (index, w0, w1) + base slice offset (N,) —
        interpolate_weights (distr_2d.h:250)."""
        if not self.param_values:
            return None, []
        n = params[0].shape[0]
        slice_off = jnp.zeros((n,), jnp.int32)
        pw = []
        for dim, knots in enumerate(self.param_values):
            k = int(knots.shape[0])
            if k == 1:
                pw.append((jnp.ones((n,)), jnp.zeros((n,))))
                continue
            idx = jnp.clip(
                jnp.searchsorted(knots, params[dim], side="right") - 1,
                0, k - 2)
            p0 = knots[idx]
            p1 = knots[idx + 1]
            w1 = jnp.clip((params[dim] - p0)
                          / jnp.maximum(p1 - p0, 1e-20), 0.0, 1.0)
            pw.append((1.0 - w1, w1))
            slice_off = slice_off + self.param_strides[dim] * idx
        return slice_off, pw

    def _corners(self, slice_off, pw):
        """List of (slice_index (N,), weight (N,)) over 2^D corners."""
        if slice_off is None:
            return [(0, 1.0)]
        D = len(self.param_values)
        out = []
        for bits in range(1 << D):
            off = slice_off
            w = None
            for d in range(D):
                k = int(self.param_values[d].shape[0])
                hi = (bits >> d) & 1
                if hi and k > 1:
                    off = off + self.param_strides[d]
                wd = pw[d][1] if hi else pw[d][0]
                w = wd if w is None else w * wd
            out.append((off, w))
        return out

    def _lookup(self, table_flat, per_slice, idx, corners):
        """Param-interpolated gather: sum_corners w * table[slice, idx]."""
        out = 0.0
        for off, w in corners:
            out = out + w * jnp.take(table_flat, off * per_slice + idx,
                                     mode="clip")
        return out

    # ------------------------------------------------------------ sample

    def _shapes(self):
        S, H, W = self.data.shape
        return S, H, W

    def sample(self, sample2, params=()):
        """(sample2 in [0,1]^2) -> (pos in [0,1]^2, pdf) —
        sample_continuous (distr_2d.h:1257)."""
        S, H, W = self._shapes()
        n_marg, n_cond, n_data = H - 1, H * (W - 1), H * W
        marg = self.marg_cdf.reshape(-1)
        cond = self.cond_cdf.reshape(-1)
        dat = self.data.reshape(-1)
        slice_off, pw = self._param_weights(tuple(params))
        corners = self._corners(slice_off, pw)

        eps = 1e-7
        sx = jnp.clip(sample2[..., 0], eps, 1.0 - eps)
        sy = jnp.clip(sample2[..., 1], eps, 1.0 - eps)

        def fetch_marg(idx):
            return self._lookup(marg, n_marg, idx, corners)

        if not self.normalized:
            sy = sy * fetch_marg(jnp.full_like(sx, n_marg - 1,
                                               dtype=jnp.int32)
                                 .astype(jnp.int32))

        row = _first_ge(fetch_marg, n_marg, sy)
        sy = sy - jnp.where(row > 0, fetch_marg(jnp.maximum(row - 1, 0)),
                            0.0)

        base_cond = row * (W - 1)
        # integrated density of rows `row` and `row+1` (x == 1 entries)
        r0 = self._lookup(cond, n_cond, base_cond + (W - 2), corners)
        r1 = self._lookup(cond, n_cond, base_cond + (W - 1) + (W - 2),
                          corners)
        sy = _sample_segment(sy, float(H - 1), r0, r1)
        sx = sx * (r0 + (r1 - r0) * sy)

        def fetch_cond(idx):
            v0 = self._lookup(cond, n_cond, base_cond + idx, corners)
            v1 = self._lookup(cond, n_cond, base_cond + (W - 1) + idx,
                              corners)
            return v0 + (v1 - v0) * sy

        col = _first_ge(fetch_cond, W - 1, sx)
        sx = sx - jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)),
                            0.0)

        base_d = row * W + col
        v00 = self._lookup(dat, n_data, base_d, corners)
        v10 = self._lookup(dat, n_data, base_d + 1, corners)
        v01 = self._lookup(dat, n_data, base_d + W, corners)
        v11 = self._lookup(dat, n_data, base_d + W + 1, corners)
        c0 = v00 + (v01 - v00) * sy
        c1 = v10 + (v11 - v10) * sy
        sx = _sample_segment(sx, float(W - 1), c0, c1)
        pdf = c0 + (c1 - c0) * sx

        pos = jnp.stack([(col.astype(jnp.float32) + sx) / (W - 1),
                         (row.astype(jnp.float32) + sy) / (H - 1)],
                        axis=-1)
        return pos, pdf

    def invert(self, pos, params=()):
        """Inverse of sample() — invert_continuous (distr_2d.h:1351)."""
        S, H, W = self._shapes()
        n_marg, n_cond, n_data = H - 1, H * (W - 1), H * W
        marg = self.marg_cdf.reshape(-1)
        cond = self.cond_cdf.reshape(-1)
        dat = self.data.reshape(-1)
        slice_off, pw = self._param_weights(tuple(params))
        corners = self._corners(slice_off, pw)

        px = jnp.clip(pos[..., 0], 0.0, 1.0) * (W - 1)
        py = jnp.clip(pos[..., 1], 0.0, 1.0) * (H - 1)
        col = jnp.minimum(px.astype(jnp.int32), W - 2)
        row = jnp.minimum(py.astype(jnp.int32), H - 2)
        fx = px - col
        fy = py - row

        base_d = row * W + col
        v00 = self._lookup(dat, n_data, base_d, corners)
        v10 = self._lookup(dat, n_data, base_d + 1, corners)
        v01 = self._lookup(dat, n_data, base_d + W, corners)
        v11 = self._lookup(dat, n_data, base_d + W + 1, corners)
        c0 = v00 + (v01 - v00) * fy
        c1 = v10 + (v11 - v10) * fy
        pdf = c0 + (c1 - c0) * fx

        sx = _invert_segment(fx, 1.0 / (W - 1), c0, c1)
        base_cond = row * (W - 1)

        def fetch_cond(idx):
            v0 = self._lookup(cond, n_cond, base_cond + idx, corners)
            v1 = self._lookup(cond, n_cond, base_cond + (W - 1) + idx,
                              corners)
            return v0 + (v1 - v0) * fy

        sx = sx + jnp.where(col > 0, fetch_cond(jnp.maximum(col - 1, 0)),
                            0.0)
        r0 = self._lookup(cond, n_cond, base_cond + (W - 2), corners)
        r1 = self._lookup(cond, n_cond, base_cond + (W - 1) + (W - 2),
                          corners)
        sx = sx / jnp.maximum(r0 + (r1 - r0) * fy, 1e-30)
        sy = _invert_segment(fy, 1.0 / (H - 1), r0, r1)
        sy = sy + jnp.where(
            row > 0,
            self._lookup(marg, n_marg, jnp.maximum(row - 1, 0), corners),
            0.0)
        if not self.normalized:
            sy = sy / jnp.maximum(
                self._lookup(marg, n_marg,
                             jnp.full_like(row, n_marg - 1), corners),
                1e-30)
        return jnp.stack([sx, sy], axis=-1), pdf

    def eval(self, pos, params=()):
        """Bilinear density at pos (distr_2d.h:1024 Marginal2D::eval)."""
        S, H, W = self._shapes()
        n_data = H * W
        dat = self.data.reshape(-1)
        slice_off, pw = self._param_weights(tuple(params))
        corners = self._corners(slice_off, pw)
        px = jnp.clip(pos[..., 0], 0.0, 1.0) * (W - 1)
        py = jnp.clip(pos[..., 1], 0.0, 1.0) * (H - 1)
        col = jnp.minimum(px.astype(jnp.int32), W - 2)
        row = jnp.minimum(py.astype(jnp.int32), H - 2)
        fx = px - col
        fy = py - row
        base_d = row * W + col
        v00 = self._lookup(dat, n_data, base_d, corners)
        v10 = self._lookup(dat, n_data, base_d + 1, corners)
        v01 = self._lookup(dat, n_data, base_d + W, corners)
        v11 = self._lookup(dat, n_data, base_d + W + 1, corners)
        return ((v00 * (1 - fx) + v10 * fx) * (1 - fy)
                + (v01 * (1 - fx) + v11 * fx) * fy)


def _first_ge(fetch, n, value):
    """Per-lane first index in [0, n-1] whose fetched CDF >= value
    (drjit binary_search semantics)."""
    lo = jnp.zeros(value.shape, jnp.int32)
    hi = jnp.full(value.shape, n - 1, jnp.int32)
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1
    for _ in range(steps):
        mid = (lo + hi) >> 1
        less = fetch(mid) < value
        lo = jnp.where(less, jnp.minimum(mid + 1, n - 1), lo)
        hi = jnp.where(less, hi, mid)
    return lo

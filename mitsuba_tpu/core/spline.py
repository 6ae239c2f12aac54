"""Cubic Catmull-Rom spline evaluation / integration / sampling.

Reference: include/mitsuba/core/spline.h — `eval_spline`,
`eval_spline_d`, `eval_spline_weights`, `eval_1d`, `integrate_1d`,
`sample_1d` over uniformly spaced nodes.  Used by irregular spectra and
tabulated phase functions.

TPU design: arrays of node values, static node count; lookups are a
gather + cubic Hermite blend — fully vectorized, no data-dependent
control flow.
"""
from __future__ import annotations

import jax.numpy as jnp


def eval_spline(f0, f1, d0, d1, t):
    """Cubic Hermite on [0,1] given endpoint values/derivatives
    (spline.h eval_spline)."""
    t2 = t * t
    t3 = t2 * t
    return ((2.0 * t3 - 3.0 * t2 + 1.0) * f0
            + (-2.0 * t3 + 3.0 * t2) * f1
            + (t3 - 2.0 * t2 + t) * d0
            + (t3 - t2) * d1)


def eval_spline_d(f0, f1, d0, d1, t):
    """Derivative of eval_spline w.r.t. t."""
    t2 = t * t
    return ((6.0 * t2 - 6.0 * t) * f0
            + (-6.0 * t2 + 6.0 * t) * f1
            + (3.0 * t2 - 4.0 * t + 1.0) * d0
            + (3.0 * t2 - 2.0 * t) * d1)


def _node_derivs(values):
    """Catmull-Rom endpoint derivatives per cell (uniform spacing)."""
    n = values.shape[-1]
    d = jnp.zeros_like(values)
    d = d.at[..., 1:-1].set(0.5 * (values[..., 2:] - values[..., :-2]))
    d = d.at[..., 0].set(values[..., 1] - values[..., 0])
    d = d.at[..., -1].set(values[..., -1] - values[..., -2])
    return d


def eval_1d(x_min, x_max, values, x):
    """Evaluate the Catmull-Rom interpolant of uniformly spaced ``values``
    over [x_min, x_max] at ``x`` (spline.h eval_1d); clamps outside."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    t = (x - x_min) / (x_max - x_min) * (n - 1)
    i = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    f = jnp.clip(t - i, 0.0, 1.0)
    d = _node_derivs(values)
    return eval_spline(values[i], values[i + 1], d[i], d[i + 1], f)


def integrate_1d(x_min, x_max, values):
    """Per-cell running integral (spline.h integrate_1d): returns (N-1,)
    cumulative integral up to each cell's right edge."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    h = (x_max - x_min) / (n - 1)
    d = _node_derivs(values)
    # closed-form integral of the Hermite cell
    cell = h * (0.5 * (values[:-1] + values[1:])
                + (d[:-1] - d[1:]) / 12.0)
    return jnp.cumsum(cell)


def sample_1d(x_min, x_max, values, u):
    """Importance-sample x ~ values (treated as an unnormalized density)
    via the cell CDF + a Newton step inside the cell (spline.h
    sample_1d, simplified to one refinement)."""
    values = jnp.asarray(values)
    n = values.shape[-1]
    cdf = integrate_1d(x_min, x_max, values)
    total = cdf[-1]
    target = u * total
    cell = jnp.sum((cdf[None, :-1] <= target[:, None]).astype(jnp.int32),
                   axis=-1)
    cell = jnp.clip(cell, 0, n - 2)
    lo = jnp.where(cell > 0, cdf[jnp.maximum(cell - 1, 0)], 0.0)
    h = (x_max - x_min) / (n - 1)
    d = _node_derivs(values)
    f0, f1 = values[cell], values[cell + 1]
    d0, d1 = d[cell], d[cell + 1]
    # linear init inside the cell + Newton refinements on the Hermite
    seg = jnp.maximum(cdf[cell] - lo, 1e-20)
    t = jnp.clip((target - lo) / seg, 0.0, 1.0)

    def _cell_cdf(t):
        t2, t3, t4 = t * t, t ** 3, t ** 4
        return h * ((0.5 * t4 - t3 + t) * f0 + (-0.5 * t4 + t3) * f1
                    + (0.25 * t4 - (2.0 / 3.0) * t3 + 0.5 * t2) * d0
                    + (0.25 * t4 - t3 / 3.0) * d1)

    for _ in range(3):
        pdf_t = jnp.maximum(eval_spline(f0, f1, d0, d1, t), 1e-12)
        t = jnp.clip(t - (_cell_cdf(t) - (target - lo)) / (h * pdf_t),
                     0.0, 1.0)
    x = x_min + (cell + t) * h
    pdf = eval_spline(f0, f1, d0, d1, t) / jnp.maximum(total, 1e-20)
    return x, pdf

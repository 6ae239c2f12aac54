"""Chi-square goodness-of-fit harness for sampling routines.

TPU-native equivalent of the reference's statistical test framework
(src/python/python/chi2.py:5 — ChiSquareTest + domains + adapters): histogram
a sampling routine over a domain grid, numerically integrate the claimed pdf
over each cell, and run a chi^2 test (with cell pooling for low expected
counts, per the usual validity rule).

Used by tests for warps, BSDF sampling, emitter sampling.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import rng


class PlanarDomain:
    """Rectangle [xmin,xmax] x [ymin,ymax]; identity parameterization."""

    def __init__(self, bounds=((-1.0, 1.0), (-1.0, 1.0))):
        self.bounds = np.asarray(bounds, np.float64)

    def map_forward(self, p):
        return p

    def extents(self):
        return self.bounds

    def cell_area(self, res):
        (x0, x1), (y0, y1) = self.bounds
        return (x1 - x0) * (y1 - y0) / (res[0] * res[1])

    def jacobian(self, grid_pts):
        return np.ones(grid_pts.shape[:-1])


class SphericalDomain:
    """Unit directions parameterized by (phi in [-pi,pi], cos_theta in [-1,1]).

    This parameterization has constant Jacobian, so cell probabilities are
    simple means of pdf over the cell (pdf measured per solid angle).
    """

    def map_forward(self, d):
        d = np.asarray(d, np.float64)
        phi = np.arctan2(d[..., 1], d[..., 0])
        cos_theta = np.clip(d[..., 2], -1.0, 1.0)
        return np.stack([phi, cos_theta], axis=-1)

    def extents(self):
        return np.array([[-np.pi, np.pi], [-1.0, 1.0]])

    def cell_area(self, res):
        return 4.0 * np.pi / (res[0] * res[1])

    def map_back(self, u):
        """(phi, cos_theta) -> direction, for pdf integration."""
        phi, ct = u[..., 0], u[..., 1]
        st = np.sqrt(np.maximum(1.0 - ct * ct, 0.0))
        return np.stack([st * np.cos(phi), st * np.sin(phi), ct], axis=-1)


def chi2_test(
    sample_fn,
    pdf_fn,
    domain,
    sample_count: int = 200_000,
    res=(64, 32),
    ires: int = 6,
    significance: float = 0.01,
    seed: int = 0,
):
    """Run a chi^2 test.

    sample_fn(n, seed) -> samples in the target space (directions or points)
    pdf_fn(x) -> density w.r.t. the domain's natural measure
    Returns (passed: bool, message: str).
    """
    ext = domain.extents()
    rx, ry = res

    # --- Observed histogram -------------------------------------------------
    samples = np.asarray(sample_fn(sample_count, seed), np.float64)
    u = domain.map_forward(samples)
    ix = np.floor((u[..., 0] - ext[0, 0]) / (ext[0, 1] - ext[0, 0]) * rx)
    iy = np.floor((u[..., 1] - ext[1, 0]) / (ext[1, 1] - ext[1, 0]) * ry)
    valid = (ix >= 0) & (ix < rx) & (iy >= 0) & (iy < ry)
    ix = np.clip(ix.astype(np.int64), 0, rx - 1)
    iy = np.clip(iy.astype(np.int64), 0, ry - 1)
    hist = np.bincount(
        (iy * rx + ix)[valid], minlength=rx * ry
    ).astype(np.float64)

    # --- Expected counts: integrate pdf over each cell by midpoint rule -----
    sub = ires
    gx = (np.arange(rx * sub) + 0.5) / (rx * sub)
    gy = (np.arange(ry * sub) + 0.5) / (ry * sub)
    px = ext[0, 0] + gx * (ext[0, 1] - ext[0, 0])
    py = ext[1, 0] + gy * (ext[1, 1] - ext[1, 0])
    PX, PY = np.meshgrid(px, py, indexing="xy")  # (ry*sub, rx*sub)
    grid = np.stack([PX, PY], axis=-1)
    if hasattr(domain, "map_back"):
        pts = domain.map_back(grid)
    else:
        pts = grid
    pdf_vals = np.asarray(pdf_fn(jnp.asarray(pts, jnp.float32)), np.float64)
    # average over sub-cells -> (ry, rx)
    pdf_cell = pdf_vals.reshape(ry, sub, rx, sub).mean(axis=(1, 3))
    cell_area = domain.cell_area(res)
    expected = (pdf_cell * cell_area * sample_count).reshape(-1)

    total_exp = expected.sum()
    if not (0.8 * sample_count <= total_exp <= 1.2 * sample_count):
        return False, (
            f"pdf does not integrate to ~1: integral = "
            f"{total_exp / sample_count:.4f}"
        )

    # --- Pool cells with low expected counts, then chi^2 --------------------
    order = np.argsort(expected)
    hist_s, exp_s = hist[order], expected[order]
    chi2_stat, dof = 0.0, 0
    pool_h = pool_e = 0.0
    for h, e in zip(hist_s, exp_s):
        pool_h += h
        pool_e += e
        if pool_e >= 5.0:
            chi2_stat += (pool_h - pool_e) ** 2 / pool_e
            dof += 1
            pool_h = pool_e = 0.0
    if pool_e > 0:
        chi2_stat += (pool_h - pool_e) ** 2 / max(pool_e, 1e-9)
        dof += 1
    dof -= 1
    if dof <= 0:
        return False, "degenerate test (dof <= 0)"

    # p-value via Wilson-Hilferty approximation of the chi^2 CDF
    z = ((chi2_stat / dof) ** (1.0 / 3.0) - (1.0 - 2.0 / (9.0 * dof))) / np.sqrt(
        2.0 / (9.0 * dof)
    )
    from math import erfc

    p = 0.5 * erfc(z / np.sqrt(2.0))
    passed = p >= significance
    return passed, f"chi2={chi2_stat:.1f} dof={dof} p={p:.4f}"


def uniform_samples_2d(n, seed):
    """Helper: n stateless uniform 2D samples as a jnp array."""
    lanes = jnp.arange(n, dtype=jnp.uint32)
    return rng.sample_2d(jnp.uint32(seed), lanes, jnp.uint32(0))

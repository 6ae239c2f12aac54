"""Film: reconstruction filters, ImageBlock splatting, develop.

Reference: src/render/imageblock.cpp (778 LoC — ``ImageBlock::put`` splats
weighted samples through a reconstruction filter with atomic
``scatter_reduce``), src/films/hdrfilm.cpp (``develop`` at hdrfilm.cpp:304 =
weight-channel division), and the rfilter plugins src/rfilters/{box,tent,
gaussian,mitchell,catmullrom,lanczos}.cpp.

TPU design: no atomics exist, so splatting is a deterministic XLA
``scatter-add`` (``image.at[idx].add``) over a flat (H*W, C+1) buffer — one
weight channel appended, exactly like the reference's ImageBlock.  The
filter footprint is a *static* K x K tap grid (K = ceil(2*radius)), so the
scatter has fixed shape and no data-dependent control flow.  Under
shard_map each chip splats into its own partial image and the partials are
``psum``-reduced (parallel/: replaces the reference's atomic accumulation).

The adjoint of ``splat`` under jax.grad is a gather — which is exactly the
reference's differentiable ``ImageBlock::read`` used for adjoint splatting
in PRB (src/python/python/ad/integrators/common.py:702-758); we get it for
free from XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static


@pytree
class ReconstructionFilter:
    """Radially-evaluated separable reconstruction filter.

    kind: 'box' | 'tent' | 'gaussian' (gaussian matches the reference's
    default: truncated gaussian with stddev 0.5, radius 4*stddev = 2).
    """

    kind: str = static("gaussian")
    radius: float = static(2.0)
    stddev: float = static(0.5)
    b: float = static(1.0 / 3.0)   # mitchell B
    c: float = static(1.0 / 3.0)   # mitchell C
    lobes: int = static(3)         # lanczos tau

    @staticmethod
    def box():
        return ReconstructionFilter(kind="box", radius=0.5)

    @staticmethod
    def tent():
        return ReconstructionFilter(kind="tent", radius=1.0)

    @staticmethod
    def gaussian(stddev: float = 0.5):
        return ReconstructionFilter(
            kind="gaussian", radius=4.0 * stddev, stddev=stddev
        )

    @staticmethod
    def mitchell(b: float = 1.0 / 3.0, c: float = 1.0 / 3.0):
        """Mitchell-Netravali (src/rfilters/mitchell.cpp)."""
        return ReconstructionFilter(kind="mitchell", radius=2.0, b=b, c=c)

    @staticmethod
    def catmullrom():
        """Catmull-Rom = Mitchell with B=0, C=0.5 (catmullrom.cpp)."""
        return ReconstructionFilter(kind="mitchell", radius=2.0, b=0.0, c=0.5)

    @staticmethod
    def lanczos(lobes: int = 3):
        """Lanczos-windowed sinc (src/rfilters/lanczos.cpp)."""
        return ReconstructionFilter(kind="lanczos", radius=float(lobes),
                                    lobes=lobes)

    @property
    def n_taps(self) -> int:
        """Static per-axis tap count covering the support."""
        import math

        return max(1, int(math.ceil(2.0 * self.radius)))

    def eval_1d(self, x):
        """Filter value at (signed) offset x from the sample position."""
        ax = jnp.abs(x)
        if self.kind == "box":
            # <= so that the single tap at |x| = 0.5 boundary still counts
            return jnp.where(ax <= self.radius, 1.0, 0.0)
        if self.kind == "tent":
            return jnp.maximum(0.0, 1.0 - ax / self.radius)
        if self.kind == "gaussian":
            alpha = -1.0 / (2.0 * self.stddev**2)
            val = jnp.exp(alpha * ax * ax) - jnp.exp(
                alpha * self.radius * self.radius
            )
            return jnp.maximum(0.0, val)
        if self.kind == "mitchell":
            b, c = self.b, self.c
            x2 = ax * ax
            x3 = x2 * ax
            inner = (
                (12.0 - 9.0 * b - 6.0 * c) * x3
                + (-18.0 + 12.0 * b + 6.0 * c) * x2
                + (6.0 - 2.0 * b)
            ) * (1.0 / 6.0)
            outer = (
                (-b - 6.0 * c) * x3 + (6.0 * b + 30.0 * c) * x2
                + (-12.0 * b - 48.0 * c) * ax + (8.0 * b + 24.0 * c)
            ) * (1.0 / 6.0)
            val = jnp.where(ax < 1.0, inner, jnp.where(ax < 2.0, outer, 0.0))
            return val
        if self.kind == "lanczos":
            t = self.lobes

            def sinc(y):  # y >= 0 here
                return jnp.where(
                    y < 1e-6, 1.0,
                    jnp.sin(jnp.pi * y) / jnp.maximum(jnp.pi * y, 1e-12),
                )

            return jnp.where(ax < t, sinc(ax) * sinc(ax / t), 0.0)
        raise ValueError(f"unknown rfilter kind {self.kind!r}")


def splat(pos, values, height: int, width: int, rfilter: ReconstructionFilter,
          active=None, normalize: bool = False):
    """Splat per-lane sample ``values`` at continuous film positions.

    pos: (N, 2) in pixel units — x in [0, W), y in [0, H), pixel centers at
    integer + 0.5.  values: (N, C).  Returns (H, W, C+1): C data channels +
    the accumulated filter-weight channel (imageblock.cpp put()).

    ``normalize``: divide each sample's tap weights by their sum
    (ImageBlock normalize mode — used by adjoint/particle tracing where
    develop() does NOT divide by the weight channel, integrator.cpp:609).
    """
    n, c = values.shape
    sample_w = jnp.ones((n, 1), values.dtype)
    if active is not None:
        values = jnp.where(active[:, None], values, 0.0)
        sample_w = jnp.where(active[:, None], sample_w, 0.0)
    # sanitize positions: inactive lanes may carry inf/NaN film positions
    # (e.g. failed sensor connections); NaN*0 would poison the scatter-add
    bound = float(max(width, height)) + rfilter.radius + 2.0
    pos = jnp.clip(jnp.nan_to_num(pos, nan=-bound, posinf=bound,
                                  neginf=-bound), -bound, bound)
    k = rfilter.n_taps
    # First pixel whose center (i + 0.5) may lie within the filter radius.
    lo_x = jnp.ceil(pos[:, 0] - rfilter.radius - 0.5).astype(jnp.int32)
    lo_y = jnp.ceil(pos[:, 1] - rfilter.radius - 0.5).astype(jnp.int32)

    # Static K-tap separable weights per axis.
    offs = jnp.arange(k, dtype=jnp.int32)
    xs = lo_x[:, None] + offs[None, :]                    # (N, K)
    ys = lo_y[:, None] + offs[None, :]
    wx = rfilter.eval_1d(xs.astype(jnp.float32) + 0.5 - pos[:, 0:1])
    wy = rfilter.eval_1d(ys.astype(jnp.float32) + 0.5 - pos[:, 1:2])
    in_x = (xs >= 0) & (xs < width)
    in_y = (ys >= 0) & (ys < height)
    wx = jnp.where(in_x, wx, 0.0)
    wy = jnp.where(in_y, wy, 0.0)

    # (N, K, K) weights; flat scatter indices, clipped (weights already 0).
    w = wy[:, :, None] * wx[:, None, :]
    if active is not None:
        w = w * active[:, None, None]
    if normalize:
        total = jnp.sum(w, axis=(1, 2), keepdims=True)
        w = w / jnp.maximum(total, 1e-12)
    idx = (
        jnp.clip(ys, 0, height - 1)[:, :, None] * width
        + jnp.clip(xs, 0, width - 1)[:, None, :]
    ).reshape(n * k * k)

    data = jnp.concatenate([values, sample_w], axis=-1)
    contrib = (w[..., None] * data[:, None, None, :]).reshape(n * k * k, c + 1)

    img = jnp.zeros((height * width, c + 1), values.dtype)
    img = img.at[idx].add(contrib)
    return img.reshape(height, width, c + 1)


def splat_grouped(pos, values, height: int, width: int, spp: int,
                  rfilter: ReconstructionFilter, active=None):
    """Dense scatter-free splat for pixel-grouped wavefronts.

    Requires lanes ordered pixel-major with exactly ``spp`` consecutive
    lanes per pixel and positions inside their own pixel (the layout
    sample_rays produces) — then every sample's KxK filter footprint is a
    STATIC offset grid around its pixel, so the whole splat becomes, per
    tap offset (dx, dy): a per-pixel reduction over spp followed by a
    statically-shifted dense add on a padded canvas.  No scatter, no
    atomics, HBM traffic O(N + taps * H * W) — the fix for the
    splat-dominated profile in PERF.md (imageblock.cpp put() semantics
    preserved exactly; same tap weights as ``splat``).
    """
    n, c = values.shape
    assert n == height * width * spp, "lanes must be pixel-major x spp"
    sample_w = jnp.ones((n, 1), values.dtype)
    data = jnp.concatenate([values, sample_w], axis=-1)
    if active is not None:
        data = jnp.where(active[:, None], data, 0.0)
    pos = jnp.nan_to_num(pos, nan=0.0, posinf=0.0, neginf=0.0)
    rel = pos - jnp.floor(pos)          # in-pixel offset in [0, 1)
    rx, ry = rel[:, 0], rel[:, 1]

    import math

    r = max(1, int(math.ceil(rfilter.radius)))
    canvas = jnp.zeros((height + 2 * r, width + 2 * r, c + 1), values.dtype)
    for dy in range(-r, r + 1):
        wy = rfilter.eval_1d(dy + 0.5 - ry)
        for dx in range(-r, r + 1):
            wx = rfilter.eval_1d(dx + 0.5 - rx)
            tap = ((wy * wx)[:, None] * data).reshape(
                height * width, spp, c + 1).sum(axis=1)
            tap = tap.reshape(height, width, c + 1)
            canvas = canvas.at[
                r + dy:r + dy + height, r + dx:r + dx + width
            ].add(tap)
    return canvas[r:r + height, r:r + width]


def develop(image, eps: float = 1e-12):
    """Weight-division develop (hdrfilm.cpp:304): (H, W, C+1) -> (H, W, C)."""
    w = image[..., -1:]
    return jnp.where(w > eps, image[..., :-1] / jnp.maximum(w, eps), 0.0)


@pytree
class SpectralFilm:
    """Spectral-bin film (src/films/specfilm.cpp): accumulates per-lane
    hero-wavelength radiance into ``n_bins`` uniform wavelength buckets
    instead of RGB channels.  ``put_spectral`` bins each sample by its
    wavelength; ``develop`` divides by the weight channel as usual, so
    the output is an (H, W, n_bins) spectral image."""

    width: int = static(256)
    height: int = static(256)
    n_bins: int = static(16)
    lambda_min: float = static(380.0)
    lambda_max: float = static(780.0)
    rfilter: ReconstructionFilter = static(None)
    id: str = static("specfilm")

    def __post_init__(self):
        if self.rfilter is None:
            object.__setattr__(self, "rfilter",
                               ReconstructionFilter.gaussian())

    @property
    def size(self):
        return (self.width, self.height)

    def put_spectral(self, pos, value, wavelengths, active=None):
        """value: (N,) spectral radiance at each lane's hero wavelength
        (N,) nm.  Returns (H, W, n_bins+1) with the filter-weight channel
        appended."""
        lam = jnp.reshape(wavelengths, (-1,))
        t = (lam - self.lambda_min) / (self.lambda_max - self.lambda_min)
        b = jnp.clip((t * self.n_bins).astype(jnp.int32), 0, self.n_bins - 1)
        onehot = jax.nn.one_hot(b, self.n_bins, dtype=value.dtype)
        data = onehot * value[:, None]
        return splat(pos, data, self.height, self.width, self.rfilter,
                     active)

    def put(self, pos, values, active=None, normalize=False):
        """RGB fallback (integrators that produce RGB radiance): bins are
        filled with the channel-mean — allows specfilm to be used with
        any integrator, spectral ones giving the real distribution."""
        mean = jnp.mean(values, axis=-1)
        data = jnp.broadcast_to(mean[:, None], (mean.shape[0], self.n_bins))
        return splat(pos, data, self.height, self.width, self.rfilter,
                     active, normalize)

    def put_grouped(self, pos, values, spp, active=None):
        return self.put(pos, values, active)

    def develop(self, image):
        return develop(image)

    def bin_wavelengths(self):
        """Bin-center wavelengths (n_bins,) nm."""
        edges = jnp.linspace(self.lambda_min, self.lambda_max,
                             self.n_bins + 1)
        return 0.5 * (edges[:-1] + edges[1:])


@pytree
class Film:
    """hdrfilm equivalent: size + reconstruction filter."""

    width: int = static(256)
    height: int = static(256)
    rfilter: ReconstructionFilter = static(None)

    def __post_init__(self):
        if self.rfilter is None:
            object.__setattr__(self, "rfilter", ReconstructionFilter.gaussian())

    @property
    def size(self):
        return (self.width, self.height)

    def put(self, pos, values, active=None, normalize=False):
        return splat(pos, values, self.height, self.width, self.rfilter,
                     active, normalize)

    def put_grouped(self, pos, values, spp, active=None):
        """Scatter-free ``put`` for pixel-major wavefronts (see
        splat_grouped); falls back to ``put`` on a lane-count mismatch."""
        if values.shape[0] != self.height * self.width * spp:
            return self.put(pos, values, active)
        return splat_grouped(pos, values, self.height, self.width, spp,
                             self.rfilter, active)

    def develop(self, image):
        return develop(image)

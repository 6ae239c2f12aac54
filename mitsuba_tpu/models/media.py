"""Participating media + phase functions.

Reference: include/mitsuba/render/{medium.h,phase.h}, src/media/
{homogeneous.cpp (204), heterogeneous.cpp (226)}, src/phase/
{isotropic.cpp, hg.cpp} and the Medium sampling interface used by
volpath.cpp.

TPU design: a medium is a pytree of differentiable coefficients;
free-flight sampling is analytic for homogeneous media and
majorant-based ratio/delta tracking for grid media (fixed-iteration
loop).  Phase functions mirror the BSDF convention (local frame around
the propagation direction; sample returns (wo_world, pdf)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core.math import Frame, dot, normalize, safe_div
from ..core import warp


# ------------------------------------------------------------------ phase

@pytree
class IsotropicPhase:
    """Uniform sphere phase function (src/phase/isotropic.cpp)."""

    id: str = static("isotropic")

    def sample(self, wi_world, sample2, active):
        wo = warp.square_to_uniform_sphere(sample2)
        pdf = jnp.full(wo.shape[:-1], warp.INV_FOUR_PI)
        return wo, pdf

    def eval(self, wi_world, wo_world, active):
        return jnp.full(wi_world.shape[:-1], warp.INV_FOUR_PI)

    def pdf(self, wi_world, wo_world, active):
        return jnp.full(wi_world.shape[:-1], warp.INV_FOUR_PI)


@pytree
class HGPhase:
    """Henyey-Greenstein (src/phase/hg.cpp); g in (-1, 1) differentiable."""

    g: jnp.ndarray  # ()
    id: str = static("hg")

    def _eval_cos(self, cos_theta):
        """cos_theta measured against the PROPAGATION direction (-wi);
        forward scattering (cos -> +1) is most likely for g > 0
        (hg.cpp with its dot(wi, wo) convention sign-flipped)."""
        g = jnp.clip(self.g, -0.99, 0.99)
        denom = 1.0 + g * g - 2.0 * g * cos_theta
        return warp.INV_FOUR_PI * (1.0 - g * g) / jnp.maximum(
            denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12
        )

    def sample(self, wi_world, sample2, active):
        g = jnp.clip(self.g, -0.99, 0.99)
        sqr_term = (1.0 - g * g) / (1.0 + g - 2.0 * g * sample2[..., 0])
        # cos against the propagation direction: mean == +g
        cos_theta = jnp.where(
            jnp.abs(g) < 1e-4,
            1.0 - 2.0 * sample2[..., 0],
            (1.0 + g * g - sqr_term * sqr_term) / (2.0 * g),
        )
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta**2, 0.0))
        phi = 2.0 * jnp.pi * sample2[..., 1]
        # build around the propagation direction (-wi: wi points backward)
        d_prop = -wi_world
        frame = Frame.from_normal(normalize(d_prop))
        wo_local = jnp.stack(
            [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
            axis=-1,
        )
        wo = Frame.to_world(frame, wo_local)
        pdf = self._eval_cos(cos_theta)
        return wo, pdf

    def eval(self, wi_world, wo_world, active):
        cos_theta = dot(-wi_world, wo_world)
        return self._eval_cos(cos_theta)

    def pdf(self, wi_world, wo_world, active):
        return self.eval(wi_world, wo_world, active)


@pytree
class RayleighPhase:
    """Rayleigh scattering phase function (src/phase/rayleigh.cpp):
    p(cos) = 3/(16 pi) (1 + cos^2), cos against propagation."""

    id: str = static("rayleigh")

    def _eval_cos(self, cos_theta):
        return (3.0 / (16.0 * jnp.pi)) * (1.0 + cos_theta * cos_theta)

    def sample(self, wi_world, sample2, active):
        # invert the CDF of (1 + cos^2): cos = u - 1/u with
        # u = cbrt(2z + sqrt(4z^2+1)), z = 2(2 s - 1) (rayleigh.cpp)
        z = 2.0 * (2.0 * sample2[..., 0] - 1.0)
        u = jnp.cbrt(2.0 * z + jnp.sqrt(4.0 * z * z + 1.0))
        cos_theta = jnp.clip(u - 1.0 / u, -1.0, 1.0)
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0))
        phi = 2.0 * jnp.pi * sample2[..., 1]
        frame = Frame.from_normal(normalize(-wi_world))
        wo_local = jnp.stack(
            [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
            axis=-1)
        wo = Frame.to_world(frame, wo_local)
        return wo, self._eval_cos(cos_theta)

    def eval(self, wi_world, wo_world, active):
        return self._eval_cos(dot(-wi_world, wo_world))

    def pdf(self, wi_world, wo_world, active):
        return self.eval(wi_world, wo_world, active)


@pytree
class BlendPhase:
    """Convex combination of two phase functions
    (src/phase/blendphase.cpp): weight selects phase2's share."""

    phase1: object
    phase2: object
    weight: jnp.ndarray  # () in [0, 1]
    id: str = static("blendphase")

    def sample(self, wi_world, sample2, active):
        # stochastic component selection on sample2.x, reused rescaled
        w = jnp.clip(self.weight, 0.0, 1.0)
        pick2 = sample2[..., 0] < w
        u = jnp.where(
            pick2,
            sample2[..., 0] / jnp.maximum(w, 1e-9),
            (sample2[..., 0] - w) / jnp.maximum(1.0 - w, 1e-9),
        )
        s2 = jnp.stack([u, sample2[..., 1]], axis=-1)
        wo1, _ = self.phase1.sample(wi_world, s2, active)
        wo2, _ = self.phase2.sample(wi_world, s2, active)
        wo = jnp.where(pick2[..., None], wo2, wo1)
        return wo, self.pdf(wi_world, wo, active)

    def eval(self, wi_world, wo_world, active):
        w = jnp.clip(self.weight, 0.0, 1.0)
        return ((1.0 - w) * self.phase1.eval(wi_world, wo_world, active)
                + w * self.phase2.eval(wi_world, wo_world, active))

    def pdf(self, wi_world, wo_world, active):
        w = jnp.clip(self.weight, 0.0, 1.0)
        return ((1.0 - w) * self.phase1.pdf(wi_world, wo_world, active)
                + w * self.phase2.pdf(wi_world, wo_world, active))


@pytree
class TabulatedPhase:
    """Tabulated phase over cos(theta) (src/phase/tabphase.cpp): values
    on a uniform cos grid in [-1, 1], normalized internally; sampled via
    the Catmull-Rom spline CDF (core/spline.py)."""

    values: jnp.ndarray  # (N,) nonnegative, cos grid from -1 to 1
    id: str = static("tabphase")

    def _norm(self):
        from ..core import spline

        integral = spline.integrate_1d(-1.0, 1.0, self.values)[-1]
        return 1.0 / jnp.maximum(2.0 * jnp.pi * integral, 1e-12)

    def _eval_cos(self, cos_theta):
        from ..core import spline

        v = jnp.maximum(
            spline.eval_1d(-1.0, 1.0, self.values, cos_theta), 0.0)
        return v * self._norm()

    def sample(self, wi_world, sample2, active):
        from ..core import spline

        cos_theta, _ = spline.sample_1d(-1.0, 1.0, self.values,
                                        sample2[..., 0])
        sin_theta = jnp.sqrt(jnp.maximum(1.0 - cos_theta ** 2, 0.0))
        phi = 2.0 * jnp.pi * sample2[..., 1]
        frame = Frame.from_normal(normalize(-wi_world))
        wo_local = jnp.stack(
            [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta],
            axis=-1)
        wo = Frame.to_world(frame, wo_local)
        return wo, self._eval_cos(cos_theta)

    def eval(self, wi_world, wo_world, active):
        return self._eval_cos(dot(-wi_world, wo_world))

    def pdf(self, wi_world, wo_world, active):
        return self.eval(wi_world, wo_world, active)


def _sggx_mat(s):
    """[S_xx, S_yy, S_zz, S_xy, S_xz, S_yz] (…, 6) -> (…, 3, 3)."""
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    return jnp.stack([
        jnp.stack([xx, xy, xz], -1),
        jnp.stack([xy, yy, yz], -1),
        jnp.stack([xz, yz, zz], -1)], -2)


def _sggx_ndf(wm, s):
    """SGGX NDF D(wm) = |S|^{3/2} / (pi (wm^T adj(S) wm)^2)
    (microflake.h sggx_pdf)."""
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    x, y, z = wm[..., 0], wm[..., 1], wm[..., 2]
    det = jnp.abs(xx * yy * zz - xx * yz * yz - yy * xz * xz
                  - zz * xy * xy + 2.0 * xy * xz * yz)
    den = (x * x * (yy * zz - yz * yz) + y * y * (xx * zz - xz * xz)
           + z * z * (xx * yy - xy * xy)
           + 2.0 * (x * y * (xz * yz - zz * xy)
                    + x * z * (xy * yz - yy * xz)
                    + y * z * (xy * xz - xx * yz)))
    return jnp.maximum(det, 0.0) * jnp.sqrt(jnp.maximum(det, 0.0)) / (
        jnp.pi * jnp.maximum(den * den, 1e-20))


def _sggx_sigma(wi, s):
    """Projected microflake area sqrt(wi^T S wi) (microflake.h)."""
    xx, yy, zz, xy, xz, yz = (s[..., i] for i in range(6))
    x, y, z = wi[..., 0], wi[..., 1], wi[..., 2]
    s2 = (x * x * xx + y * y * yy + z * z * zz
          + 2.0 * (x * y * xy + x * z * xz + y * z * yz))
    return jnp.sqrt(jnp.maximum(s2, 1e-20))


@pytree
class SGGXPhase:
    """SGGX microflake phase function (src/phase/sggx.cpp; Heitz et
    al. 2015).  ``S`` holds [S_xx, S_yy, S_zz, S_xy, S_xz, S_yz] of
    the symmetric positive-definite flake matrix.  Specular flakes:
    eval == pdf == D_visible(w_h)/4 with w_h the half-vector of the
    mirror reflection off a visible-NDF-sampled normal."""

    S: jnp.ndarray  # (6,) microflake matrix parameters
    id: str = static("sggx")

    def _vals(self, wi):
        return jnp.broadcast_to(self.S, wi.shape[:-1] + (6,))

    def sample(self, wi_world, sample2, active):
        wi = wi_world
        s = self._vals(wi)
        fs, ft, fn = Frame.from_normal(wi)
        # S expressed in the wi-aligned frame (microflake.h sggx_sample)
        Sm = _sggx_mat(s)
        e = jnp.stack([fs, ft, fn], -2)                    # rows = s,t,n
        s2 = jnp.einsum("...ab,...bc,...dc->...ad", e, Sm, e)
        inv_sqrt_ii = 1.0 / jnp.sqrt(jnp.maximum(s2[..., 2, 2], 1e-20))
        tmp = jnp.sqrt(jnp.maximum(
            s2[..., 1, 1] * s2[..., 2, 2] - s2[..., 1, 2] ** 2, 1e-20))
        det = jnp.abs(jnp.linalg.det(s2))
        m_k = jnp.stack([jnp.sqrt(det) / tmp,
                         jnp.zeros_like(tmp), jnp.zeros_like(tmp)], -1)
        m_j = jnp.stack([
            -inv_sqrt_ii * (s2[..., 0, 2] * s2[..., 1, 2]
                            - s2[..., 0, 1] * s2[..., 2, 2]) / tmp,
            inv_sqrt_ii * tmp, jnp.zeros_like(tmp)], -1)
        m_i = inv_sqrt_ii[..., None] * jnp.stack(
            [s2[..., 0, 2], s2[..., 1, 2], s2[..., 2, 2]], -1)
        uvw = warp.square_to_cosine_hemisphere(sample2)
        nl = (uvw[..., 0:1] * m_k + uvw[..., 1:2] * m_j
              + uvw[..., 2:3] * m_i)
        nl = normalize(nl)
        n_world = Frame.to_world((fs, ft, fn), nl)
        wo = normalize(2.0 * dot(wi, n_world)[..., None] * n_world - wi)
        pdf = 0.25 * _sggx_ndf(n_world, s) / _sggx_sigma(wi, s)
        return wo, pdf

    def eval(self, wi_world, wo_world, active):
        wi = wi_world
        s = self._vals(wi)
        wh = normalize(wi + wo_world)
        return 0.25 * _sggx_ndf(wh, s) / _sggx_sigma(wi, s)

    def pdf(self, wi_world, wo_world, active):
        return self.eval(wi_world, wo_world, active)

    def projected_area(self, wi_world):
        return _sggx_sigma(wi_world, self._vals(wi_world))


# ------------------------------------------------------------------ media

@pytree
class HomogeneousMedium:
    """Constant sigma_t/albedo medium (src/media/homogeneous.cpp:204).

    Free flight sampled by channel selection (volpath's spectral MIS
    collapses to uniform channel choice in RGB mode)."""

    sigma_t: jnp.ndarray   # (3,) extinction
    albedo: jnp.ndarray    # (3,) single-scattering albedo
    phase: object = None   # phase function (defaults to isotropic)
    id: str = static("homogeneous")

    def __post_init__(self):
        if self.phase is None:
            object.__setattr__(self, "phase", IsotropicPhase())

    def sigma_s(self):
        return self.sigma_t * self.albedo

    def transmittance(self, dist, active=None):
        """Beer-Lambert over distance(s) (N,) -> (N, 3)."""
        tr = jnp.exp(-self.sigma_t[None, :] * dist[:, None])
        if active is not None:
            tr = jnp.where(active[:, None], tr, 1.0)
        return tr

    def sample_interaction(self, dist_max, sample1, sample2, active):
        """Sample a free-flight distance against a uniformly chosen RGB
        channel (homogeneous.cpp sample_interaction).

        Returns (t, is_medium, weight) where weight folds transmittance /
        pdf for both outcomes:
          medium event:  weight = Tr * sigma_s / pdf_t
          surface event: weight = Tr / P(t >= dist_max)
        """
        n = dist_max.shape[0]
        channel = jnp.clip((sample1 * 3).astype(jnp.int32), 0, 2)
        sig_c = self.sigma_t[channel]
        t = -jnp.log(jnp.maximum(1.0 - sample2, 1e-20)) / jnp.maximum(
            sig_c, 1e-20
        )
        is_medium = active & (t < dist_max)
        t_clamped = jnp.minimum(t, dist_max)
        tr = self.transmittance(t_clamped)
        # channel-averaged pdfs (MIS over the channel choice)
        pdf_t = jnp.mean(self.sigma_t[None, :] * tr, axis=-1)      # density
        pdf_surf = jnp.mean(tr, axis=-1)                           # survival
        w_medium = safe_div(tr * self.sigma_s()[None, :],
                            jnp.maximum(pdf_t, 1e-20)[:, None])
        w_surface = safe_div(tr, jnp.maximum(pdf_surf, 1e-20)[:, None])
        weight = jnp.where(is_medium[:, None], w_medium, w_surface)
        weight = jnp.where(active[:, None], weight, 1.0)
        return t_clamped, is_medium, weight

    def interaction_weight(self, t, is_medium, active):
        """Attached re-evaluation of sample_interaction's weight at a
        DETACHED free-flight event (the PRB medium term,
        prbvolpath.py: transmittance x sigma_s differentiable, sampling
        pdf detached).  ``t`` is the clamped distance the detached replay
        sampled; gradients flow through Tr and sigma_s only."""
        tr = self.transmittance(t)
        pdf_t = jax.lax.stop_gradient(
            jnp.mean(self.sigma_t[None, :] * tr, axis=-1))
        pdf_surf = jax.lax.stop_gradient(jnp.mean(tr, axis=-1))
        w_medium = safe_div(tr * self.sigma_s()[None, :],
                            jnp.maximum(pdf_t, 1e-20)[:, None])
        w_surface = safe_div(tr, jnp.maximum(pdf_surf, 1e-20)[:, None])
        weight = jnp.where(is_medium[:, None], w_medium, w_surface)
        return jnp.where(active[:, None], weight, 1.0)


@pytree
class GridMedium:
    """Heterogeneous density grid (src/media/heterogeneous.cpp:226 +
    src/volumes/grid.cpp): sigma_t(x) = scale * density(x) * sigma_t_base,
    with delta tracking against the grid's majorant.

    ``bbox_min/bbox_max`` place the grid in world space; trilinear density
    lookups; fixed-iteration tracking loop (bias-free for
    n_steps >= ~10 mean free paths)."""

    density: jnp.ndarray     # (D, H, W) differentiable
    sigma_t: jnp.ndarray     # (3,) base extinction
    albedo: jnp.ndarray      # (3,)
    bbox_min: jnp.ndarray    # (3,)
    bbox_max: jnp.ndarray    # (3,)
    scale: jnp.ndarray = None       # ()
    phase: object = None
    max_steps: int = static(64)
    id: str = static("heterogeneous")

    def __post_init__(self):
        if self.phase is None:
            object.__setattr__(self, "phase", IsotropicPhase())
        if self.scale is None:
            object.__setattr__(self, "scale", jnp.asarray(1.0))

    def density_at(self, p):
        """Trilinear density lookup; zero outside the bbox."""
        rel = (p - self.bbox_min) / (self.bbox_max - self.bbox_min)
        inside = jnp.all((rel >= 0.0) & (rel <= 1.0), axis=-1)
        d, h, w = self.density.shape
        x = jnp.clip(rel[..., 0] * (w - 1), 0, w - 1)
        y = jnp.clip(rel[..., 1] * (h - 1), 0, h - 1)
        z = jnp.clip(rel[..., 2] * (d - 1), 0, d - 1)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        z0 = jnp.floor(z).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, w - 1)
        y1 = jnp.minimum(y0 + 1, h - 1)
        z1 = jnp.minimum(z0 + 1, d - 1)
        fx, fy, fz = x - x0, y - y0, z - z0
        g = self.density
        c00 = g[z0, y0, x0] * (1 - fx) + g[z0, y0, x1] * fx
        c01 = g[z0, y1, x0] * (1 - fx) + g[z0, y1, x1] * fx
        c10 = g[z1, y0, x0] * (1 - fx) + g[z1, y0, x1] * fx
        c11 = g[z1, y1, x0] * (1 - fx) + g[z1, y1, x1] * fx
        c0 = c00 * (1 - fy) + c01 * fy
        c1 = c10 * (1 - fy) + c11 * fy
        val = c0 * (1 - fz) + c1 * fz
        return jnp.where(inside, val * self.scale, 0.0)

    def majorant(self):
        return jnp.max(self.density) * self.scale * jnp.max(self.sigma_t)

    def sigma_s(self):
        return self.sigma_t * self.albedo

    def transmittance_rt(self, o, d, dist, lane, seed, dim_base, active):
        """Ratio-tracking transmittance estimator (volpath.cpp analogue).

        Returns an unbiased (N, 3) transmittance estimate."""
        from ..core import rng

        maj = jnp.maximum(self.majorant(), 1e-8)

        def body(i, carry):
            t, tr, alive = carry
            u = rng.sample_1d(seed, lane, dim_base + i)
            t = t - jnp.log(jnp.maximum(1.0 - u, 1e-20)) / maj
            ok = alive & (t < dist)
            p = o + d * t[:, None]
            dens = self.density_at(p)
            sig = dens[:, None] * self.sigma_t[None, :]
            tr = jnp.where(ok[:, None], tr * (1.0 - sig / maj), tr)
            return t, tr, ok

        n = dist.shape[0]
        init = (jnp.zeros((n,)), jnp.ones((n, 3)), active)
        _, tr, _ = jax.lax.fori_loop(0, self.max_steps, body, init)
        return jnp.where(active[:, None], tr, 1.0)

    def sample_interaction_dt(self, o, d, dist_max, lane, seed, dim_base,
                              active):
        """Delta-tracking free-flight sampling.

        Returns (t, is_medium, weight): on a real collision the weight is
        albedo (null collisions keep weight 1); surviving to dist_max is a
        surface event with weight 1 — the standard unbiased scheme."""
        from ..core import rng

        maj = jnp.maximum(self.majorant(), 1e-8)
        n = dist_max.shape[0]

        def body(i, carry):
            t, hit_med, alive = carry
            u1 = rng.sample_1d(seed, lane, dim_base + 2 * i)
            u2 = rng.sample_1d(seed, lane, dim_base + 2 * i + 1)
            t_new = t - jnp.log(jnp.maximum(1.0 - u1, 1e-20)) / maj
            within = alive & (t_new < dist_max)
            p = o + d * t_new[:, None]
            dens = self.density_at(p)
            sig_bar = dens * jnp.mean(self.sigma_t)
            real = within & (u2 < sig_bar / maj)
            hit_med = hit_med | real
            alive = within & ~real
            t = jnp.where(within, t_new, t)
            return t, hit_med, alive

        init = (jnp.zeros((n,)), jnp.zeros((n,), bool), active)
        t, hit_med, _ = jax.lax.fori_loop(0, self.max_steps, body, init)
        t = jnp.where(hit_med, t, dist_max)
        weight = jnp.where(
            hit_med[:, None],
            jnp.broadcast_to(self.albedo, (n, 3)),
            jnp.ones((n, 3)),
        )
        weight = jnp.where(active[:, None], weight, 1.0)
        return t, hit_med & active, weight

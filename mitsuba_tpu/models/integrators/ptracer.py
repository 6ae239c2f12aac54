"""Adjoint particle tracer: light -> sensor transport.

Reference: src/integrators/ptracer.cpp (389 LoC) + AdjointIntegrator
(integrator.h:493, integrator.cpp:540-640).  Paths start on emitters
(scene.sample_emitter_ray), random-walk via BSDF sampling in IMPORTANCE
transport mode, and connect every vertex to the sensor with
sensor.sample_direction, splatting at the returned film UV.  Used by the
[FORK] lens-design workflow for rendering focal spots (design_problem.py:
364 'ptracer' render scene) — collimated sources through delta lens
interfaces can only be rendered this way.

TPU notes:
- the film accumulator is carried through the bounce while_loop and
  scatter-added per connection (no atomics needed — XLA scatter-add);
- importance-mode BSDF sampling reuses the radiance-mode registry and
  removes the radiance-only eta^2 factor by multiplying bs.eta^2
  (dielectric.cpp applies sqr(eta_ti) only when ctx.mode == Radiance);
- the adjoint shading-normal correction (Veach p.155) is applied at
  connection time (ptracer.cpp:330-346);
- develop: image = raw splat * sample_scale, sample_scale = 1/spp
  (integrator.cpp:598; the weight channel is unused, ptracer.cpp:369).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import rng
from ...core.math import Frame, dot
from ...core.pytree import pytree, static
from ...core.records import Ray
from ...core.spectrum import rgb_response_flat, sample_wavelength_visible
from .common import sampler_spec

# dimension layout (disjoint use of the camera-level dims)
DIM_EM_SELECT = 0
DIM_EM_POS = 1
DIM_EM_DIR = 2
DIM_DIRECT_SENSOR = 3
DIM_WAVELENGTH = 4
DIM_BOUNCE_BASE = 8
DIMS_PER_BOUNCE = 8
SLOT_BSDF_LOBE = 0
SLOT_BSDF_DIR = 1
SLOT_RR = 2
SLOT_SENSOR = 3


def _bdim(depth, slot):
    return DIM_BOUNCE_BASE + depth * DIMS_PER_BOUNCE + slot


@pytree
class ParticleTracerIntegrator:
    """``spectral``: carry one hero wavelength per light path (sampled
    from the visible-range importance distribution, weighted by the CIE
    RGB response at the sensor).  Dispersive BSDFs then see per-lane
    wavelengths, so glass Abbe-number (V_d) parameters get nonzero
    gradients — the chromatic term of the [FORK] lens-design loss
    (design_problem.py renders through dispersive elements).  Emitter/
    BSDF RGB values act as spectrally-flat multipliers at the hero
    wavelength (exact for the gray sources the design workload uses)."""

    max_depth: int = static(8)
    rr_depth: int = static(5)
    hide_emitters: bool = static(False)
    spectral: bool = static(False)
    # rematerialize bounce activations in reverse-mode AD (see the
    # jax.checkpoint note at the scan below); harmless for primal use
    remat: bool = static(True)
    id: str = static("ptracer")

    # ------------------------------------------------------------------

    def _splat(self, img, film, film_pos, value, active):
        """Accumulate a connection into the carried film tensor
        (normalized filter taps — ImageBlock normalize mode)."""
        block = film.put(film_pos, value, active, normalize=True)
        return img + block

    def _connect_sensor(self, scene, sensor, si_p, si_n, si_frame, si_wi,
                        bsdf_idx, on_surface, weight, sample2, active,
                        img, film, ctx=None, wavelengths=None):
        """ptracer.cpp:298-372 connect_sensor.

        si_frame: (s, t, n) shading frame at the vertex; si_wi: local
        incident dir; bsdf_idx: per-lane bsdf index (-1 -> no BSDF, e.g.
        connecting the emitter vertex itself)."""
        ds, sensor_weight = sensor.sample_direction(si_p, sample2, active)
        ok = active & (ds.pdf > 0.0) & jnp.any(sensor_weight != 0.0, axis=-1)

        # visibility (shadow ray toward the sensor aperture)
        delta = ds.p - si_p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-20))
        d = delta / dist[..., None]
        sign = jnp.sign(dot(d, si_n, keepdims=True))
        o = si_p + sign * 1e-4 * jnp.maximum(
            1.0, jnp.max(jnp.abs(si_p), axis=-1, keepdims=True)
        ) * si_n
        shadow = Ray.make(o, d, maxt=dist * (1.0 - 1e-3))
        ok = ok & ~scene.ray_test(shadow, ok, ctx)

        local_d = Frame.to_local(si_frame, d)
        surface_weight = jnp.ones(si_p.shape[:-1] + (3,))

        # vertex on a surface WITHOUT a BSDF (emitter vertex): cosine
        # foreshortening only (ptracer.cpp:324-328)
        no_bsdf = on_surface & (bsdf_idx < 0)
        cosf = jnp.maximum(0.0, Frame.cos_theta(local_d))
        surface_weight = jnp.where(
            no_bsdf[..., None], surface_weight * cosf[..., None],
            surface_weight,
        )

        # vertex with a BSDF: adjoint evaluation + shading-normal
        # correction (Veach p.155; ptracer.cpp:330-346)
        with_bsdf = on_surface & (bsdf_idx >= 0)
        if len(scene.bsdfs) > 0:
            si_like = _SIProxy(si_frame, si_wi, si_p, wavelengths)
            bsdf_val = jnp.zeros(si_p.shape[:-1] + (3,))
            for i, b in enumerate(scene.bsdfs):
                m = with_bsdf & (bsdf_idx == i)
                v, _ = b.eval_pdf(si_like, local_d, m)
                bsdf_val = jnp.where(m[..., None], v, bsdf_val)
            wi_world = Frame.to_world(si_frame, si_wi)
            wi_dot_geo = dot(si_n, wi_world)
            wo_dot_geo = dot(si_n, d)
            valid = (
                (wi_dot_geo * Frame.cos_theta(si_wi) > 0.0)
                & (wo_dot_geo * Frame.cos_theta(local_d) > 0.0)
            )
            corr = jnp.where(
                valid,
                jnp.abs(
                    (Frame.cos_theta(si_wi) * wo_dot_geo)
                    / jnp.maximum(
                        jnp.abs(Frame.cos_theta(local_d) * wi_dot_geo),
                        1e-12,
                    )
                ),
                0.0,
            )
            surface_weight = jnp.where(
                with_bsdf[..., None], corr[..., None] * bsdf_val,
                surface_weight,
            )

        # off-surface emitter vertices: no light from behind
        off_surface = ~on_surface
        surface_weight = jnp.where(
            (off_surface & (Frame.cos_theta(local_d) <= 0.0))[..., None],
            0.0, surface_weight,
        )

        value = weight * sensor_weight * surface_weight
        return self._splat(img, film, ds.uv, value, ok)

    # ------------------------------------------------------------------

    def sample_light_paths(self, scene, sensor, lane, seed, img):
        """One light path per lane; returns the accumulated film tensor."""
        n = lane.shape[0]
        film = sensor.film
        ctx = scene.trace_ctx()
        spec = sampler_spec(scene)
        time = jnp.zeros((n,))

        sel = rng.sample_1d(seed, lane, jnp.int32(DIM_EM_SELECT), spec)
        pos_s = rng.sample_2d(seed, lane, jnp.int32(DIM_EM_POS), spec)
        dir_s = rng.sample_2d(seed, lane, jnp.int32(DIM_EM_DIR), spec)

        active0 = jnp.ones((n,), bool)
        ray, throughput, ps, em_idx = scene.sample_emitter_ray(
            time, sel, dir_s, pos_s, active0
        )
        if self.spectral:
            # hero wavelength per light path; the CIE response/pdf weight
            # folds into the throughput so every connection inherits it
            wu = rng.sample_1d(seed, lane, jnp.int32(DIM_WAVELENGTH), spec)
            lam, lam_pdf = sample_wavelength_visible(wu)
            throughput = throughput * (
                rgb_response_flat(lam) / jnp.maximum(lam_pdf, 1e-12)[..., None]
            )
            wavelengths = lam[..., None]
            ray = ray.replace(wavelengths=wavelengths)
        else:
            wavelengths = jnp.zeros((n, 0))
        active = active0 & jnp.any(throughput != 0.0, axis=-1)

        # ---- direct emitter -> sensor connection (sample_visible_emitters,
        # ptracer.cpp:97-171).  Delta-direction emitters (directionalarea)
        # cannot connect; area emitters re-derive Le-based weight.
        if not self.hide_emitters and self.max_depth != 0:
            conn_w = jnp.zeros((n, 3))
            deltas = jnp.zeros((n,), bool)
            for i, e in enumerate(scene.emitters):
                m = em_idx == i
                if getattr(e, "is_delta", False):
                    deltas = jnp.where(m, True, deltas)
                    continue
                if getattr(e, "is_infinite", False):
                    deltas = jnp.where(m, True, deltas)  # skip env direct
                    continue
                # weight: Le(ps.uv) / (pdf_pos * sel_pmf).  For cosine
                # emission, throughput = Le*pi/pdf; direct connection wants
                # Le/pdf -> divide by pi (the cosine goes into
                # foreshortening at connection time)
                conn_w = jnp.where(m[:, None], throughput / jnp.pi, conn_w)
            s2 = rng.sample_2d(seed, lane, jnp.int32(DIM_DIRECT_SENSOR), spec)
            frame = Frame.from_normal(ps.n)
            img = self._connect_sensor(
                scene, sensor, ps.p, ps.n, frame,
                jnp.zeros((n, 3)).at[:, 2].set(1.0),  # wi: along the normal
                jnp.full((n,), -1, jnp.int32),
                jnp.ones((n,), bool),  # on a surface, no bsdf
                conn_w, s2, active0 & ~deltas & (jnp.any(conn_w != 0, -1)),
                img, film, ctx, wavelengths,
            )

        # ---- random walk (trace_light_ray, ptracer.cpp:204-278) ----
        # NOTE: a fixed-trip-count lax.scan (not while_loop) so that the
        # whole light-tracing estimator is reverse-differentiable — the
        # lens-design workflow backpropagates through this render
        # (design_problem.py:547 dr.backward through the ptracer).
        state = dict(
            ray=ray,
            beta=throughput,
            eta=jnp.ones((n,)),
            active=active & (self.max_depth > 1),
            img=img,
        )

        def body(s, depth):
            act = s["active"]
            si = scene.ray_intersect(s["ray"], act, ctx)
            act = act & si.is_valid()
            bidx = scene.lane_bsdf_index(si)

            # connect this vertex to the sensor
            s2 = rng.sample_2d(seed, lane, _bdim(depth, SLOT_SENSOR), spec)
            img2 = self._connect_sensor(
                scene, sensor, si.p, si.n, si.sh_frame, si.wi, bidx,
                jnp.ones((n,), bool), s["beta"], s2, act, s["img"], film,
                ctx, si.wavelengths,
            )

            # continue the walk: importance-mode BSDF sampling
            s1b = rng.sample_1d(seed, lane, _bdim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane, _bdim(depth, SLOT_BSDF_DIR), spec)
            bs, bw = scene.bsdf_sample(si, s1b, s2b, act)
            # remove the radiance-only eta^2 factor (importance transport)
            bw = bw * (bs.eta**2)[..., None]
            beta = s["beta"] * bw
            eta = s["eta"] * jnp.where(act, bs.eta, 1.0)
            new_ray = si.spawn_ray(si.to_world(bs.wo))
            act = act & (bs.pdf > 0.0) & jnp.any(beta > 0.0, axis=-1)

            # russian roulette (ptracer.cpp:266-276); probabilities detached
            beta_max = jax.lax.stop_gradient(
                jnp.max(beta, axis=-1) * eta * eta
            )
            rr_prob = jnp.minimum(beta_max, 0.95)
            rr_active = depth + 1 >= self.rr_depth
            u = rng.sample_1d(seed, lane, _bdim(depth, SLOT_RR), spec)
            survive = jnp.where(rr_active, u < rr_prob, True)
            beta = jnp.where(
                (rr_active & act)[..., None],
                beta / jnp.maximum(rr_prob, 1e-8)[..., None], beta,
            )
            act = act & survive

            return dict(ray=new_ray, beta=beta, eta=eta, active=act,
                        img=img2), None

        # rematerialize per-bounce activations in the adjoint: without
        # this, jax.grad through the scan stores every bounce's SI
        # rebuild/shading intermediates — O(depth x wavefront) HBM that
        # OOMs deep lens stacks (the 22-surface Nikon prescription at
        # 128 spp holds ~20 f32[22,131072,3] temps).  checkpoint makes
        # the residual per bounce just the carried state, recomputed on
        # the backward pass (~2x bounce FLOPs, backward only) — the
        # renderer's activation-recomputation analogue (SURVEY §5.7).
        body_fn = (jax.checkpoint(body, prevent_cse=False)
                   if self.remat else body)
        out, _ = jax.lax.scan(
            body_fn, state, jnp.arange(1, self.max_depth, dtype=jnp.int32)
        )
        return out["img"]


class _SIProxy:
    """Minimal SurfaceInteraction stand-in for BSDF eval at connections."""

    def __init__(self, frame, wi, p, wavelengths=None):
        self.sh_frame = frame
        self.wi = wi
        self.p = p
        self.uv = jnp.zeros(p.shape[:-1] + (2,))
        self.wavelengths = (
            jnp.zeros(p.shape[:-1] + (0,)) if wavelengths is None
            else wavelengths
        )


def render_ptracer(scene, integrator=None, seed: int = 0,
                   spp: int | None = None):
    """AdjointIntegrator::render analogue (integrator.cpp:544-640):
    W*H*spp light paths, raw splat sum scaled by 1/spp."""
    if integrator is None:
        integrator = scene.integrator
    sensor = scene.sensor
    film = sensor.film
    if spp is None:
        sampler = getattr(sensor, "sampler", None)
        spp = sampler.sample_count if sampler is not None else 16
    n = film.width * film.height * spp
    lane = jnp.arange(n, dtype=jnp.int32)
    img0 = jnp.zeros((film.height, film.width, 4))
    img = integrator.sample_light_paths(
        scene, sensor, lane, jnp.uint32(seed), img0
    )
    sample_scale = 1.0 / spp
    return img[..., :3] * sample_scale

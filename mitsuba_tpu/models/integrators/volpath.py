"""Volumetric path tracer.

Reference: src/integrators/volpath.cpp (470 LoC) / volpathmis.cpp —
free-flight sampling against the medium, NEE with transmittance-attenuated
shadow rays from both medium and surface vertices, phase-function
direction sampling, spectral (channel) MIS for the distance pdf.

Scope: one scene-wide medium (``scene_medium``) — the reference's
per-shape interior media reduce to this for the fog/smoke workloads; the
nested-media stack is future work.  Supports HomogeneousMedium
analytically and GridMedium via delta tracking.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import rng
from ...core.pytree import pytree, static
from ...core.records import Ray
from ..media import GridMedium, HomogeneousMedium
from .common import (
    sampler_spec,
    SLOT_BSDF_DIR,
    SLOT_BSDF_LOBE,
    SLOT_EM_POS,
    SLOT_EM_SELECT,
    SLOT_RR,
    bounce_dim,
    mis_weight,
)

# extra per-bounce dims beyond the surface layout
SLOT_DIST_CH = 5     # channel + distance samples
SLOT_DIST_T = 6
SLOT_PHASE = 7
DT_DIM_BASE = 4096   # delta/ratio-tracking streams live far from the rest


@pytree
class VolPathIntegrator:
    max_depth: int = static(8)
    rr_depth: int = static(6)
    hide_emitters: bool = static(False)
    id: str = static("volpath")

    def _medium_transmittance(self, medium, o, d, dist, lane, seed, depth,
                              active):
        if isinstance(medium, HomogeneousMedium):
            return medium.transmittance(dist, active)
        return medium.transmittance_rt(
            o, d, dist, lane, seed,
            DT_DIM_BASE + depth * 256 + 128, active,
        )

    def sample(self, scene, ray: Ray, lane, seed, active):
        medium = scene.scene_medium
        assert medium is not None, "volpath needs scene_medium"
        n = ray.o.shape[0]
        ctx = scene.trace_ctx()
        spec = sampler_spec(scene)
        phase = medium.phase

        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            L=jnp.zeros((n, 3)),
            beta=jnp.ones((n, 3)),
            active=active,
            prev_p=ray.o,
            prev_pdf=jnp.ones((n,)),
            prev_delta=jnp.ones((n,), bool),
        )

        def cond(s):
            return (s["depth"] < self.max_depth) & jnp.any(s["active"])

        def body(s):
            depth = s["depth"]
            ray = s["ray"]
            L, beta = s["L"], s["beta"]
            act = s["active"]

            si = scene.ray_intersect(ray, act, ctx)
            dist_max = jnp.where(si.is_valid(), si.t, 1e8)

            # ---- free-flight sampling ----
            s_ch = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_DIST_CH), spec)
            s_t = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_DIST_T), spec)
            if isinstance(medium, HomogeneousMedium):
                t_med, is_med, w_med = medium.sample_interaction(
                    dist_max, s_ch, s_t, act
                )
            else:
                t_med, is_med, w_med = medium.sample_interaction_dt(
                    ray.o, ray.d, dist_max, lane, seed,
                    DT_DIM_BASE + depth * 256, act,
                )
            beta = beta * w_med
            p_med = ray.o + ray.d * t_med[:, None]

            on_surface = act & ~is_med & si.is_valid()
            escaped = act & ~is_med & ~si.is_valid()

            # ---- emitter hits for surface/escaped lanes (w/ MIS) ----
            if scene.env_index >= 0 and not self.hide_emitters:
                le_env, pdf_env = scene.eval_env(ray, s["prev_p"], escaped)
                mis_e = jnp.where(
                    s["prev_delta"], 1.0, mis_weight(s["prev_pdf"], pdf_env))
                L = L + beta * le_env * jnp.where(escaped, mis_e, 0.0)[:, None]
            if not self.hide_emitters:
                le, pdf_em = scene.eval_emitter_hit(si, s["prev_p"],
                                                    on_surface)
                mis_h = jnp.where(
                    s["prev_delta"], 1.0, mis_weight(s["prev_pdf"], pdf_em))
                L = L + beta * le * jnp.where(on_surface, mis_h, 0.0)[:, None]

            act_next = (is_med | on_surface) & (depth + 1 < self.max_depth)

            # ---- NEE from medium OR surface vertex ----
            if len(scene.emitters) > 0:
                s1 = rng.sample_1d(seed, lane,
                                   bounce_dim(depth, SLOT_EM_SELECT), spec)
                s2 = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_EM_POS), spec)
                ref_si = si.replace(p=jnp.where(is_med[:, None], p_med, si.p))
                ds, em_weight, ok = scene.sample_emitter_direction(
                    ref_si, s1, s2, act_next, ctx=ctx
                )
                # attenuate by medium transmittance along the shadow ray
                tr = self._medium_transmittance(
                    medium, ref_si.p, ds.d, ds.dist, lane, seed, depth, ok
                )
                # medium vertex: phase eval; surface vertex: bsdf eval
                ph_val = phase.eval(-ray.d * 1.0, ds.d, ok)
                ph_pdf = phase.pdf(-ray.d * 1.0, ds.d, ok)
                wo_em = si.to_local(ds.d)
                bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(si, wo_em, ok & on_surface)
                # beta already carries sigma_s for medium events (the
                # sample_interaction weight), so the medium vertex only
                # contributes the phase value here
                f_val = jnp.where(
                    is_med[:, None],
                    jnp.broadcast_to(ph_val[:, None], bsdf_val.shape),
                    bsdf_val,
                )
                f_pdf = jnp.where(is_med, ph_pdf, bsdf_pdf)
                mis_em = jnp.where(ds.delta, 1.0, mis_weight(ds.pdf, f_pdf))
                L = L + beta * f_val * em_weight * tr * jnp.where(
                    ok, mis_em, 0.0)[:, None]

            # ---- direction sampling: phase or BSDF ----
            s1b = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_BSDF_DIR), spec)
            wo_phase, pdf_phase = phase.sample(-ray.d, s2b, act_next & is_med)
            bs, bsdf_w = scene.bsdf_sample(si, s1b, s2b, act_next & on_surface)
            new_d = jnp.where(is_med[:, None], wo_phase,
                              si.to_world(bs.wo))
            # phase sampling: weight = eval/pdf == 1 for these phases
            beta = jnp.where(is_med[:, None], beta, beta * bsdf_w)
            new_o = jnp.where(is_med[:, None], p_med,
                              si.spawn_ray(si.to_world(bs.wo)).o)
            new_ray = Ray.make(new_o, new_d, time=ray.time,
                               wavelengths=ray.wavelengths)
            pdf_fwd = jnp.where(is_med, pdf_phase, bs.pdf)
            delta_fwd = jnp.where(is_med, False, bs.delta)
            act_next = act_next & (pdf_fwd > 0.0) & jnp.any(beta > 0.0, -1)

            # ---- RR ----
            beta_max = jnp.max(beta, axis=-1)
            rr_prob = jnp.minimum(beta_max, 0.95)
            rr_on = depth + 1 >= self.rr_depth
            u = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_RR), spec)
            survive = jnp.where(rr_on, u < rr_prob, True)
            beta = jnp.where((rr_on & act_next)[:, None],
                             beta / jnp.maximum(rr_prob, 1e-8)[:, None], beta)
            act_next = act_next & survive

            return dict(
                depth=depth + 1,
                ray=new_ray,
                L=L,
                beta=beta,
                active=act_next,
                prev_p=jnp.where(is_med[:, None], p_med, si.p),
                prev_pdf=jnp.where(act_next, pdf_fwd, s["prev_pdf"]),
                prev_delta=jnp.where(act_next, delta_fwd, s["prev_delta"]),
            )

        return jax.lax.while_loop(cond, body, state)["L"]

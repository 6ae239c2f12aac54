"""Volumetric path tracer with PRODUCT-form spectral MIS.

Reference: src/integrators/volpathmis.cpp (:596 update_weights) — when
sigma_t differs per channel, each free-flight event's distance pdf is
channel-dependent.  ``volpath`` folds a per-event balance heuristic into
the throughput (weight = f / mean_c p_c per event); multiplying such
weights across events is NOT the full-path MIS (the product of means is
not the mean of products).  volpathmis instead tracks the per-channel
numerator f_c and pdf product p_c separately along the whole path and
weights every contribution by f / mean_c(p) — the one-sample balance
heuristic over the (uniformly chosen) sampling channel, applied to the
complete distance-sampling chain.

Scope: scene-wide HomogeneousMedium (analytic per-channel transmittance
and pdfs).  Grid media keep using volpath's per-event weighting (their
delta-tracking chain does not expose per-channel pdfs cheaply).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import rng
from ...core.pytree import pytree, static
from ...core.records import Ray
from ..media import HomogeneousMedium
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
from .volpath import SLOT_DIST_CH, SLOT_DIST_T


@pytree
class VolPathMISIntegrator:
    max_depth: int = static(8)
    rr_depth: int = static(6)
    hide_emitters: bool = static(False)
    id: str = static("volpathmis")

    def sample(self, scene, ray: Ray, lane, seed, active):
        medium = scene.scene_medium
        if not isinstance(medium, HomogeneousMedium):
            # grid media: fall back to volpath's per-event channel
            # weighting (its delta-tracking chain has no cheap
            # per-channel pdfs)
            from .volpath import VolPathIntegrator

            return VolPathIntegrator(
                max_depth=self.max_depth, rr_depth=self.rr_depth,
                hide_emitters=self.hide_emitters,
            ).sample(scene, ray, lane, seed, active)
        n = ray.o.shape[0]
        ctx = scene.trace_ctx()
        spec = sampler_spec(scene)
        phase = medium.phase
        sigma_t = medium.sigma_t                    # (3,)
        sigma_s = medium.sigma_s()                  # (3,)

        # The sampling channel is committed ONCE per path
        # (volpathmis.cpp:~640 draws it before the loop): the product
        # pdf chain mean_c(prod_i p_c(t_i)) is only the true density of
        # the sampler if every free-flight event uses the SAME channel.
        # Redrawing per event would make the true density
        # prod_i mean_c p_c(t_i) instead, and the product-form weight
        # would be biased.
        s_ch = rng.sample_1d(seed, lane, bounce_dim(0, SLOT_DIST_CH),
                             spec)
        channel = jnp.clip((s_ch * 3).astype(jnp.int32), 0, 2)
        sig_c = sigma_t[channel]

        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            L=jnp.zeros((n, 3)),
            f_acc=jnp.ones((n, 3)),     # per-channel numerator product
            p_acc=jnp.ones((n, 3)),     # per-channel distance-pdf product
            active=active,
            prev_p=ray.o,
            prev_pdf=jnp.ones((n,)),
            prev_delta=jnp.ones((n,), bool),
        )

        def w_of(f_acc, p_acc):
            """Balance-heuristic throughput f / mean_c(p)
            (volpathmis.cpp mis_weight over channels)."""
            return f_acc / jnp.maximum(
                jnp.mean(p_acc, axis=-1, keepdims=True), 1e-25)

        def cond(s):
            return (s["depth"] < self.max_depth) & jnp.any(s["active"])

        def body(s):
            depth = s["depth"]
            ray = s["ray"]
            L, f_acc, p_acc = s["L"], s["f_acc"], s["p_acc"]
            act = s["active"]

            si = scene.ray_intersect(ray, act, ctx)
            dist_max = jnp.where(si.is_valid(), si.t, 1e8)

            # ---- free flight against the path's committed channel ----
            s_t = rng.sample_1d(seed, lane,
                                bounce_dim(depth, SLOT_DIST_T), spec)
            t = -jnp.log(jnp.maximum(1.0 - s_t, 1e-20)) / jnp.maximum(
                sig_c, 1e-20)
            is_med = act & (t < dist_max)
            t_cl = jnp.minimum(t, dist_max)
            tr = jnp.exp(-sigma_t[None, :] * t_cl[:, None])   # (N, 3)
            # per-channel chain updates (update_weights, :596):
            #   medium event: f *= Tr sigma_s ; p *= sigma_t Tr
            #   surface/escape: f *= Tr ; p *= Tr (survival)
            upd = is_med[:, None]
            f_acc = jnp.where(act[:, None],
                              f_acc * jnp.where(
                                  upd, tr * sigma_s[None, :], tr),
                              f_acc)
            p_acc = jnp.where(act[:, None],
                              p_acc * jnp.where(
                                  upd, tr * sigma_t[None, :], tr),
                              p_acc)
            p_med = ray.o + ray.d * t_cl[:, None]

            on_surface = act & ~is_med & si.is_valid()
            escaped = act & ~is_med & ~si.is_valid()
            beta = w_of(f_acc, p_acc)

            # ---- emitter hits (w/ angular MIS) ----
            if scene.env_index >= 0 and not self.hide_emitters:
                le_env, pdf_env = scene.eval_env(ray, s["prev_p"],
                                                 escaped)
                mis_e = jnp.where(s["prev_delta"], 1.0,
                                  mis_weight(s["prev_pdf"], pdf_env))
                L = L + beta * le_env * jnp.where(escaped, mis_e,
                                                  0.0)[:, None]
            if not self.hide_emitters:
                le, pdf_em = scene.eval_emitter_hit(si, s["prev_p"],
                                                    on_surface)
                mis_h = jnp.where(s["prev_delta"], 1.0,
                                  mis_weight(s["prev_pdf"], pdf_em))
                L = L + beta * le * jnp.where(on_surface, mis_h,
                                              0.0)[:, None]

            act_next = (is_med | on_surface) & (depth + 1 < self.max_depth)

            # ---- NEE with analytic per-channel shadow transmittance ----
            if len(scene.emitters) > 0:
                s1 = rng.sample_1d(seed, lane,
                                   bounce_dim(depth, SLOT_EM_SELECT),
                                   spec)
                s2 = rng.sample_2d(seed, lane,
                                   bounce_dim(depth, SLOT_EM_POS), spec)
                ref_si = si.replace(
                    p=jnp.where(is_med[:, None], p_med, si.p))
                ds, em_weight, ok = scene.sample_emitter_direction(
                    ref_si, s1, s2, act_next, ctx=ctx)
                tr_sh = jnp.exp(-sigma_t[None, :] * ds.dist[:, None])
                ph_val = phase.eval(-ray.d, ds.d, ok)
                ph_pdf = phase.pdf(-ray.d, ds.d, ok)
                wo_em = si.to_local(ds.d)
                bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(
                    si, wo_em, ok & on_surface)
                f_v = jnp.where(
                    is_med[:, None],
                    jnp.broadcast_to(ph_val[:, None], bsdf_val.shape),
                    bsdf_val)
                f_pdf = jnp.where(is_med, ph_pdf, bsdf_pdf)
                mis_em = jnp.where(ds.delta, 1.0,
                                   mis_weight(ds.pdf, f_pdf))
                # the shadow transmittance joins the per-channel
                # numerator (it has no sampling pdf: analytic eval)
                w_nee = w_of(f_acc * tr_sh, p_acc)
                L = L + w_nee * f_v * em_weight * jnp.where(
                    ok, mis_em, 0.0)[:, None]

            # ---- direction sampling: phase or BSDF ----
            s1b = rng.sample_1d(seed, lane,
                                bounce_dim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane,
                                bounce_dim(depth, SLOT_BSDF_DIR), spec)
            wo_phase, pdf_phase = phase.sample(-ray.d, s2b,
                                               act_next & is_med)
            bs, bsdf_w = scene.bsdf_sample(si, s1b, s2b,
                                           act_next & on_surface)
            new_d = jnp.where(is_med[:, None], wo_phase,
                              si.to_world(bs.wo))
            # surface weights are channel-uniform in pdf: fold into f
            f_acc = jnp.where((act_next & on_surface)[:, None],
                              f_acc * bsdf_w, f_acc)
            new_o = jnp.where(is_med[:, None], p_med,
                              si.spawn_ray(si.to_world(bs.wo)).o)
            new_ray = Ray.make(new_o, new_d, time=ray.time,
                               wavelengths=ray.wavelengths)
            pdf_fwd = jnp.where(is_med, pdf_phase, bs.pdf)
            delta_fwd = jnp.where(is_med, False, bs.delta)
            beta = w_of(f_acc, p_acc)
            act_next = act_next & (pdf_fwd > 0.0) & jnp.any(beta > 0.0,
                                                            -1)

            # ---- RR on the effective throughput ----
            beta_max = jnp.max(beta, axis=-1)
            rr_prob = jnp.minimum(beta_max, 0.95)
            rr_on = depth + 1 >= self.rr_depth
            u = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_RR),
                              spec)
            survive = jnp.where(rr_on, u < rr_prob, True)
            f_acc = jnp.where((rr_on & act_next)[:, None],
                              f_acc / jnp.maximum(rr_prob, 1e-8)[:, None],
                              f_acc)
            act_next = act_next & survive

            return dict(
                depth=depth + 1,
                ray=new_ray,
                L=L,
                f_acc=f_acc,
                p_acc=p_acc,
                active=act_next,
                prev_p=jnp.where(is_med[:, None], p_med, si.p),
                prev_pdf=jnp.where(act_next, pdf_fwd, s["prev_pdf"]),
                prev_delta=jnp.where(act_next, delta_fwd,
                                     s["prev_delta"]),
            )

        return jax.lax.while_loop(cond, body, state)["L"]

"""Path tracer with NEE + MIS (power heuristic) + russian roulette.

Reference: src/integrators/path.cpp:95-300 — the dr::Loop megakernel
becomes a ``lax.while_loop`` over SoA path state (SURVEY §7 'wavefront,
not megakernel'): every iteration intersects the whole wavefront, adds the
emitter-hit MIS term, performs NEE with a shadow ray, samples the BSDF,
and advances the rays.  All control flow is masked; no lane divergence.

Depth convention matches the reference: ``max_depth`` counts path segments
(max_depth=1 → camera rays see only directly-visible emitters); russian
roulette starts at ``rr_depth`` with survival probability
min(max(beta) * eta^2, 0.95) (path.cpp:254-280).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import rng
from ...core.pytree import pytree, static
from ...core.records import Ray
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


@pytree
class PathIntegrator:
    max_depth: int = static(6)
    rr_depth: int = static(5)
    hide_emitters: bool = static(False)
    # attach primary-hit ray differentials (sensor.h:62): textures with
    # mip pyramids then use footprint-aware lookups
    ray_diffs: bool = static(False)
    # render wall-clock budget in seconds, 0 = unlimited (the reference's
    # integrator ``timeout`` property, integrator.cpp:23-24,90-92);
    # enforced between spp passes by integrators.common.render
    timeout: float = static(0.0)
    id: str = static("path")

    def sample(self, scene, ray: Ray, lane, seed, active, rd=None):
        """Per-lane radiance estimate L (N, 3)."""
        n = ray.o.shape[0]
        nee_enabled = len(scene.emitters) > 0
        ctx = scene.trace_ctx()  # loop-invariant packed geometry
        spec = sampler_spec(scene)

        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            L=jnp.zeros((n, 3)),
            beta=jnp.ones((n, 3)),
            eta=jnp.ones((n,)),
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
            L, beta, eta = s["L"], s["beta"], s["eta"]
            act = s["active"]

            si = scene.ray_intersect(ray, act, ctx)
            if rd is not None:
                # footprint only at the primary hit (path.cpp: the ray
                # differential is not propagated past the first bounce)
                sid = scene.compute_si_differentials(si, rd, ctx)
                first = (depth == 0).astype(jnp.float32)[..., None]
                si = si.replace(duv_dx=sid.duv_dx * first,
                                duv_dy=sid.duv_dy * first)

            # ---- environment radiance for escaped rays (w/ MIS) ----
            escaped = act & ~si.is_valid()
            if scene.env_index >= 0 and not self.hide_emitters:
                le_env, pdf_env = scene.eval_env(ray, s["prev_p"], escaped)
                mis_e = jnp.where(
                    s["prev_delta"], 1.0, mis_weight(s["prev_pdf"], pdf_env)
                )
                L = L + beta * le_env * jnp.where(escaped, mis_e, 0.0)[:, None]

            act = act & si.is_valid()

            # ---- radiance of directly-hit emitters (w/ MIS) ----
            if not self.hide_emitters:
                le, pdf_em = scene.eval_emitter_hit(si, s["prev_p"], act)
                mis_h = jnp.where(
                    s["prev_delta"], 1.0, mis_weight(s["prev_pdf"], pdf_em)
                )
                L = L + beta * le * jnp.where(act, mis_h, 0.0)[:, None]

            # ---- continue the walk? ----
            act_next = act & (depth + 1 < self.max_depth)

            # ---- next-event estimation (path.cpp:195-230) ----
            if nee_enabled:
                s1 = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_EM_SELECT), spec)
                s2 = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_EM_POS), spec)
                ds, em_weight, ok = scene.sample_emitter_direction(
                    si, s1, s2, act_next, ctx=ctx
                )
                wo_em = si.to_local(ds.d)
                bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(si, wo_em, ok)
                mis_em = jnp.where(
                    ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf)
                )
                L = L + beta * bsdf_val * em_weight * jnp.where(
                    ok, mis_em, 0.0
                )[:, None]

            # ---- BSDF sampling (path.cpp:216 eval_pdf_sample) ----
            s1b = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_BSDF_DIR), spec)
            bs, bsdf_w = scene.bsdf_sample(si, s1b, s2b, act_next)
            new_ray = si.spawn_ray(si.to_world(bs.wo))
            beta = beta * bsdf_w
            eta = eta * jnp.where(act_next, bs.eta, 1.0)

            act_next = act_next & (bs.pdf > 0.0) & jnp.any(beta > 0.0, axis=-1)

            # ---- russian roulette (path.cpp:254-263) ----
            beta_max = jnp.max(beta, axis=-1) * eta * eta
            rr_prob = jnp.minimum(beta_max, 0.95)
            rr_active = depth + 1 >= self.rr_depth
            u = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_RR), spec)
            survive = jnp.where(rr_active, u < rr_prob, True)
            beta = jnp.where(
                (rr_active & act_next)[..., None],
                beta / jnp.maximum(rr_prob, 1e-8)[..., None],
                beta,
            )
            act_next = act_next & survive

            return dict(
                depth=depth + 1,
                ray=new_ray,
                L=L,
                beta=beta,
                eta=eta,
                active=act_next,
                prev_p=si.p,
                prev_pdf=jnp.where(act_next, bs.pdf, s["prev_pdf"]),
                prev_delta=jnp.where(act_next, bs.delta, s["prev_delta"]),
            )

        out = jax.lax.while_loop(cond, body, state)
        return out["L"]

"""Direct-illumination integrator with emitter+BSDF MIS.

Reference: src/integrators/direct.cpp (236 LoC) — one intersection, then
``emitter_samples`` NEE samples and ``bsdf_samples`` BSDF samples combined
with the power heuristic weighted by per-strategy sample fractions
(direct.cpp weights frac_lum/frac_bsdf).
"""
from __future__ import annotations

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
    bounce_dim,
    mis_weight,
)


@pytree
class DirectIntegrator:
    emitter_samples: int = static(1)
    bsdf_samples: int = static(1)
    hide_emitters: bool = static(False)
    id: str = static("direct")

    def sample(self, scene, ray: Ray, lane, seed, active):
        n = ray.o.shape[0]
        frac_em = self.emitter_samples / max(
            self.emitter_samples + self.bsdf_samples, 1
        )
        frac_bs = 1.0 - frac_em
        weight_em = 1.0 / max(self.emitter_samples, 1)
        weight_bs = 1.0 / max(self.bsdf_samples, 1)

        L = jnp.zeros((n, 3))
        ctx = scene.trace_ctx()
        spec = sampler_spec(scene)
        si = scene.ray_intersect(ray, active, ctx)

        # directly visible emitters / environment
        if not self.hide_emitters:
            escaped = active & ~si.is_valid()
            le_env, _ = scene.eval_env(ray, ray.o, escaped)
            L = L + jnp.where(escaped[:, None], le_env, 0.0)
            le, _ = scene.eval_emitter_hit(si, ray.o, active & si.is_valid())
            L = L + le

        act = active & si.is_valid()

        # ---- emitter sampling strategy ----
        for k in range(self.emitter_samples):
            s1 = rng.sample_1d(seed, lane, bounce_dim(k, SLOT_EM_SELECT), spec)
            s2 = rng.sample_2d(seed, lane, bounce_dim(k, SLOT_EM_POS), spec)
            ds, em_weight, ok = scene.sample_emitter_direction(si, s1, s2, act, ctx=ctx)
            wo = si.to_local(ds.d)
            bsdf_val, bsdf_pdf = scene.bsdf_eval_pdf(si, wo, ok)
            mis = jnp.where(
                ds.delta,
                1.0,
                mis_weight(ds.pdf * frac_em, bsdf_pdf * frac_bs),
            )
            L = L + bsdf_val * em_weight * (
                weight_em * jnp.where(ok, mis, 0.0)
            )[:, None]

        # ---- BSDF sampling strategy ----
        for k in range(self.bsdf_samples):
            s1 = rng.sample_1d(seed, lane, bounce_dim(k, SLOT_BSDF_LOBE), spec)
            s2 = rng.sample_2d(seed, lane, bounce_dim(k, SLOT_BSDF_DIR), spec)
            bs, bsdf_w = scene.bsdf_sample(si, s1, s2, act)
            ray2 = si.spawn_ray(si.to_world(bs.wo))
            ok = act & (bs.pdf > 0.0)
            si2 = scene.ray_intersect(ray2, ok, ctx)
            hit2 = ok & si2.is_valid()
            le2, pdf_em2 = scene.eval_emitter_hit(si2, si.p, hit2)
            le_env2, pdf_env2 = scene.eval_env(ray2, si.p, ok & ~si2.is_valid())
            le_tot = jnp.where(hit2[:, None], le2, le_env2)
            pdf_tot = jnp.where(hit2, pdf_em2, pdf_env2)
            mis = jnp.where(
                bs.delta,
                1.0,
                mis_weight(bs.pdf * frac_bs, pdf_tot * frac_em),
            )
            L = L + bsdf_w * le_tot * (weight_bs * jnp.where(ok, mis, 0.0))[:, None]

        return L

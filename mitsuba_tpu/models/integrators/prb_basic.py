"""Basic PRB (no NEE, no RR) + the [FORK] deterministic lens tracer.

Reference: src/python/python/ad/integrators/prb_basic.py — minimal PRB
whose ``trace()`` method (prb_basic.py:46-140, [FORK]) deterministically
propagates rays through N refractive interfaces by forcing the
transmission lobe (sample1 = 1.0) at every dielectric hit, returning the
penultimate ray and the film-plane hit point.  The lens-design geometric
tracer is built on this (design_problem.py:416 geo_tracer).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import rng
from ...core.pytree import pytree, static
from ...core.records import Ray
from .common import SLOT_BSDF_DIR, SLOT_BSDF_LOBE, bounce_dim, mis_weight


@pytree
class PRBBasicIntegrator:
    max_depth: int = static(6)
    hide_emitters: bool = static(False)
    id: str = static("prb_basic")

    def sample(self, scene, ray: Ray, lane, seed, active):
        """Primal estimator: BSDF-sampling-only path tracing
        (prb_basic.py sample, Primal mode)."""
        n = ray.o.shape[0]
        ctx = scene.trace_ctx()
        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            L=jnp.zeros((n, 3)),
            beta=jnp.ones((n, 3)),
            active=active,
            prev_p=ray.o,
        )

        def cond(s):
            return (s["depth"] < self.max_depth) & jnp.any(s["active"])

        def body(s):
            depth, act = s["depth"], s["active"]
            si = scene.ray_intersect(s["ray"], act, ctx)
            escaped = act & ~si.is_valid()
            L = s["L"]
            if scene.env_index >= 0 and not self.hide_emitters:
                le_env, _ = scene.eval_env(s["ray"], s["prev_p"], escaped)
                L = L + s["beta"] * jnp.where(escaped, 1.0, 0.0)[:, None] * le_env
            act = act & si.is_valid()
            if not self.hide_emitters:
                le, _ = scene.eval_emitter_hit(si, s["prev_p"], act)
                L = L + s["beta"] * le
            act_next = act & (depth + 1 < self.max_depth)
            s1 = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_BSDF_LOBE))
            s2 = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_BSDF_DIR))
            bs, bw = scene.bsdf_sample(si, s1, s2, act_next)
            beta = s["beta"] * bw
            act_next = act_next & (bs.pdf > 0.0) & jnp.any(beta > 0.0, -1)
            return dict(
                depth=depth + 1,
                ray=si.spawn_ray(si.to_world(bs.wo)),
                L=L, beta=beta, active=act_next, prev_p=si.p,
            )

        return jax.lax.while_loop(cond, body, state)["L"]

    def trace(self, scene, ray: Ray, num_lenses: int):
        """[FORK] deterministic refractive propagation (prb_basic.py:46):
        forced-transmission BSDF sampling (sample1=1 never picks the
        reflection lobe) through ``num_lenses`` surface hits.

        Returns (penultimate_o, penultimate_d, valid, p_final) where
        ``valid`` marks lanes whose final vertex lies on the film plane
        z=0 and ``p_final`` is the final hit position — differentiable
        w.r.t. the lens mesh vertices via compute_surface_interaction.
        """
        n = ray.o.shape[0]
        ctx = scene.trace_ctx()
        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            pen_o=ray.o,
            pen_d=ray.d,
            p=jnp.zeros((n, 3)),
            z=jnp.full((n,), jnp.inf),
            hit=jnp.zeros((n,), bool),
            active=jnp.ones((n,), bool),
        )

        def cond(s):
            return (s["depth"] < num_lenses) & jnp.any(s["active"])

        def body(s):
            act = s["active"]
            si = scene.ray_intersect(s["ray"], act, ctx)
            valid = si.is_valid()
            act_next = act & valid
            one = jnp.ones((n,))
            bs, bw = scene.bsdf_sample(
                si, one, jnp.zeros((n, 2)), act_next
            )
            pen_o = jnp.where(act_next[:, None], s["ray"].o, s["pen_o"])
            pen_d = jnp.where(act_next[:, None], s["ray"].d, s["pen_d"])
            new_ray = si.spawn_ray(si.to_world(bs.wo))
            p = jnp.where(act_next[:, None], si.p, s["p"])
            z = jnp.where(act_next, si.p[..., 2], s["z"])
            hit = jnp.where(act, valid, s["hit"])
            act_next = act_next & jnp.any(bw > 0.0, axis=-1)
            return dict(
                depth=s["depth"] + 1, ray=new_ray, pen_o=pen_o,
                pen_d=pen_d, p=p, z=z, hit=hit, active=act_next,
            )

        out = jax.lax.while_loop(cond, body, state)
        valid = out["hit"] & (jnp.abs(out["z"]) < 1e-5)
        return out["pen_o"], out["pen_d"], valid, out["p"]

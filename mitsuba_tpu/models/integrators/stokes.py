"""Polarized path tracing + Stokes-vector output.

Reference: src/integrators/stokes.cpp (S0..S3 AOV extraction and the
final sensor-basis rotation, :88-131) on top of the polarized variant of
src/integrators/path.cpp, where spectra are Mueller matrices and the
path throughput is a matrix chain.

TPU design: one dedicated integrator instead of a compile-time variant
axis — the throughput rides as an (N, 3, 4, 4) Mueller chain and the
radiance as an (N, 3, 4) Stokes state through the same masked
``lax.while_loop`` as PathIntegrator; all Stokes bases are the implicit
world bases (mueller.h:285 ``stokes_basis``), with BSDF matrices rotated
from local frames via ``si.to_world_mueller`` (interaction.h:374).
Unpolarized plugins participate through depolarizer promotion.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import mueller, rng
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
class StokesIntegrator:
    """Polarized path tracer; ``sample`` returns S0 (the usual RGB
    radiance), ``sample_stokes`` the full (N, 3, 4) Stokes vectors
    rotated into the sensor's horizontal basis (stokes.cpp:100-110)."""

    max_depth: int = static(6)
    rr_depth: int = static(5)
    hide_emitters: bool = static(False)
    id: str = static("stokes")

    def sample_stokes(self, scene, ray: Ray, lane, seed, active):
        n = ray.o.shape[0]
        nee_enabled = len(scene.emitters) > 0
        ctx = scene.trace_ctx()
        spec = sampler_spec(scene)
        ident = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32),
                                 (n, 3, 4, 4))

        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            S=jnp.zeros((n, 3, 4)),
            T=ident,                       # Mueller throughput chain
            eta=jnp.ones((n,)),
            active=active,
            prev_p=ray.o,
            prev_pdf=jnp.ones((n,)),
            prev_delta=jnp.ones((n,), bool),
        )

        def add_emission(S, T, le, weight, mask):
            """S += T @ unpolarized(le) * weight on masked lanes; an
            unpolarized source needs no basis alignment."""
            s_e = mueller.unpolarized_stokes(le)           # (N, 3, 4)
            contrib = mueller.apply_stokes(T, s_e)
            w = (weight * mask)[:, None, None]
            return S + contrib * w

        def body(s):
            depth = s["depth"]
            ray = s["ray"]
            S, T, eta = s["S"], s["T"], s["eta"]
            act = s["active"]

            si = scene.ray_intersect(ray, act, ctx)

            escaped = act & ~si.is_valid()
            if scene.env_index >= 0 and not self.hide_emitters:
                le_env, pdf_env = scene.eval_env(ray, s["prev_p"], escaped)
                mis_e = jnp.where(s["prev_delta"], 1.0,
                                  mis_weight(s["prev_pdf"], pdf_env))
                S = add_emission(S, T, le_env, mis_e,
                                 escaped.astype(jnp.float32))

            act = act & si.is_valid()

            if not self.hide_emitters:
                le, pdf_em = scene.eval_emitter_hit(si, s["prev_p"], act)
                mis_h = jnp.where(s["prev_delta"], 1.0,
                                  mis_weight(s["prev_pdf"], pdf_em))
                S = add_emission(S, T, le, mis_h, act.astype(jnp.float32))

            act_next = act & (depth + 1 < self.max_depth)

            # ---- NEE with polarized BSDF eval (path.cpp:195-230) ----
            if nee_enabled:
                s1 = rng.sample_1d(seed, lane,
                                   bounce_dim(depth, SLOT_EM_SELECT), spec)
                s2 = rng.sample_2d(seed, lane,
                                   bounce_dim(depth, SLOT_EM_POS), spec)
                ds, em_weight, ok = scene.sample_emitter_direction(
                    si, s1, s2, act_next, ctx=ctx)
                wo_em = si.to_local(ds.d)
                M_em, bsdf_pdf = scene.bsdf_eval_pdf_mueller(si, wo_em, ok)
                # local -> world bases: light arrives along -wo_em,
                # leaves along wi (polarized path.cpp NEE)
                M_em = si.to_world_mueller(M_em, -wo_em, si.wi)
                mis_em = jnp.where(ds.delta, 1.0,
                                   mis_weight(ds.pdf, bsdf_pdf))
                s_l = mueller.unpolarized_stokes(em_weight)   # (N, 3, 4)
                contrib = mueller.apply_stokes(T @ M_em, s_l)
                okf = (ok.astype(jnp.float32) * mis_em)[:, None, None]
                S = S + contrib * okf

            # ---- polarized BSDF sampling ----
            s1b = rng.sample_1d(seed, lane,
                                bounce_dim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane,
                                bounce_dim(depth, SLOT_BSDF_DIR), spec)
            bs, M_b = scene.bsdf_sample_mueller(si, s1b, s2b, act_next)
            M_b = si.to_world_mueller(M_b, -bs.wo, si.wi)
            new_ray = si.spawn_ray(si.to_world(bs.wo))
            T = jnp.where(act_next[:, None, None, None], T @ M_b, T)
            eta = eta * jnp.where(act_next, bs.eta, 1.0)

            beta = jnp.maximum(T[..., 0, 0], 0.0)          # (N, 3) S0 gain
            act_next = act_next & (bs.pdf > 0.0) & jnp.any(
                beta > 0.0, axis=-1)

            beta_max = jnp.max(beta, axis=-1) * eta * eta
            rr_prob = jnp.minimum(beta_max, 0.95)
            rr_active = depth + 1 >= self.rr_depth
            u = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_RR), spec)
            survive = jnp.where(rr_active, u < rr_prob, True)
            T = jnp.where(
                (rr_active & act_next)[:, None, None, None],
                T / jnp.maximum(rr_prob, 1e-8)[:, None, None, None], T)
            act_next = act_next & survive

            return dict(
                depth=depth + 1,
                ray=new_ray,
                S=S,
                T=T,
                eta=eta,
                active=act_next,
                prev_p=si.p,
                prev_pdf=jnp.where(act_next, bs.pdf, s["prev_pdf"]),
                prev_delta=jnp.where(act_next, bs.delta, s["prev_delta"]),
            )

        def cond(s):
            return (s["depth"] < self.max_depth) & jnp.any(s["active"])

        out = jax.lax.while_loop(cond, body, state)
        S = out["S"]

        # final rotation into the sensor's horizontal basis
        # (stokes.cpp:100-110): current implicit basis of the result is
        # stokes_basis(-ray.d); target is cross(ray.d, sensor-up)
        d = ray.d
        cur = mueller.stokes_basis(-d)
        up = scene.sensor.to_world[:3, 1] if hasattr(
            scene.sensor, "to_world") else jnp.asarray([0.0, 1.0, 0.0])
        tgt = jnp.cross(d, jnp.broadcast_to(up, d.shape))
        deg = jnp.sum(tgt * tgt, -1, keepdims=True) < 1e-12
        tgt = jnp.where(deg, cur, tgt)
        R = mueller.rotate_stokes_basis(-d, cur, tgt)      # (N, 4, 4)
        S = mueller.apply_stokes(R[:, None, :, :], S)
        return S

    def sample(self, scene, ray, lane, seed, active):
        return self.sample_stokes(scene, ray, lane, seed, active)[..., 0]

    def sample_aovs(self, scene, ray, lane, seed, active):
        S = self.sample_stokes(scene, ray, lane, seed, active)
        out = {"radiance": S[..., 0]}
        for i in range(4):
            out[f"S{i}"] = S[..., i]
        return out

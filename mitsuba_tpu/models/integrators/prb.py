"""Path-Replay Backpropagation (PRB) — the differentiable-rendering core.

Reference: src/python/python/ad/integrators/common.py:492-796 (RBIntegrator
two-pass structure: primal pass, then an adjoint pass that *replays* the
same random walk with the same sampler state) and prb.py:59-257 (per-bounce
differentiable re-evaluation, NEE + MIS).

How the reference's Dr.Jit mechanisms map here:
- sampler replay           -> the stateless counter RNG re-derives identical
                              samples from (seed, lane, bounce-dim); replay
                              is exact by construction, even across sharding.
- dr.CustomOp _RenderOp    -> jax.custom_vjp around the primal render
  (util.py:356,410)           (prb_render below).
- adjoint-image extraction -> jax.vjp through splat+develop gives per-lane
  (common.py:702-758)         delta_L from the image cotangent.
- resume_grad re-eval      -> each bounce re-evaluates emitter/BSDF terms
  (prb.py:149-162,217)        attached inside a local jax.grad over the
                              scene's float leaves.
- replace_grad(1, ratio)   -> Lr_ind = L_peeled * bsdf_val/stop_grad(bsdf_val)
  (prb.py:227)                (only the gradient of the ratio matters).
- dr.backward_from(dL*Lo)  -> per-bounce grad accumulation into the carried
  (prb.py:244-247)            gradient pytree; O(1)-in-depth memory.

The estimator intentionally ignores visibility discontinuities (same as
`prb`); silhouette/projective gradients are a separate integrator.
"""
from __future__ import annotations

from functools import partial

import numpy as np
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
    sample_rays,
)
from .path import PathIntegrator


def _nee_geometry_attached(si, ds):
    """Attached NEE geometry for the adjoint re-evaluation.

    The emitter POINT ds.p stays detached (it is the integration
    variable), but in the area-measure view the direction, the 1/r^2
    falloff and the emitter-side cosine are all functions of the
    attached shading point si.p.  The reference's prb.py:153 attaches
    only the direction rotation (``ds.d = replace_grad(ds.d,
    normalize(ds.p - si.p))``) while leaving cos_l/r^2 inside the
    detached pdf — we attach the full geometric ratio ``jac`` (primal
    value exactly 1) so receiver-motion gradients are complete.
    Infinite/environment samples keep jac = 1.

    Returns (d_att, jac)."""
    d_vec = ds.p - si.p
    r2 = jnp.maximum(jnp.sum(d_vec ** 2, -1), 1e-20)
    d_att = d_vec / jnp.sqrt(r2)[:, None]
    finite = ds.dist < 1e7
    has_n = jnp.sum(ds.n ** 2, -1) > 0.5
    cos_att = jnp.where(has_n,
                        jnp.abs(jnp.sum(d_att * ds.n, -1)), 1.0)
    g_att = cos_att / r2
    g_det = jax.lax.stop_gradient(g_att)
    good = finite & (g_det > 1e-12)
    jac = jnp.where(good,
                    jnp.where(good, g_att, 1.0)
                    / jnp.where(good, g_det, 1.0), 1.0)
    d_use = jnp.where(finite[:, None], d_att, ds.d)
    return d_use, jac


def _float_partition(tree):
    """Split a pytree into (float leaves, rebuild fn, zero-cotangent fn)."""
    flat, treedef = jax.tree_util.tree_flatten(tree)
    is_float = [
        hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        for x in flat
    ]
    floats = [x for x, f in zip(flat, is_float) if f]

    def rebuild(new_floats):
        it = iter(new_floats)
        return treedef.unflatten(
            [next(it) if f else x for x, f in zip(flat, is_float)]
        )

    def cotangent(float_grads):
        it = iter(float_grads)
        out = []
        for x, f in zip(flat, is_float):
            if f:
                out.append(next(it))
            else:
                out.append(np.zeros(jnp.shape(x), jax.dtypes.float0))
        return treedef.unflatten(out)

    return floats, rebuild, cotangent


@pytree
class PRBIntegrator:
    """prb: PRB with NEE + MIS (registered as "prb", prb.py:259)."""

    max_depth: int = static(6)
    rr_depth: int = static(5)
    id: str = static("prb")

    def sample(self, scene, ray, lane, seed, active):
        """Primal estimator — identical walk to PathIntegrator (the replay
        invariant requires the same RNG dimension layout)."""
        return PathIntegrator(
            max_depth=self.max_depth, rr_depth=self.rr_depth
        ).sample(scene, ray, lane, seed, active)

    # ------------------------------------------------------------ adjoint

    def sample_backward(self, scene, ray, lane, seed, delta_L, L0, active,
                        ray_fn=None):
        """Replay the walk of (seed, lane), propagating the image-space
        adjoint delta_L into gradients w.r.t. the scene's float leaves.

        Returns the list of float-leaf gradients (same order as
        _float_partition(scene)).  prb.py:105-250 Backward mode.

        ``ray_fn(attached_scene) -> Ray`` regenerates the PRIMARY rays
        from the attached scene (same RNG stream): sensor parameters
        (pose, lens curvatures, dispersion) then flow through the
        depth-0 interaction — the reference generates its sensor rays
        under ``dr.resume_grad`` for the same reason (common.py:302).
        Like the reference's PRB, this is the CONTINUOUS part only:
        sensor motion that sweeps visibility edges across pixels
        (e.g. camera translation in an edge-rich scene) additionally
        needs boundary terms (prb_projective).
        """
        n = ray.o.shape[0]
        scene_det = jax.lax.stop_gradient(scene)
        ctx_det = scene_det.trace_ctx()
        floats, rebuild, _ = _float_partition(scene)
        nee_enabled = len(scene.emitters) > 0
        spec = sampler_spec(scene)

        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            L=L0,
            beta=jnp.ones((n, 3)),
            eta=jnp.ones((n,)),
            active=active,
            prev_p=ray.o,
            prev_pdf=jnp.ones((n,)),
            prev_delta=jnp.ones((n,), bool),
            grads=[jnp.zeros_like(x) for x in floats],
        )

        def cond(s):
            return (s["depth"] < self.max_depth) & jnp.any(s["active"])

        def body(s):
            depth = s["depth"]
            ray = s["ray"]
            beta, eta = s["beta"], s["eta"]
            act = s["active"]
            prev_p, prev_pdf, prev_delta = (
                s["prev_p"], s["prev_pdf"], s["prev_delta"],
            )

            # ---------- detached replay (identical to the primal walk)
            pi = scene_det.ray_intersect_preliminary(ray, act, ctx_det)
            si_d = scene_det.compute_si(pi, ray, ctx_det)
            valid = si_d.is_valid()
            escaped = act & ~valid
            act_hit = act & valid

            _, pdf_hit = scene_det.eval_emitter_hit(si_d, prev_p, act_hit)
            _, pdf_env = scene_det.eval_env(ray, prev_p, escaped)
            mis_hit = jnp.where(prev_delta, 1.0, mis_weight(prev_pdf, pdf_hit))
            mis_env = jnp.where(prev_delta, 1.0, mis_weight(prev_pdf, pdf_env))
            mis_hit = jnp.where(act_hit, mis_hit, 0.0)
            mis_env = jnp.where(escaped, mis_env, 0.0)

            act_next = act_hit & (depth + 1 < self.max_depth)

            if nee_enabled:
                s1 = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_EM_SELECT), spec)
                s2 = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_EM_POS), spec)
                ds, _, ok = scene_det.sample_emitter_direction(
                    si_d, s1, s2, act_next, ctx=ctx_det
                )
                wo_em_d = si_d.to_local(ds.d)
                _, bsdf_pdf_nee = scene_det.bsdf_eval_pdf(si_d, wo_em_d, ok)
                mis_em = jnp.where(
                    ds.delta, 1.0, mis_weight(ds.pdf, bsdf_pdf_nee)
                )
                mis_em = jnp.where(ok, mis_em, 0.0)
                inv_ds_pdf = jnp.where(ds.pdf > 0.0, 1.0 / ds.pdf, 0.0)

            s1b = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_BSDF_DIR), spec)
            bs, bsdf_w_d = scene_det.bsdf_sample(si_d, s1b, s2b, act_next)

            # ---------- attached re-evaluation + local gradient
            def contrib_fn(fl):
                sc = rebuild(fl)
                if ray_fn is not None:
                    ray_c = jax.lax.cond(
                        depth == jnp.int32(0),
                        lambda sc_: ray_fn(sc_),
                        lambda sc_: ray, sc)
                else:
                    ray_c = ray
                si = sc.compute_si(pi, ray_c)
                le_hit, _ = sc.eval_emitter_hit(si, prev_p, act_hit)
                le_env, _ = sc.eval_env(ray_c, prev_p, escaped)
                Le_t = beta * (
                    mis_hit[:, None] * le_hit + mis_env[:, None] * le_env
                )
                Lr_dir = jnp.zeros_like(Le_t)
                if nee_enabled:
                    em_val = sc.eval_emitter_direction(si, ds, ok)
                    d_att, jac = _nee_geometry_attached(si, ds)
                    wo_l = si.to_local(d_att)
                    bsdf_val_nee, _ = sc.bsdf_eval_pdf(si, wo_l, ok)
                    Lr_dir = (
                        beta
                        * (mis_em * inv_ds_pdf * jac)[:, None]
                        * bsdf_val_nee
                        * em_val
                    )
                peeled = (
                    s["L"]
                    - jax.lax.stop_gradient(Le_t)
                    - jax.lax.stop_gradient(Lr_dir)
                )
                bsdf_val_ind, _ = sc.bsdf_eval_pdf(si, bs.wo, act_next)
                det = jax.lax.stop_gradient(bsdf_val_ind)
                ratio = bsdf_val_ind * jnp.where(det > 0.0, 1.0 / jnp.maximum(det, 1e-32), 0.0)
                Lr_ind = peeled * ratio
                contrib = jnp.sum(delta_L * (Le_t + Lr_dir + Lr_ind))
                return contrib, peeled

            g, peeled = jax.grad(contrib_fn, has_aux=True)(floats)
            grads = [a + b for a, b in zip(s["grads"], g)]

            # ---------- advance the detached walk (mirrors path.py body)
            new_ray = si_d.spawn_ray(si_d.to_world(bs.wo))
            beta = beta * bsdf_w_d
            eta = eta * jnp.where(act_next, bs.eta, 1.0)
            act_next = act_next & (bs.pdf > 0.0) & jnp.any(beta > 0.0, axis=-1)

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
                L=peeled,
                beta=beta,
                eta=eta,
                active=act_next,
                prev_p=si_d.p,
                prev_pdf=jnp.where(act_next, bs.pdf, prev_pdf),
                prev_delta=jnp.where(act_next, bs.delta, prev_delta),
                grads=grads,
            )

        out = jax.lax.while_loop(cond, body, state)
        return out["grads"]

    def sample_forward(self, scene, tangent_floats, ray, lane, seed, L0,
                       active, ray_fn=None):
        """Forward-mode replay: propagate scene-parameter tangents to
        per-lane radiance tangents dL (N, 3).

        The mirror image of sample_backward — per bounce, jvp of the
        attached re-evaluation instead of grad (the reference's
        render_forward, integrator.h:164 / common.py forward mode).
        """
        n = ray.o.shape[0]
        scene_det = jax.lax.stop_gradient(scene)
        ctx_det = scene_det.trace_ctx()
        floats, rebuild, _ = _float_partition(scene)
        nee_enabled = len(scene.emitters) > 0
        spec = sampler_spec(scene)

        state = dict(
            depth=jnp.int32(0),
            ray=ray,
            L=L0,
            dL=jnp.zeros((n, 3)),
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
            beta, eta = s["beta"], s["eta"]
            act = s["active"]
            prev_p, prev_pdf, prev_delta = (
                s["prev_p"], s["prev_pdf"], s["prev_delta"])

            pi = scene_det.ray_intersect_preliminary(ray, act, ctx_det)
            si_d = scene_det.compute_si(pi, ray, ctx_det)
            valid = si_d.is_valid()
            escaped = act & ~valid
            act_hit = act & valid

            _, pdf_hit = scene_det.eval_emitter_hit(si_d, prev_p, act_hit)
            _, pdf_env = scene_det.eval_env(ray, prev_p, escaped)
            mis_hit = jnp.where(prev_delta, 1.0,
                                mis_weight(prev_pdf, pdf_hit))
            mis_env = jnp.where(prev_delta, 1.0,
                                mis_weight(prev_pdf, pdf_env))
            mis_hit = jnp.where(act_hit, mis_hit, 0.0)
            mis_env = jnp.where(escaped, mis_env, 0.0)
            act_next = act_hit & (depth + 1 < self.max_depth)

            if nee_enabled:
                s1 = rng.sample_1d(seed, lane,
                                   bounce_dim(depth, SLOT_EM_SELECT), spec)
                s2 = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_EM_POS), spec)
                ds, _, ok = scene_det.sample_emitter_direction(
                    si_d, s1, s2, act_next, ctx=ctx_det)
                wo_em_d = si_d.to_local(ds.d)
                _, bsdf_pdf_nee = scene_det.bsdf_eval_pdf(si_d, wo_em_d, ok)
                mis_em = jnp.where(ds.delta, 1.0,
                                   mis_weight(ds.pdf, bsdf_pdf_nee))
                mis_em = jnp.where(ok, mis_em, 0.0)
                inv_ds_pdf = jnp.where(ds.pdf > 0.0, 1.0 / ds.pdf, 0.0)

            s1b = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_BSDF_LOBE), spec)
            s2b = rng.sample_2d(seed, lane, bounce_dim(depth, SLOT_BSDF_DIR), spec)
            bs, bsdf_w_d = scene_det.bsdf_sample(si_d, s1b, s2b, act_next)

            def contrib_fn(fl):
                sc = rebuild(fl)
                if ray_fn is not None:
                    ray_c = jax.lax.cond(
                        depth == jnp.int32(0),
                        lambda sc_: ray_fn(sc_),
                        lambda sc_: ray, sc)
                else:
                    ray_c = ray
                si = sc.compute_si(pi, ray_c)
                le_hit, _ = sc.eval_emitter_hit(si, prev_p, act_hit)
                le_env, _ = sc.eval_env(ray_c, prev_p, escaped)
                Le_t = beta * (mis_hit[:, None] * le_hit
                               + mis_env[:, None] * le_env)
                Lr_dir = jnp.zeros_like(Le_t)
                if nee_enabled:
                    em_val = sc.eval_emitter_direction(si, ds, ok)
                    d_att, jac = _nee_geometry_attached(si, ds)
                    wo_l = si.to_local(d_att)
                    bsdf_val_nee, _ = sc.bsdf_eval_pdf(si, wo_l, ok)
                    Lr_dir = (beta * (mis_em * inv_ds_pdf * jac)[:, None]
                              * bsdf_val_nee * em_val)
                peeled = (s["L"] - jax.lax.stop_gradient(Le_t)
                          - jax.lax.stop_gradient(Lr_dir))
                bsdf_val_ind, _ = sc.bsdf_eval_pdf(si, bs.wo, act_next)
                det = jax.lax.stop_gradient(bsdf_val_ind)
                ratio = bsdf_val_ind * jnp.where(
                    det > 0.0, 1.0 / jnp.maximum(det, 1e-32), 0.0)
                Lr_ind = peeled * ratio
                return Le_t + Lr_dir + Lr_ind, peeled

            (_, peeled), (dLo, _) = jax.jvp(
                contrib_fn, (floats,), (tangent_floats,), has_aux=False
            )
            dL = s["dL"] + dLo

            new_ray = si_d.spawn_ray(si_d.to_world(bs.wo))
            beta = beta * bsdf_w_d
            eta = eta * jnp.where(act_next, bs.eta, 1.0)
            act_next = act_next & (bs.pdf > 0.0) & jnp.any(beta > 0.0, -1)
            beta_max = jnp.max(beta, axis=-1) * eta * eta
            rr_prob = jnp.minimum(beta_max, 0.95)
            rr_on = depth + 1 >= self.rr_depth
            u = rng.sample_1d(seed, lane, bounce_dim(depth, SLOT_RR), spec)
            survive = jnp.where(rr_on, u < rr_prob, True)
            beta = jnp.where((rr_on & act_next)[..., None],
                             beta / jnp.maximum(rr_prob, 1e-8)[..., None],
                             beta)
            act_next = act_next & survive

            return dict(
                depth=depth + 1, ray=new_ray, L=peeled, dL=dL, beta=beta,
                eta=eta, active=act_next, prev_p=si_d.p,
                prev_pdf=jnp.where(act_next, bs.pdf, prev_pdf),
                prev_delta=jnp.where(act_next, bs.delta, prev_delta),
            )

        out = jax.lax.while_loop(cond, body, state)
        return out["dL"]


def prb_render_forward(scene, tangent_scene, integrator, seed=0,
                       spp: int = 16):
    """Forward-mode differentiable render: (image, dimage/dtheta in the
    direction of ``tangent_scene``) — mi.render_forward /
    Integrator::render_forward (integrator.h:164).

    ``tangent_scene``: a pytree matching the scene with tangent values in
    the float leaves (zeros elsewhere); use utils.params to build one for
    a single parameter.
    """
    seed_u = jnp.uint32(seed)
    scene_det = jax.lax.stop_gradient(scene)
    ray, weight, film_pos, lane = sample_rays(scene_det, seed_u, spp)
    n = ray.o.shape[0]
    active = jnp.ones((n,), bool)
    film = scene_det.sensor.film

    L0 = integrator.sample(scene_det, ray, lane, seed_u, active)
    floats_t, _, _ = _float_partition(tangent_scene)

    def ray_fn(sc):
        return sample_rays(sc, seed_u, spp)[0]

    dL = integrator.sample_forward(scene, floats_t, ray, lane, seed_u, L0,
                                   active, ray_fn=ray_fn)
    # sensor importance-weight tangent (mirror of _prb_bwd sensor_term)
    floats, rebuild, _ = _float_partition(scene)
    _, dweight = jax.jvp(
        lambda fl: sample_rays(rebuild(fl), seed_u, spp)[1],
        (floats,), (floats_t,))
    img = film.develop(film.put(film_pos, L0 * weight, active))
    dimg = film.develop(film.put(
        film_pos, dL * weight + L0 * dweight, active))
    return img, dimg


# ---------------------------------------------------------------- render()

def _primal_image(scene, integrator, seed, spp):
    ray, weight, film_pos, lane = sample_rays(scene, jnp.uint32(seed), spp)
    active = jnp.ones((ray.o.shape[0],), bool)
    L = integrator.sample(scene, ray, lane, jnp.uint32(seed), active)
    img = scene.sensor.film.put(film_pos, L * weight, active)
    return scene.sensor.film.develop(img)


@partial(jax.custom_vjp, nondiff_argnums=(1, 3, 4))
def prb_render(scene, integrator, seed=0, spp: int = 16,
               spp_grad: int | None = None):
    """Differentiable render — the mi.render() analogue (util.py:410).

    Gradients w.r.t. every float leaf of ``scene`` are produced by the PRB
    adjoint pass (NOT by naive AD through the primal loop, which would be
    O(depth) memory and is unsupported through lax.while_loop anyway).

    ``seed`` may be a traced integer (vary it per optimization step without
    recompiling).  ``spp_grad``: sample count of the adjoint estimator
    (defaults to spp).
    """
    return _primal_image(scene, integrator, seed, spp)


def _prb_fwd(scene, integrator, seed, spp, spp_grad):
    return prb_render(scene, integrator, seed, spp, spp_grad), (scene, seed)


def _prb_bwd(integrator, spp, spp_grad, res, grad_image):
    scene, seed = res
    if spp_grad is None:
        spp_grad = spp
    scene_det = jax.lax.stop_gradient(scene)
    seed_u = jnp.uint32(seed)

    # regenerate the adjoint wavefront (common.py:700 sample_rays)
    ray, weight, film_pos, lane = sample_rays(scene_det, seed_u, spp_grad)
    n = ray.o.shape[0]
    active = jnp.ones((n,), bool)

    # adjoint-image extraction: delta_L = d(develop(splat(L)))^T grad_image
    # (common.py:741-758)
    film = scene_det.sensor.film

    def splat_develop(L):
        return film.develop(film.put(film_pos, L * weight, active))

    _, vjp = jax.vjp(splat_develop, jnp.zeros((n, 3)))
    (delta_L,) = vjp(grad_image)

    # replay 1: primal radiance along the adjoint walk (common.py:764)
    L0 = integrator.sample(scene_det, ray, lane, seed_u, active)

    # replay 2: backward transport (common.py:777); primary rays are
    # regenerated from the attached scene so sensor parameters (pose,
    # lens geometry, dispersion) receive gradients (common.py:302)
    def ray_fn(sc):
        return sample_rays(sc, seed_u, spp_grad)[0]

    float_grads = integrator.sample_backward(
        scene, ray, lane, seed_u, delta_L, L0, active, ray_fn=ray_fn
    )

    # sensor importance-weight term: d(splat(weight * L0)) / d(sensor)
    floats, rebuild, cotangent = _float_partition(scene)

    def sensor_term(fl):
        sc = rebuild(fl)
        _, weight_a, _, _ = sample_rays(sc, seed_u, spp_grad)
        img = film.develop(film.put(
            film_pos, weight_a * jax.lax.stop_gradient(L0), active))
        return jnp.sum(grad_image * img)

    g_w = jax.grad(sensor_term)(floats)
    float_grads = [a + b for a, b in zip(float_grads, g_w)]
    seed_ct = np.zeros(jnp.shape(seed), jax.dtypes.float0)
    return (cotangent(float_grads), seed_ct)


prb_render.defvjp(_prb_fwd, _prb_bwd)

"""AOV + moment integrator wrappers.

Reference: src/integrators/aov.cpp (546 LoC — arbitrary output variables:
depth/normals/albedo/position/uv alongside or instead of a nested
integrator) and src/integrators/moment.cpp (148 LoC — accumulates the 2nd
moment of a nested integrator's radiance, used by the variance-aware
z-test golden-image harness, test_renders.py:131-158).

TPU design: AOV channels ride as extra radiance channels through the same
splat; ``render_aov`` returns a dict of named (H, W, C) images.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.pytree import pytree, static
from ...core.records import Ray
from .common import sample_rays


@pytree
class AOVIntegrator:
    """aovs: tuple of names from {depth, normals, sh_normals, position,
    uv, prim_index, shape_index}; optional nested integrator adds
    radiance."""

    aovs: tuple = static(("depth", "sh_normals"))
    nested: object = None
    id: str = static("aov")

    def sample_aovs(self, scene, ray: Ray, lane, seed, active):
        """Returns dict name -> (N, C) arrays."""
        ctx = scene.trace_ctx()
        si = scene.ray_intersect(ray, active, ctx)
        valid = si.is_valid()
        out = {}
        for name in self.aovs:
            if name == "depth":
                out[name] = jnp.where(valid, si.t, 0.0)[:, None]
            elif name == "normals":
                out[name] = jnp.where(valid[:, None], si.n, 0.0)
            elif name == "sh_normals":
                out[name] = jnp.where(valid[:, None], si.sh_n, 0.0)
            elif name == "position":
                out[name] = jnp.where(valid[:, None], si.p, 0.0)
            elif name == "uv":
                out[name] = jnp.where(valid[:, None], si.uv, 0.0)
            elif name == "emission":
                # first-hit emitted radiance (denoisers filter only the
                # scattered component and add this back unfiltered)
                le, _ = scene.eval_emitter_hit(si, ray.o, valid)
                out[name] = jnp.where(valid[:, None], le, 0.0)
            elif name == "albedo":
                # aov.cpp albedo: the BSDF's diffuse reflectance at the
                # first hit (denoiser guide buffer)
                bidx = scene.lane_bsdf_index(si)
                alb = jnp.zeros(si.p.shape[:-1] + (3,))
                for i, b in enumerate(scene.bsdfs):
                    m = valid & (bidx == i)
                    tex = (getattr(b, "reflectance", None)
                           or getattr(b, "base_color", None)
                           or getattr(b, "specular_reflectance", None))
                    if tex is not None:
                        v = tex.eval(si)
                    else:
                        v = jnp.full(alb.shape, 0.5)
                    alb = jnp.where(m[:, None], v, alb)
                out[name] = alb
            elif name == "prim_index":
                out[name] = si.prim_index.astype(jnp.float32)[:, None]
            elif name == "shape_index":
                out[name] = si.shape_index.astype(jnp.float32)[:, None]
            else:
                raise ValueError(f"unknown AOV {name!r}")
        if self.nested is not None:
            out["radiance"] = self.nested.sample(scene, ray, lane, seed,
                                                 active)
        return out

    def sample(self, scene, ray, lane, seed, active):
        """Radiance-like fallback: first 3 channels of the AOV stack."""
        out = self.sample_aovs(scene, ray, lane, seed, active)
        if "radiance" in out:
            return out["radiance"]
        stack = jnp.concatenate(list(out.values()), axis=-1)
        c = stack.shape[-1]
        if c >= 3:
            return stack[:, :3]
        return jnp.pad(stack, ((0, 0), (0, 3 - c)))


def render_aov(scene, integrator: AOVIntegrator, seed: int = 0,
               spp: int | None = None):
    """Render every AOV channel into its own developed image."""
    sensor = scene.sensor
    film = sensor.film
    if spp is None:
        sampler = getattr(sensor, "sampler", None)
        spp = sampler.sample_count if sampler is not None else 16
    ray, weight, film_pos, lane = sample_rays(scene, jnp.uint32(seed), spp)
    active = jnp.ones((ray.o.shape[0],), bool)
    outs = integrator.sample_aovs(scene, ray, lane, jnp.uint32(seed), active)
    images = {}
    for name, vals in outs.items():
        if name == "radiance":
            vals = vals * weight
        img = film.put(film_pos, vals, active)
        images[name] = film.develop(img)
    return images


@pytree
class MomentIntegrator:
    """2nd-moment wrapper (moment.cpp): returns per-lane (L, L^2) so the
    film accumulates E[L] and E[L^2] — per-pixel variance =
    (E[L^2] - E[L]^2) / (spp - 1) for the z-test harness."""

    nested: object = None
    id: str = static("moment")

    def sample(self, scene, ray, lane, seed, active):
        return self.nested.sample(scene, ray, lane, seed, active)


def render_moments(scene, integrator, seed: int = 0, spp: int | None = None):
    """Returns (mean_image, second_moment_image) for variance estimation
    (test_renders.py z-test inputs)."""
    nested = integrator.nested if isinstance(integrator, MomentIntegrator) \
        else integrator
    sensor = scene.sensor
    film = sensor.film
    if spp is None:
        sampler = getattr(sensor, "sampler", None)
        spp = sampler.sample_count if sampler is not None else 16
    ray, weight, film_pos, lane = sample_rays(scene, jnp.uint32(seed), spp)
    active = jnp.ones((ray.o.shape[0],), bool)
    L = nested.sample(scene, ray, lane, jnp.uint32(seed), active) * weight
    img1 = film.develop(film.put(film_pos, L, active))
    img2 = film.develop(film.put(film_pos, L * L, active))
    return img1, img2

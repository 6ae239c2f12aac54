"""Multi-chip PRB: sharded differentiable rendering.

New-scope TPU layer (SURVEY §5.8): the PRB primal AND adjoint passes are
sharded over the wavefront axis.  Forward: per-chip partial films are
psum-reduced over ICI.  Backward: each chip replays only its own lanes
(global lane ids keep the replay exact under any partitioning), computes
its scene-parameter gradients, and a single psum all-reduces them — the
renderer's analogue of data-parallel gradient all-reduce, overlapped with
the adjoint sweep by XLA's scheduler.

The adjoint-image extraction divides by the GLOBAL filter-weight channel
(computed once in the backward, psum'd), so delta_L per lane is exactly
the single-chip value.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.integrators.prb import _float_partition
from .wavefront import _pass_lanes


def make_sharded_prb(integrator, mesh: Mesh, spp: int,
                     spp_grad: int | None = None, axis: str = "rays"):
    """Build a differentiable sharded render fn(scene, seed) -> image.

    Gradients w.r.t. every float leaf of the scene flow through the PRB
    adjoint, all-reduced across the mesh.
    """
    if spp_grad is None:
        spp_grad = spp
    n_dev = mesh.shape[axis]

    def _wavefront(scene, spp_n):
        sensor = scene.sensor
        w, h = sensor.film.width, sensor.film.height
        n_total = w * h * spp_n
        n_pad = -(-n_total // n_dev) * n_dev
        return jnp.arange(n_pad, dtype=jnp.int32), n_total

    def _primal(scene, seed):
        lanes, n_total = _wavefront(scene, spp)

        def shard_fn(sc, lane):
            valid = lane < n_total
            ray, weight, film_pos = _pass_lanes(sc, jnp.uint32(seed), spp,
                                                lane)
            L = integrator.sample(sc, ray, lane, jnp.uint32(seed), valid)
            partial_img = sc.sensor.film.put(film_pos, L * weight, valid)
            return jax.lax.psum(partial_img, axis)

        img = shard_map(shard_fn, mesh=mesh, in_specs=(P(), P(axis)),
                        out_specs=P(), check_vma=False)(scene, lanes)
        return scene.sensor.film.develop(img)

    @jax.custom_vjp
    def f(scene, seed):
        return _primal(scene, seed)

    def fwd(scene, seed):
        return _primal(scene, seed), (scene, seed)

    def bwd(res, grad_image):
        scene, seed = res
        scene_det = jax.lax.stop_gradient(scene)
        lanes, n_total = _wavefront(scene_det, spp_grad)
        seed_u = jnp.uint32(seed)

        def shard_bwd(sc, sc_det, lane):
            film = sc_det.sensor.film
            valid = lane < n_total
            ray, weight, film_pos = _pass_lanes(sc_det, seed_u, spp_grad,
                                                lane)
            n = lane.shape[0]
            # global filter-weight image (independent of L)
            w_partial = film.put(film_pos, jnp.zeros((n, 3)), valid)[..., 3:]
            w_global = jax.lax.psum(w_partial, axis)

            def splat_div(L):
                img = film.put(film_pos, L * weight, valid)
                return img[..., :3] / jnp.maximum(w_global, 1e-12)

            _, vjp = jax.vjp(splat_div, jnp.zeros((n, 3)))
            (delta_L,) = vjp(grad_image)

            L0 = integrator.sample(sc_det, ray, lane, seed_u, valid)
            grads = integrator.sample_backward(
                sc, ray, lane, seed_u, delta_L, L0, valid
            )
            # all-reduce scene-parameter gradients over ICI
            return [jax.lax.psum(g, axis) for g in grads]

        float_grads = shard_map(
            shard_bwd, mesh=mesh, in_specs=(P(), P(), P(axis)),
            out_specs=P(), check_vma=False,
        )(scene, scene_det, lanes)
        _, _, cotangent = _float_partition(scene)
        seed_ct = np.zeros(jnp.shape(seed), jax.dtypes.float0)
        return cotangent(float_grads), seed_ct

    f.defvjp(fwd, bwd)
    return f

"""Multi-chip wavefront sharding via shard_map over a device mesh.

The reference has NO distributed backend (SURVEY §2.11) — its parallelism
is one Dr.Jit wavefront on one device.  This module is the new-scope TPU
layer (SURVEY §5.8): the ray/sample wavefront is embarrassingly parallel,
so we

- shard the lane axis across a 1-D ``jax.sharding.Mesh`` axis ('rays'),
- replicate the scene (geometry, BVH, BSDF/emitter params) in every
  chip's HBM,
- splat per-chip partial film tensors and ``psum`` them over ICI
  (replacing the reference's atomic scatter_reduce, imageblock.cpp:119),
- ``psum`` scene-parameter gradients in the same collective step during
  the adjoint pass (overlapped by XLA's scheduler).

Lane ids are GLOBAL (device_offset + local index) and feed the stateless
counter RNG, so the rendered image is bitwise independent of the mesh
shape — a single-chip render and an 8-chip render of the same seed are
identical (tested in tests/test_parallel.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..core import rng
from ..models.integrators.common import DIM_APERTURE, DIM_POS, DIM_WAVELENGTH


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (axis,))


def _pass_lanes(scene, seed, spp, lane):
    """Per-lane primary ray generation from global lane ids (replicated
    scene, local lane slice)."""
    sensor = scene.sensor
    w, h = sensor.film.width, sensor.film.height
    pixel = lane // spp
    px = (pixel % w).astype(jnp.float32)
    py = (pixel // w).astype(jnp.float32)
    jitter = rng.sample_2d(seed, lane, jnp.int32(DIM_POS))
    film_pos = jnp.stack([px, py], axis=-1) + jitter
    pos_unit = film_pos / jnp.asarray([w, h], jnp.float32)
    aperture = rng.sample_2d(seed, lane, jnp.int32(DIM_APERTURE))
    wav = rng.sample_1d(seed, lane, jnp.int32(DIM_WAVELENGTH))
    n = lane.shape[0]
    ray, weight = sensor.sample_ray(jnp.zeros((n,)), wav, pos_unit, aperture)
    return ray, weight, film_pos


def render_sharded(scene, integrator, mesh: Mesh, seed: int = 0,
                   spp: int = 16, axis: str = "rays"):
    """Distributed primal render: lanes sharded, film psum-reduced.

    Returns the developed (H, W, 3) image, replicated on all devices.
    """
    n_dev = mesh.shape[axis]
    sensor = scene.sensor
    w, h = sensor.film.width, sensor.film.height
    n_total = w * h * spp
    # pad the wavefront to a multiple of the mesh size; padded lanes are
    # masked inactive so they contribute nothing to the film.
    n_pad = -(-n_total // n_dev) * n_dev
    lanes = jnp.arange(n_pad, dtype=jnp.int32)

    def shard_fn(sc, lane):
        valid = lane < n_total
        ray, weight, film_pos = _pass_lanes(sc, jnp.uint32(seed), spp, lane)
        L = integrator.sample(sc, ray, lane, jnp.uint32(seed), valid)
        partial = sc.sensor.film.put(film_pos, L * weight, valid)
        return jax.lax.psum(partial, axis)

    # scene is replicated (P() on every leaf); lanes sharded on the ray
    # axis.  Differentiable: the psum transposes onto the adjoint pass, so
    # scene-parameter gradients are all-reduced over ICI automatically.
    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    image = fn(scene, lanes)
    return sensor.film.develop(image)

"""Sensors: perspective pinhole + thin-lens cameras.

Reference: src/sensors/perspective.cpp (419 LoC), src/sensors/thinlens.cpp
(390 LoC) and the Sensor/ProjectiveCamera interfaces
(include/mitsuba/render/sensor.h:18,187).

Conventions reproduced from the reference:
- ``to_world`` maps camera space -> world; camera space has +z forward,
  +y up, +x pointing image-LEFT (transform.h look_at stores the ``left``
  vector in column 0), so the sample->direction map negates x/y exactly
  like perspective.cpp's sample_to_camera (scale([-0.5, -0.5*aspect, 1])).
- ``fov`` is specified along ``fov_axis``; film position samples live in
  [0,1)^2 with (0,0) the top-left corner; importance weights are 1
  (normalized importance, perspective.cpp sample_ray).
- The [FORK] realistic-lens camera lives in lens/ and implements this same
  interface.

``to_world`` is a differentiable leaf — camera-pose optimization
(BASELINE config 4) differentiates through it.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core import transform as tf
from ..core import warp
from ..core.math import normalize
from ..core.records import Ray
from .film import Film


def _fov_to_tan_x(fov_deg, fov_axis: str, width: int, height: int):
    """Half-tangent of the horizontal (x) field of view."""
    t = jnp.tan(0.5 * jnp.deg2rad(jnp.asarray(fov_deg, jnp.float32)))
    aspect = width / height
    if fov_axis == "x":
        return t
    if fov_axis == "y":
        return t * aspect
    if fov_axis == "smaller":
        return t if aspect >= 1.0 else t * aspect
    if fov_axis == "larger":
        return t if aspect <= 1.0 else t * aspect
    if fov_axis == "diagonal":
        d = math.sqrt(1.0 + 1.0 / (aspect * aspect))
        return t / d
    raise ValueError(f"unknown fov_axis {fov_axis!r}")


@pytree
class PerspectiveCamera:
    """Pinhole camera (src/sensors/perspective.cpp)."""

    to_world: jnp.ndarray          # (4, 4) differentiable pose
    film: Film = static(None)
    fov: float = static(39.3077)
    fov_axis: str = static("x")
    near_clip: float = static(1e-2)
    far_clip: float = static(1e4)
    sampler: object = static(None)
    id: str = static("perspective")

    needs_aperture_sample = False

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film())
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())

    def _dir_camera(self, position_sample):
        """Unnormalized camera-space direction for film sample in [0,1)^2."""
        w, h = self.film.width, self.film.height
        tx = _fov_to_tan_x(self.fov, self.fov_axis, w, h)
        aspect = w / h
        u = position_sample[..., 0]
        v = position_sample[..., 1]
        x = (1.0 - 2.0 * u) * tx
        y = (1.0 - 2.0 * v) * tx / aspect
        return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)

    def sample_direction(self, ref_p, sample2, active=None):
        """NEE toward the pinhole (perspective.cpp:283-321): delta position
        at the camera origin; importance = 1/(A_img * cos^3) / dist^2."""
        from ..core.records import DirectionSample

        n = ref_p.shape[0]
        if active is None:
            active = jnp.ones((n,), bool)
        w, h = self.film.width, self.film.height
        tx = _fov_to_tan_x(self.fov, self.fov_axis, w, h)
        aspect = w / h
        inv_w = tf.inverse(self.to_world)
        local = tf.apply_point(inv_w, ref_p)
        ok = active & (local[..., 2] >= self.near_clip) & (
            local[..., 2] <= self.far_clip
        )
        z = jnp.where(jnp.abs(local[..., 2]) > 1e-12, local[..., 2], 1.0)
        u = 0.5 - 0.5 * local[..., 0] / (z * tx)
        v = 0.5 - 0.5 * local[..., 1] * aspect / (z * tx)
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)

        dist = jnp.sqrt(jnp.maximum(jnp.sum(local * local, axis=-1), 1e-20))
        ct = local[..., 2] / dist
        # image-plane rect at z=1: [-tx,tx] x [-tx/aspect, tx/aspect]
        normalization = 1.0 / (4.0 * tx * tx / aspect)
        # double-where: evaluating 1/ct^3 on invalid lanes would produce
        # inf/NaN adjoints (ct^6 underflows in f32)
        ok_ct = ok & (ct > 1e-6)
        ct_safe = jnp.where(ok_ct, ct, 1.0)
        importance = jnp.where(ok_ct, normalization / ct_safe**3, 0.0)
        cam_p = jnp.broadcast_to(self.to_world[:3, 3], (n, 3))
        d = (cam_p - ref_p) / dist[..., None]
        ds = DirectionSample(
            p=cam_p,
            n=tf.apply_vector(self.to_world,
                              jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                               (n, 3))),
            uv=jnp.stack([u * w, v * h], axis=-1),
            d=d,
            dist=dist,
            pdf=jnp.where(ok, 1.0, 0.0),
            delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        weight = (importance / (dist * dist))[..., None] * jnp.ones((n, 3))
        return ds, weight

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        """Returns (Ray, importance weight (N,3))."""
        d_cam = normalize(self._dir_camera(position_sample))
        d = tf.apply_vector(self.to_world, d_cam)
        o = jnp.broadcast_to(self.to_world[:3, 3], d.shape)
        # near/far clipping along the camera z axis (perspective.cpp:inv_z)
        inv_z = 1.0 / d_cam[..., 2]
        o = o + d * (self.near_clip * inv_z)[..., None]
        maxt = (self.far_clip - self.near_clip) * inv_z
        ray = Ray.make(o, d, maxt=maxt, time=time)
        weight = jnp.ones(d.shape[:-1] + (3,))
        return ray, weight


@pytree
class ThinLensCamera:
    """Thin-lens depth-of-field camera (src/sensors/thinlens.cpp)."""

    to_world: jnp.ndarray            # (4, 4)
    aperture_radius: jnp.ndarray     # () differentiable
    focus_distance: jnp.ndarray      # ()
    film: Film = static(None)
    fov: float = static(34.0)
    fov_axis: str = static("x")
    near_clip: float = static(1e-2)
    far_clip: float = static(1e4)
    sampler: object = static(None)
    id: str = static("thinlens")

    needs_aperture_sample = True

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film())
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        w, h = self.film.width, self.film.height
        tx = _fov_to_tan_x(self.fov, self.fov_axis, w, h)
        aspect = w / h
        u = position_sample[..., 0]
        v = position_sample[..., 1]
        # point on the focus plane hit by the pinhole ray (thinlens.cpp)
        d_pin = jnp.stack(
            [(1.0 - 2.0 * u) * tx, (1.0 - 2.0 * v) * tx / aspect,
             jnp.ones_like(u)],
            axis=-1,
        )
        p_focus = d_pin * self.focus_distance
        # aperture point on the lens disk at z=0
        p_disk = warp.square_to_uniform_disk_concentric(aperture_sample)
        o_cam = jnp.concatenate(
            [self.aperture_radius * p_disk,
             jnp.zeros(p_disk.shape[:-1] + (1,))],
            axis=-1,
        )
        d_cam = normalize(p_focus - o_cam)
        d = tf.apply_vector(self.to_world, d_cam)
        o = tf.apply_point(self.to_world, o_cam)
        inv_z = 1.0 / d_cam[..., 2]
        o = o + d * (self.near_clip * inv_z)[..., None]
        maxt = (self.far_clip - self.near_clip) * inv_z
        ray = Ray.make(o, d, maxt=maxt, time=time)
        weight = jnp.ones(d.shape[:-1] + (3,))
        return ray, weight

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


def sample_sensor_wavelengths(spectral: bool, wavelength_sample):
    """Shared hero-wavelength sampling for sensors (endpoint.h:95-314
    sample_wavelengths): returns (wavelengths (N,1|0), rgb response
    weight (N,3)).  Non-spectral sensors carry no wavelengths and a
    unit weight."""
    import jax.numpy as _jnp

    from ..core.spectrum import rgb_response_flat, sample_wavelength_visible

    n = wavelength_sample.shape[0]
    if not spectral:
        return _jnp.zeros((n, 0)), _jnp.ones((n, 3))
    lam, pdf = sample_wavelength_visible(wavelength_sample)
    weight = rgb_response_flat(lam) / _jnp.maximum(pdf, 1e-12)[..., None]
    return lam[..., None], weight


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
    spectral: bool = static(False)
    # motion blur: keyframed pose + shutter interval (sensor.h
    # shutter_open/shutter_open_time; transform.h AnimatedTransform)
    animation: object = None       # core.transform.AnimatedTransform
    shutter_open: float = static(0.0)
    shutter_open_time: float = static(0.0)
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
        if self.animation is not None:
            tw = self.animation.eval(time)          # (N, 4, 4)
            d = jnp.einsum("nij,nj->ni", tw[:, :3, :3], d_cam)
            o = tw[:, :3, 3]
        else:
            d = tf.apply_vector(self.to_world, d_cam)
            o = jnp.broadcast_to(self.to_world[:3, 3], d.shape)
        # near/far clipping along the camera z axis (perspective.cpp:inv_z)
        inv_z = 1.0 / d_cam[..., 2]
        o = o + d * (self.near_clip * inv_z)[..., None]
        maxt = (self.far_clip - self.near_clip) * inv_z
        wavelengths, weight = sample_sensor_wavelengths(
            self.spectral, wavelength_sample)
        ray = Ray.make(o, d, maxt=maxt, time=time, wavelengths=wavelengths)
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


@pytree
class OrthographicCamera:
    """Orthographic projection (src/sensors/orthographic.cpp:206): parallel
    rays along +z; the film spans scale_x x scale_y world units."""

    to_world: jnp.ndarray
    scale_x: jnp.ndarray = None   # () world width of the film
    scale_y: jnp.ndarray = None   # ()
    film: Film = static(None)
    near_clip: float = static(1e-2)
    far_clip: float = static(1e4)
    sampler: object = static(None)
    id: str = static("orthographic")

    needs_aperture_sample = False

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film())
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())
        if self.scale_x is None:
            object.__setattr__(self, "scale_x", jnp.asarray(1.0))
        if self.scale_y is None:
            object.__setattr__(self, "scale_y", jnp.asarray(1.0))

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        u = position_sample[..., 0]
        v = position_sample[..., 1]
        o_cam = jnp.stack(
            [(1.0 - 2.0 * u) * 0.5 * self.scale_x,
             (1.0 - 2.0 * v) * 0.5 * self.scale_y,
             jnp.zeros_like(u)],
            axis=-1,
        )
        o = tf.apply_point(self.to_world, o_cam)
        d = tf.apply_vector(
            self.to_world,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), o.shape),
        )
        o = o + d * self.near_clip
        n = u.shape[0]
        maxt = jnp.full((n,), self.far_clip - self.near_clip)
        return Ray.make(o, d, maxt=maxt, time=time), jnp.ones((n, 3))


@pytree
class RadianceMeter:
    """Single-direction radiance probe (src/sensors/radiancemeter.cpp:168):
    all samples share one origin + direction; film is typically 1x1."""

    to_world: jnp.ndarray
    film: Film = static(None)
    near_clip: float = static(1e-4)
    far_clip: float = static(1e4)
    sampler: object = static(None)
    id: str = static("radiancemeter")

    needs_aperture_sample = False

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film(width=1, height=1))
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        n = position_sample.shape[0]
        o = jnp.broadcast_to(self.to_world[:3, 3], (n, 3))
        d = tf.apply_vector(
            self.to_world,
            jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)),
        )
        o = o + d * self.near_clip
        maxt = jnp.full((n,), self.far_clip - self.near_clip)
        return Ray.make(o, d, maxt=maxt, time=time), jnp.ones((n, 3))


@pytree
class IrradianceMeter:
    """Surface irradiance probe (src/sensors/irradiancemeter.cpp:139):
    cosine-weighted hemisphere rays from a disk of given radius."""

    to_world: jnp.ndarray
    radius: jnp.ndarray = None
    film: Film = static(None)
    near_clip: float = static(1e-4)
    far_clip: float = static(1e4)
    sampler: object = static(None)
    id: str = static("irradiancemeter")

    needs_aperture_sample = True

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film(width=1, height=1))
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())
        if self.radius is None:
            object.__setattr__(self, "radius", jnp.asarray(1.0))

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        from ..core import warp as _warp

        n = position_sample.shape[0]
        p_disk = _warp.square_to_uniform_disk_concentric(position_sample)
        o_cam = jnp.concatenate(
            [self.radius * p_disk, jnp.zeros((n, 1))], axis=-1
        )
        d_cam = _warp.square_to_cosine_hemisphere(aperture_sample)
        o = tf.apply_point(self.to_world, o_cam)
        d = tf.apply_vector(self.to_world, d_cam)
        o = o + d * self.near_clip
        maxt = jnp.full((n,), self.far_clip - self.near_clip)
        # weight: E estimator = pi * mean(L) under cosine sampling
        return (Ray.make(o, d, maxt=maxt, time=time),
                jnp.full((n, 3), jnp.pi))


@pytree
class RadialWarpCamera:
    """[FORK] Perspective camera with a differentiable radial direction
    warp controlled by ``k_warp`` (src/sensors/radialwarp.cpp:132-161,
    481 — a distortion-optimization toy).

    The warp integrates dy/dt = -k_warp * y^2 over t in [0,1] with RK4
    (radialwarp.cpp:460-478 solve_rk4) applied to the radial component of
    the unnormalized camera-space direction."""

    to_world: jnp.ndarray
    k_warp: jnp.ndarray = None    # () differentiable distortion strength
    film: Film = static(None)
    fov: float = static(39.3077)
    fov_axis: str = static("x")
    near_clip: float = static(1e-2)
    far_clip: float = static(1e4)
    rk4_steps: int = static(64)
    sampler: object = static(None)
    id: str = static("radialwarp")

    needs_aperture_sample = False

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film())
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())
        if self.k_warp is None:
            object.__setattr__(self, "k_warp", jnp.asarray(1.0))

    def _solve_rk4(self, y0):
        """Integrate y' = -k y^2 from t=0..1 (radialwarp.cpp:464).

        lax.scan (fixed trip count) keeps this reverse-differentiable —
        k_warp is an optimization variable (radialwarp.cpp:161)."""
        import jax

        dt = 1.0 / (self.rk4_steps + 1)
        f = lambda y: -self.k_warp * y * y

        def step(y, _):
            k1 = f(y) * dt
            k2 = f(y + 0.5 * k1) * dt
            k3 = f(y + 0.5 * k2) * dt
            k4 = f(y + k3) * dt
            return y + (k1 + k4) / 6.0 + (k2 + k3) / 3.0, None

        y, _ = jax.lax.scan(step, y0, None, length=self.rk4_steps + 1)
        return y

    def _warp_direction(self, d):
        """Shrink the radial component by the ODE flow
        (radialwarp.cpp:481 warp_direction)."""
        rad = jnp.sqrt(jnp.maximum(
            d[..., 0] ** 2 + d[..., 1] ** 2, 1e-20))
        r_out = self._solve_rk4(rad)
        scale = r_out / rad
        d_out = jnp.stack(
            [d[..., 0] * scale, d[..., 1] * scale, d[..., 2]], axis=-1
        )
        return normalize(d_out)

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        w, h = self.film.width, self.film.height
        tx = _fov_to_tan_x(self.fov, self.fov_axis, w, h)
        aspect = w / h
        u = position_sample[..., 0]
        v = position_sample[..., 1]
        d_cam = normalize(jnp.stack(
            [(1.0 - 2.0 * u) * tx, (1.0 - 2.0 * v) * tx / aspect,
             jnp.ones_like(u)], axis=-1))
        d_cam = self._warp_direction(d_cam)
        d = tf.apply_vector(self.to_world, d_cam)
        o = jnp.broadcast_to(self.to_world[:3, 3], d.shape)
        inv_z = 1.0 / d_cam[..., 2]
        o = o + d * (self.near_clip * inv_z)[..., None]
        maxt = (self.far_clip - self.near_clip) * inv_z
        return (Ray.make(o, d, maxt=maxt, time=time),
                jnp.ones(d.shape[:-1] + (3,)))


@pytree
class BatchSensor:
    """Tile multiple child sensors side-by-side on one film
    (src/sensors/batch.cpp:280): the x position selects the child."""

    sensors: tuple
    film: Film = static(None)
    sampler: object = static(None)
    id: str = static("batch")

    needs_aperture_sample = True

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film())
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        import jax

        k = len(self.sensors)
        u = position_sample[..., 0] * k
        idx = jnp.clip(u.astype(jnp.int32), 0, k - 1)
        u_local = u - idx.astype(jnp.float32)
        pos_local = jnp.stack([u_local, position_sample[..., 1]], axis=-1)
        ray = weight = None
        for i, s in enumerate(self.sensors):
            r_i, w_i = s.sample_ray(time, wavelength_sample, pos_local,
                                    aperture_sample)
            m = idx == i
            if ray is None:
                ray, weight = r_i, w_i
            else:
                ray = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(
                        m.reshape(m.shape + (1,) * (a.ndim - m.ndim)), a, b),
                    r_i, ray)
                weight = jnp.where(m[:, None], w_i, weight)
        return ray, weight


@pytree
class DistantSensor:
    """Distant (directional) radiance sensor (src/sensors/distant.cpp):
    every ray travels along the fixed ``direction``; film positions map
    to offsets on the perpendicular plane covering the scene's bounding
    disk.  ``scene_center``/``scene_radius`` are injected by make_scene
    (needs_scene_bounds), like infinite emitters.
    """

    direction: jnp.ndarray            # (3,)
    scene_center: jnp.ndarray = None  # (3,) injected
    scene_radius: jnp.ndarray = None  # ()  injected
    film: Film = static(None)
    sampler: object = static(None)
    id: str = static("distant")

    needs_scene_bounds = True

    def __post_init__(self):
        if self.film is None:
            object.__setattr__(self, "film", Film(width=1, height=1))
        if self.sampler is None:
            from .samplers import IndependentSampler

            object.__setattr__(self, "sampler", IndependentSampler())
        if self.scene_center is None:
            object.__setattr__(self, "scene_center", jnp.zeros(3))
        if self.scene_radius is None:
            object.__setattr__(self, "scene_radius", jnp.asarray(1.0))

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        d = normalize(jnp.broadcast_to(
            self.direction, position_sample.shape[:-1] + (3,)))
        from ..core.math import coordinate_system

        s, t = coordinate_system(d)
        # film position -> offset on the perpendicular disk-bounding square
        off = (position_sample * 2.0 - 1.0) * self.scene_radius
        o = (self.scene_center[None, :]
             - d * (2.0 * self.scene_radius)
             + s * off[..., 0:1] + t * off[..., 1:2])
        ray = Ray.make(o, d, time=time)
        weight = jnp.ones(d.shape[:-1] + (3,))
        return ray, weight

    def sample_direction(self, ref_p, sample2, active):
        """Delta direction: light tracing cannot connect (pdf = 0)."""
        from ..core.records import DirectionSample

        n = ref_p.shape[0]
        z3 = jnp.zeros((n, 3))
        ds = DirectionSample(
            p=z3, n=z3, uv=jnp.zeros((n, 2)), d=z3,
            dist=jnp.zeros((n,)), pdf=jnp.zeros((n,)),
            delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, jnp.zeros((n, 3))


def sample_ray_differential(sensor, time, wavelength_sample,
                            position_sample, aperture_sample):
    """Primary ray + one-pixel-offset neighbor rays (the reference's
    default Sensor::sample_ray_differential, sensor.cpp — two extra
    sample_ray calls at +1px in x and y with the same aperture and
    wavelength samples).  Returns (RayDifferential, weight)."""
    from ..core.records import RayDifferential

    film = sensor.film
    dx = jnp.asarray([1.0 / film.width, 0.0])
    dy = jnp.asarray([0.0, 1.0 / film.height])
    ray, weight = sensor.sample_ray(time, wavelength_sample,
                                    position_sample, aperture_sample)
    ray_x, _ = sensor.sample_ray(time, wavelength_sample,
                                 position_sample + dx, aperture_sample)
    ray_y, _ = sensor.sample_ray(time, wavelength_sample,
                                 position_sample + dy, aperture_sample)
    rd = RayDifferential(ray=ray, o_x=ray_x.o, d_x=ray_x.d,
                         o_y=ray_y.o, d_y=ray_y.d)
    return rd, weight

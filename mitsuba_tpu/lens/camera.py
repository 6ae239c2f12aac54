"""Realistic multi-element lens camera.

Reference: src/sensors/realisticlens.cpp:825-2420 [FORK]
RealisticLensCamera — sequential surface tracing film->world and
world->film, exit-pupil LUT importance sampling, thick-lens autofocus via
cardinal points, and NEE-to-sensor sampling for particle tracing.

TPU design: the interface stack is a static tuple, so
``trace_ray_from_film`` is a fixed-length Python loop over batched pure
functions (the reference's per-interface loop at realisticlens.cpp:1654
maps to N fused kernels; no dynamic dispatch).  All constructor-time work
(autofocus paraxial traces, exit-pupil LUT over QMC ray batches) runs the
same jitted batched code at build time.

Conventions (matching the reference):
- camera space: film plane at z=0 spanning [-hx,hx]x[-hy,hy], optical
  axis +z toward the scene; lens interfaces at z>0;
- film sample (u,v) in [0,1)^2 maps to physical film point
  ((2u-1)hx, (2v-1)hy): the lens inverts the image, so this yields the
  same on-screen orientation as the perspective camera;
- ``diagonal`` (film physical diagonal, meters) sets hx/hy
  (film.h:193 get_physical_size).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core import qmc
from ..core.math import dot, normalize
from ..core.pytree import pytree, static
from ..core.records import Ray
from ..core import transform as tf
from ..core.spectrum import rgb_response_flat, sample_wavelength_visible
from ..models.film import Film
from .designs import build_design
from .elements import offset_element

INF = jnp.float32(jnp.inf)
NOMINAL_LAMBDA_NM = 589.3


def film_half_extents(diagonal, width, height):
    """Physical half-extents (hx, hy) from the diagonal (film.h:193)."""
    aspect = height / width
    x = float(np.sqrt(diagonal**2 / (1.0 + aspect**2)))
    return x / 2.0, aspect * x / 2.0


@pytree
class RealisticLensCamera:
    interfaces: tuple                  # rear (film side) -> front (world)
    to_world: jnp.ndarray              # (4, 4)
    pupil_min: jnp.ndarray             # (S, 2) exit-pupil bbox mins (or zeros)
    pupil_max: jnp.ndarray             # (S, 2)
    film_z_position: jnp.ndarray       # () hypercentric film offset
    film: Film = static(None)
    sampler: object = static(None)
    diagonal: float = static(0.035)    # film physical diagonal (m)
    near_clip: float = static(1e-2)
    far_clip: float = static(1e4)
    sample_exit_pupil: bool = static(False)
    spectral: bool = static(False)
    shutter_open_time: float = static(1.0)
    id: str = static("realisticlens")

    needs_aperture_sample = True

    # ------------------------------------------------------------- helpers

    @property
    def rear_z(self):
        return self.interfaces[0].z_intercept

    @property
    def rear_radius(self):
        return self.interfaces[0].element_radius

    def _half_extents(self):
        return film_half_extents(self.diagonal, self.film.width,
                                 self.film.height)

    def film_diagonal_half(self):
        hx, hy = self._half_extents()
        return float(np.sqrt(hx * hx + hy * hy))

    # ------------------------------------------------------------ tracing

    def trace_ray_from_film(self, ray: Ray, active=None):
        """Sequential surface trace, rear -> front
        (realisticlens.cpp:1654)."""
        if active is None:
            active = jnp.ones(ray.o.shape[:-1], bool)
        cur = ray
        for iface in self.interfaces:
            nxt, ok = iface.compute_interaction(cur, active)
            # park dead lanes: keep previous ray (values unused when masked)
            cur = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    ok.reshape(ok.shape + (1,) * (a.ndim - ok.ndim)), a, b
                ), nxt, cur,
            )
            active = active & ok
        return cur, active

    def trace_ray_from_world(self, ray: Ray, active=None):
        """Reverse trace, front -> rear (realisticlens.cpp:1960)."""
        if active is None:
            active = jnp.ones(ray.o.shape[:-1], bool)
        cur = ray
        for iface in reversed(self.interfaces):
            nxt, ok = iface.compute_interaction(cur, active)
            cur = jax.tree_util.tree_map(
                lambda a, b: jnp.where(
                    ok.reshape(ok.shape + (1,) * (a.ndim - ok.ndim)), a, b
                ), nxt, cur,
            )
            active = active & ok
        return cur, active

    # ----------------------------------------------------------- sampling

    def sample_wavelengths(self, wavelength_sample):
        """Per-lane hero wavelength + RGB response weight."""
        if not self.spectral:
            n = wavelength_sample.shape[0]
            return (jnp.zeros((n, 0)),
                    jnp.ones((n, 3)))
        lam, pdf = sample_wavelength_visible(wavelength_sample)
        weight = rgb_response_flat(lam) / jnp.maximum(pdf, 1e-12)[..., None]
        return lam[..., None], weight

    def _sample_exit_pupil(self, film_p, aperture_sample):
        """LUT-based rear-plane sample (realisticlens.cpp:1812).
        Returns (p_rear (N,3), bounds_area (N,))."""
        n_seg = self.pupil_min.shape[0]
        r_film = jnp.sqrt(film_p[..., 0] ** 2 + film_p[..., 1] ** 2)
        idx = jnp.clip(
            jnp.floor(
                r_film / self.film_diagonal_half() * n_seg
            ).astype(jnp.int32),
            0, n_seg - 1,
        )
        mn = self.pupil_min[idx]
        mx = self.pupil_max[idx]
        area = jnp.prod(mx - mn, axis=-1)
        p = mn + (mx - mn) * aperture_sample
        safe = r_film > 0.0
        inv_r = jnp.where(safe, 1.0 / jnp.maximum(r_film, 1e-20), 0.0)
        sin_t = jnp.where(safe, film_p[..., 1] * inv_r, 0.0)
        cos_t = jnp.where(safe, film_p[..., 0] * inv_r, 1.0)
        p_rear = jnp.stack(
            [
                cos_t * p[..., 0] - sin_t * p[..., 1],
                sin_t * p[..., 0] + cos_t * p[..., 1],
                jnp.broadcast_to(self.rear_z, r_film.shape),
            ],
            axis=-1,
        )
        return p_rear, area

    def _sample_rear_element(self, film_p, aperture_sample):
        """Uniform disk on the rear element (realisticlens.cpp:1870)."""
        from ..core import warp

        p2 = self.rear_radius * warp.square_to_uniform_disk_concentric(
            aperture_sample
        )
        z = jnp.broadcast_to(self.rear_z, p2.shape[:-1] + (1,))
        area = jnp.pi * self.rear_radius**2
        return (
            jnp.concatenate([p2, z], axis=-1),
            jnp.broadcast_to(area, p2.shape[:-1]),
        )

    def sample_ray(self, time, wavelength_sample, position_sample,
                   aperture_sample):
        """Film sample -> pupil -> lens trace -> world ray
        (realisticlens.cpp:2209-2292)."""
        n = position_sample.shape[0]
        wavelengths, weight = self.sample_wavelengths(wavelength_sample)

        hx, hy = self._half_extents()
        film_p = jnp.stack(
            [
                (2.0 * position_sample[..., 0] - 1.0) * hx,
                (2.0 * position_sample[..., 1] - 1.0) * hy,
                jnp.zeros(n),
            ],
            axis=-1,
        )

        if self.sample_exit_pupil:
            aperture_p, bounds_area = self._sample_exit_pupil(
                film_p, aperture_sample
            )
        else:
            aperture_p, bounds_area = self._sample_rear_element(
                film_p, aperture_sample
            )

        d = normalize(aperture_p - film_p)
        ray = Ray(o=film_p, d=d, maxt=jnp.full((n,), INF), time=time,
                  wavelengths=wavelengths)
        out, active = self.trace_ray_from_film(ray)
        d_local = out.d

        # camera -> world
        o = out.o.at[..., 2].add(self.film_z_position)
        o = tf.apply_point(self.to_world, o)
        d_world = tf.apply_vector(self.to_world, d_local)

        inv_z = 1.0 / jnp.where(jnp.abs(d_local[..., 2]) > 1e-12,
                                d_local[..., 2], 1.0)
        o = o + d_world * (self.near_clip * inv_z)[..., None]
        maxt = (self.far_clip - self.near_clip) * inv_z

        if self.sample_exit_pupil:
            w = self.shutter_open_time * bounds_area / jnp.maximum(
                self.rear_z**2, 1e-20
            )
        else:
            ct = d_local[..., 2]
            w = ct**4  # cos^4 falloff (realisticlens.cpp:2283)
        weight = weight * jnp.where(active, w, 0.0)[..., None]

        return (
            Ray(o=o, d=d_world, maxt=maxt, time=time,
                wavelengths=wavelengths),
            weight,
        )

    def sample_direction(self, ref_p, sample2, active=None):
        """NEE toward the sensor (realisticlens.cpp:2301-2394): sample the
        front plane, trace world->film, return (DirectionSample-like dict,
        importance (N,3))."""
        from ..core import warp
        from ..core.records import DirectionSample

        n = ref_p.shape[0]
        if active is None:
            active = jnp.ones((n,), bool)
        inv_w = tf.inverse(self.to_world)
        local_ref = tf.apply_point(inv_w, ref_p)
        ok = active & (local_ref[..., 2] >= self.near_clip) & (
            local_ref[..., 2] <= self.far_clip
        )

        front = self.interfaces[-1]
        front_radius = front.element_radius
        front_z = front.z_intercept
        p2 = warp.square_to_uniform_disk_concentric(sample2) * front_radius
        aperture_p = jnp.concatenate(
            [p2, jnp.broadcast_to(front_z, (n, 1))], axis=-1
        )

        dir_ap2ref = local_ref - aperture_p
        dist = jnp.sqrt(jnp.maximum(dot(dir_ap2ref, dir_ap2ref), 1e-20))
        dir_ap2ref = dir_ap2ref / dist[..., None]

        world_ray = Ray.make(local_ref, -dir_ap2ref)
        out, traced = self.trace_ray_from_world(world_ray, ok)
        ok = ok & traced

        # intersect the output ray with the film plane z=0
        t_film = -out.o[..., 2] / jnp.where(
            jnp.abs(out.d[..., 2]) > 1e-12, out.d[..., 2], 1.0
        )
        p_film = out.o + out.d * t_film[..., None]
        hx, hy = self._half_extents()
        u = (p_film[..., 0] / hx + 1.0) * 0.5
        v = (p_film[..., 1] / hy + 1.0) * 0.5
        ok = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)

        normalization = 1.0 / (4.0 * hx * hy)
        ct_film = -out.d[..., 2]
        ok = ok & (jnp.abs(ct_film) > 1e-6)
        inv_ct = 1.0 / jnp.where(ok, ct_film, 1.0)
        value = jnp.where(
            ok, normalization * inv_ct**4 * self.rear_z**2, 0.0
        )

        aperture_pdf = 1.0 / (jnp.pi * front_radius**2)
        ct_ref = dir_ap2ref[..., 2]
        pdf = jnp.where(
            ok,
            aperture_pdf * dist * dist / jnp.maximum(ct_ref, 1e-9),
            0.0,
        )
        p_world = tf.apply_point(self.to_world, aperture_p)
        d_out = (p_world - ref_p) / dist[..., None]
        ds = DirectionSample(
            p=p_world,
            n=tf.apply_vector(self.to_world,
                              jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                               (n, 3))),
            uv=jnp.stack([u * self.film.width, v * self.film.height],
                         axis=-1),
            d=d_out,
            dist=dist,
            pdf=pdf,
            delta=jnp.zeros((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        imp = (value / (dist * dist) * ct_ref)[..., None]
        return ds, jnp.where(ok[..., None], imp, 0.0) * jnp.ones((n, 3))


# -------------------------------------------------------------- build-time

def _paraxial_trace(camera, r, from_world):
    """Single paraxial ray trace on shape-(1,) arrays; returns (start, end,
    active)."""
    if from_world:
        o = jnp.asarray([[r, 0.0, 0.0]])
        o = o.at[0, 2].set(camera.interfaces[-1].z_intercept + 1.0)
        d = jnp.asarray([[0.0, 0.0, -1.0]])
    else:
        o = jnp.asarray([[r, 0.0, 0.0]])
        o = o.at[0, 2].set(camera.interfaces[0].z_intercept - 1.0)
        d = jnp.asarray([[0.0, 0.0, 1.0]])
    lam = (jnp.full((1, 1), NOMINAL_LAMBDA_NM) if camera.spectral
           else jnp.zeros((1, 0)))
    ray = Ray(o=o, d=d, maxt=jnp.full((1,), INF), time=jnp.zeros((1,)),
              wavelengths=lam)
    if from_world:
        out, active = camera.trace_ray_from_world(ray)
    else:
        out, active = camera.trace_ray_from_film(ray)
    return ray, out, active


def _cardinal_points(start, end):
    """(principal plane z, focal point z) from a paraxial trace
    (realisticlens.cpp:2107)."""
    t_focus = -end.o[0, 0] / end.d[0, 0]
    z_f = (end.o + end.d * t_focus)[0, 2]
    t_plane = (start.o[0, 0] - end.o[0, 0]) / end.d[0, 0]
    z_p = (end.o + end.d * t_plane)[0, 2]
    return z_p, z_f


def thick_lens_approximation(camera):
    """(back_plane_z, back_focal_length, front_plane_z, front_focal_length)
    (realisticlens.cpp:2115)."""
    hx, _ = camera._half_extents()
    r = 0.001 * 2.0 * hx
    start_w, end_w, ok_w = _paraxial_trace(camera, r, from_world=True)
    p_img, f_img_pt = _cardinal_points(start_w, end_w)
    back_plane, back_f = p_img, p_img - f_img_pt
    start_f, end_f, ok_f = _paraxial_trace(camera, r, from_world=False)
    p_obj, f_obj_pt = _cardinal_points(start_f, end_f)
    front_plane, front_f = p_obj, f_obj_pt - p_obj
    return (float(back_plane), float(back_f), float(front_plane),
            float(front_f), bool(ok_w[0]) and bool(ok_f[0]))


def focus_thick_lens(camera, focus_distance):
    """Axial shift focusing the lens at ``focus_distance``
    (realisticlens.cpp:2161)."""
    p_img, f_img, p_obj, f_obj, ok = thick_lens_approximation(camera)
    if not ok or not np.isfinite(f_img):
        return 0.0
    tmp = max(focus_distance, 4.01 * f_img) - p_obj
    disc = (p_img + tmp) ** 2 - 4.0 * f_img * (p_img + tmp)
    if disc < 0:
        return 0.0
    delta = 0.5 * (p_img - tmp + np.sqrt(disc))
    return float(delta) if np.isfinite(delta) else 0.0


def compute_exit_pupil_lut(camera, n_segments: int = 64,
                           rays_per_segment: int = 1 << 18):
    """Exit-pupil bounding boxes per radial film segment
    (realisticlens.cpp:1685-1809): batched QMC rays film->world; bbox of
    transmitted rear-plane points."""
    rear_radius = float(camera.rear_radius) * 1.5
    rear_z = float(camera.rear_z)
    diag = camera.film_diagonal_half()
    i = jnp.arange(rays_per_segment, dtype=jnp.int32)
    u = qmc.radical_inverse_2(i)
    v = qmc.radical_inverse(3, i)
    w = qmc.radical_inverse(5, i)

    @jax.jit
    def bound_segment(r0, r1):
        x_film = r0 + (r1 - r0) * (i.astype(jnp.float32) + 0.5) / rays_per_segment
        p_film = jnp.stack(
            [x_film, jnp.zeros_like(x_film), jnp.zeros_like(x_film)], axis=-1
        )
        px = -rear_radius + 2.0 * rear_radius * u
        py = -rear_radius + 2.0 * rear_radius * v
        p_rear = jnp.stack([px, py, jnp.full_like(px, rear_z)], axis=-1)
        if camera.spectral:
            lam = (380.0 + (700.0 - 380.0) * w)[:, None]
        else:
            lam = jnp.zeros((rays_per_segment, 0))
        d = normalize(p_rear - p_film)
        ray = Ray(o=p_film, d=d, maxt=jnp.full((rays_per_segment,), INF),
                  time=jnp.zeros((rays_per_segment,)), wavelengths=lam)
        _, ok = camera.trace_ray_from_film(ray)
        big = jnp.float32(1e9)
        pts = jnp.stack([px, py], axis=-1)
        mn = jnp.min(jnp.where(ok[:, None], pts, big), axis=0)
        mx = jnp.max(jnp.where(ok[:, None], pts, -big), axis=0)
        n_ok = jnp.sum(ok)
        return mn, mx, n_ok

    mins, maxs = [], []
    spacing = 4.0 * rear_radius * np.sqrt(2.0 / rays_per_segment)
    for s in range(n_segments):
        r0 = s * diag / n_segments
        r1 = (s + 1) * diag / n_segments
        mn, mx, n_ok = bound_segment(r0, r1)
        mn, mx = np.asarray(mn), np.asarray(mx)
        if int(n_ok) == 0:
            mn = np.array([-rear_radius, -rear_radius], np.float32)
            mx = np.array([rear_radius, rear_radius], np.float32)
        mins.append(mn - spacing)
        maxs.append(mx + spacing)
    return jnp.asarray(np.stack(mins)), jnp.asarray(np.stack(maxs))


def make_lens_camera(lens_design: str = "singlet", to_world=None,
                     film: Film | None = None, sampler=None,
                     diagonal: float = 0.035, focus_distance: float = 6.0,
                     sample_exit_pupil: bool = False, spectral: bool = False,
                     near_clip: float = 1e-2, far_clip: float = 1e4,
                     pupil_segments: int = 64,
                     pupil_rays_per_segment: int = 1 << 16,
                     **design_kw):
    """Build + autofocus + (optionally) LUT a RealisticLensCamera
    (ctor flow, realisticlens.cpp:832-933)."""
    film = film or Film()
    if sampler is None:
        from ..models.samplers import IndependentSampler

        sampler = IndependentSampler()
    if to_world is None:
        to_world = jnp.eye(4)

    interfaces, film_z, fine_focus = build_design(lens_design, **design_kw)
    n_seg = pupil_segments
    cam = RealisticLensCamera(
        interfaces=interfaces,
        to_world=jnp.asarray(to_world, jnp.float32),
        pupil_min=jnp.zeros((n_seg, 2)),
        pupil_max=jnp.zeros((n_seg, 2)),
        film_z_position=jnp.asarray(film_z, jnp.float32),
        film=film,
        sampler=sampler,
        diagonal=diagonal,
        near_clip=near_clip,
        far_clip=far_clip,
        sample_exit_pupil=sample_exit_pupil,
        spectral=spectral,
    )

    if fine_focus:
        delta = focus_thick_lens(cam, focus_distance)
        cam = cam.replace(
            interfaces=tuple(
                offset_element(e, -delta) for e in cam.interfaces
            )
        )

    if sample_exit_pupil:
        mn, mx = compute_exit_pupil_lut(
            cam, n_segments=n_seg, rays_per_segment=pupil_rays_per_segment
        )
        cam = cam.replace(pupil_min=mn, pupil_max=mx)
    return cam


def make_realistic_lens_camera(d: dict, film, sampler):
    """Dict-loader hook (utils/load.py 'realisticlens' sensor type)."""
    w = d.get("to_world")
    return make_lens_camera(
        lens_design=d.get("lens_design", "singlet"),
        to_world=None if w is None else jnp.asarray(np.asarray(w, np.float32)),
        film=film,
        sampler=sampler,
        diagonal=0.001 * float(d.get("diagonal_mm", 35.0)),
        focus_distance=float(d.get("object_distance", 6.0)),
        sample_exit_pupil=bool(d.get("sample_exit_pupil", False)),
        spectral=bool(d.get("spectral", False)),
        near_clip=float(d.get("near_clip", 1e-2)),
        far_clip=float(d.get("far_clip", 1e4)),
        object_distance=float(d.get("object_distance", 6.0)),
        lens_focal_length=float(d.get("lens_focal_length", 0.05)),
        lens_diameter=float(d.get("lens_diameter", 0.01)),
        ap_size=float(d.get("ap_size", 1.0)),
        ap_offset=float(d.get("ap_offset", 2.0)),
    )

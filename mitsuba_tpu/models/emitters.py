"""Emitter plugins (reference: src/emitters/{area,point,constant,
directional,directionalarea}.cpp + Endpoint interface endpoint.h:95-314).

Each emitter provides:
- ``eval(si, active)``: emitted radiance toward ``si.wi`` (for BSDF-sampled
  hits / MIS);
- ``sample_direction(ref_p, sample1, sample2, geom)``: NEE sample toward the
  emitter, solid-angle measure, returning (DirectionSample, Le/pdf);
- ``pdf_direction(ref_p, ds, geom)``: solid-angle pdf of that strategy.

Geometry-bound emitters (area) receive their mesh data through a ``geom``
tuple (vertices, faces, face_distr) owned by the Scene — emitter records
stay small parameter pytrees, and the scene applies lane masks over the
static emitter set (vcall equivalent).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.pytree import pytree, static
from ..core import warp
from ..core.math import dot, normalize, Frame, safe_div
from ..core.records import DirectionSample


@pytree
class AreaEmitter:
    """Diffuse area light attached to a shape (src/emitters/area.cpp)."""

    radiance: object  # texture
    shape_index: int = static(-1)
    id: str = static("area")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = False
    is_infinite = False

    def eval(self, si, active):
        # emits from the front side (local frame cos > 0)
        front = Frame.cos_theta(si.wi) > 0.0
        val = self.radiance.eval(si)
        return jnp.where((active & front)[..., None], val, 0.0)

    def sample_direction(self, ref_p, sample1, sample2, geom):
        mesh, face_distr = geom
        from .analytic import SphereGeom

        if isinstance(mesh, SphereGeom):
            return self._sample_direction_sphere(ref_p, mesh, sample2)
        ps = mesh.sample_position(sample1, sample2, face_distr)
        delta = ps.p - ref_p
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        dist = jnp.sqrt(dist2)
        d = delta / dist[..., None]
        cos_emitter = -dot(d, ps.n)
        # area pdf -> solid angle pdf
        pdf = jnp.where(
            cos_emitter > 1e-6,
            ps.pdf * dist2 / jnp.maximum(cos_emitter, 1e-6),
            0.0,
        )
        # radiance: evaluated at the sampled point (uv from barycentrics)
        si_like = _FakeSI(uv=ps.uv)
        le = self.radiance.eval(si_like)
        weight = jnp.where(
            (pdf > 0.0)[..., None], le / jnp.maximum(pdf, 1e-20)[..., None], 0.0
        )
        ds = DirectionSample(
            p=ps.p,
            n=ps.n,
            uv=ps.uv,
            d=d,
            dist=dist,
            pdf=pdf,
            delta=jnp.zeros(pdf.shape, bool),
            emitter_index=jnp.zeros(pdf.shape, jnp.int32),
        )
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom):
        mesh, face_distr = geom
        from .analytic import SphereGeom

        if isinstance(mesh, SphereGeom):
            # exact uniform-cone pdf (sphere.cpp:311-325)
            return mesh.cone_pdf_direction(ref_p, ds)
        cos_emitter = -dot(ds.d, ds.n)
        area_pdf = safe_div(1.0, mesh.surface_area())
        return jnp.where(
            cos_emitter > 1e-6,
            area_pdf * ds.dist**2 / jnp.maximum(cos_emitter, 1e-6),
            0.0,
        )

    def _sample_direction_sphere(self, ref_p, geom, sample2):
        """Exact solid-angle cone sampling toward an analytic sphere
        (sphere.cpp:236-287).  Falls back to uniform-area sampling for
        reference points inside the sphere."""
        p_c, n_c, pdf_c, outside = geom.cone_sample_direction(
            ref_p, sample2)
        # inside-the-sphere fallback: uniform position, area->sa pdf
        ps = geom.sample_position(None, sample2)
        delta_a = ps.p - ref_p
        dist2_a = jnp.maximum(jnp.sum(delta_a**2, axis=-1), 1e-12)
        cos_a = jnp.maximum(
            -jnp.sum(delta_a * ps.n, axis=-1)
            / jnp.sqrt(dist2_a), 1e-6)
        pdf_a = ps.pdf * dist2_a / cos_a

        p = jnp.where(outside[:, None], p_c, ps.p)
        n = jnp.where(outside[:, None], n_c, ps.n)
        pdf = jnp.where(outside, pdf_c, pdf_a)
        delta = p - ref_p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta**2, axis=-1), 1e-12))
        d = delta / dist[..., None]
        # uv at the sampled point: sphere parameterization
        # (phi/2pi, theta/pi) — matches AnalyticShapes._sphere_si
        theta = jnp.arccos(jnp.clip(n[..., 2], -1.0, 1.0))
        phi = jnp.arctan2(n[..., 1], n[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        uv = jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], axis=-1)
        le = self.radiance.eval(_FakeSI(uv=uv))
        weight = jnp.where(
            (pdf > 0.0)[..., None],
            le / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
        ds = DirectionSample(
            p=p, n=n, uv=uv, d=d, dist=dist, pdf=pdf,
            delta=jnp.zeros(pdf.shape, bool),
            emitter_index=jnp.zeros(pdf.shape, jnp.int32),
        )
        return ds, weight

    def eval_direction(self, ref_p, ds, geom, active):
        """Attached radiance along a detached DirectionSample — the PRB
        re-evaluation partner of sample_direction (endpoint.h eval;
        ad/integrators/prb.py:149-162 resume_grad emitter re-eval)."""
        front = -dot(ds.d, ds.n) > 1e-6
        le = self.radiance.eval(_FakeSI(uv=ds.uv))
        return jnp.where((active & front)[..., None], le, 0.0)

    def sample_position(self, time, sample2, geom):
        """(PositionSample, weight=1/pdf) — Endpoint::sample_position."""
        mesh, face_distr = geom
        ps = mesh.sample_position_reuse(sample2, face_distr)
        w = jnp.where(ps.pdf > 0.0, 1.0 / jnp.maximum(ps.pdf, 1e-20), 0.0)
        return ps, w

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom):
        """Emitter ray for particle tracing (area.cpp sample_ray):
        area-uniform position x cosine-weighted direction;
        weight = Le * pi / pdf_pos."""
        mesh, face_distr = geom
        ps = mesh.sample_position_reuse(position_sample, face_distr)
        d_local = warp.square_to_cosine_hemisphere(direction_sample)
        s, t, n = Frame.from_normal(ps.n)
        d = Frame.to_world((s, t, n), d_local)
        le = self.radiance.eval(_FakeSI(uv=ps.uv))
        weight = le * (jnp.pi / jnp.maximum(ps.pdf, 1e-20))[..., None]
        from ..core.records import Ray

        ray = Ray.make(ps.p + 1e-5 * ps.n, d, time=time)
        return ray, weight, ps


@pytree
class DirectionalAreaEmitter:
    """[FORK-workload] Collimated surface emitter: radiates only along the
    surface normal (src/emitters/directionalarea.cpp:198 — the field
    source in the lens-design workflow, design_problem.py:57-69).
    Delta in direction: cannot be hit or NEE-sampled; only particle
    tracing (sample_ray) emits from it."""

    radiance: object  # texture
    shape_index: int = static(-1)
    id: str = static("directionalarea")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = True
    is_infinite = False

    def eval(self, si, active):
        return jnp.zeros(si.uv.shape[:-1] + (3,))

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        n = ref_p.shape[0]
        ds = DirectionSample(
            p=jnp.zeros((n, 3)), n=jnp.zeros((n, 3)), uv=jnp.zeros((n, 2)),
            d=jnp.zeros((n, 3)), dist=jnp.zeros((n,)),
            pdf=jnp.zeros((n,)), delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, jnp.zeros((n, 3))

    def pdf_direction(self, ref_p, ds, geom=None):
        return jnp.zeros(ds.pdf.shape)

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        return jnp.zeros(ds.d.shape[:-1] + (3,))

    def sample_position(self, time, sample2, geom):
        mesh, face_distr = geom
        ps = mesh.sample_position_reuse(sample2, face_distr)
        w = jnp.where(ps.pdf > 0.0, 1.0 / jnp.maximum(ps.pdf, 1e-20), 0.0)
        return ps, w

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom):
        """Collimated: direction == surface normal
        (directionalarea.cpp sample_ray); weight = Le / pdf_pos."""
        mesh, face_distr = geom
        ps = mesh.sample_position_reuse(position_sample, face_distr)
        le = self.radiance.eval(_FakeSI(uv=ps.uv))
        weight = le / jnp.maximum(ps.pdf, 1e-20)[..., None]
        from ..core.records import Ray

        ray = Ray.make(ps.p + 1e-5 * ps.n, ps.n, time=time)
        return ray, weight, ps


@pytree
class PointEmitter:
    """Isotropic point light (src/emitters/point.cpp)."""

    intensity: jnp.ndarray  # (3,)
    position: jnp.ndarray   # (3,)
    id: str = static("point")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = True
    is_infinite = False

    def eval(self, si, active):
        return jnp.zeros(si.uv.shape[:-1] + (3,))

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        delta = self.position - ref_p
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        dist = jnp.sqrt(dist2)
        d = delta / dist[..., None]
        n = ref_p.shape[0]
        weight = self.intensity / dist2[..., None]
        ds = DirectionSample(
            p=jnp.broadcast_to(self.position, ref_p.shape),
            n=-d,
            uv=jnp.zeros((n, 2)),
            d=d,
            dist=dist,
            pdf=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom=None):
        return jnp.zeros(ds.pdf.shape)

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        d2 = jnp.maximum(ds.dist * ds.dist, 1e-12)
        w = self.intensity / d2[..., None]
        return jnp.where(active[..., None], w, 0.0) if active is not None else w

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom=None):
        """Uniform-sphere emission; weight = 4*pi*I (point.cpp)."""
        n = direction_sample.shape[0]
        d = warp.square_to_uniform_sphere(direction_sample)
        from ..core.records import PositionSample, Ray

        p = jnp.broadcast_to(self.position, (n, 3))
        ray = Ray.make(p, d, time=time)
        weight = jnp.broadcast_to(
            4.0 * jnp.pi * self.intensity, (n, 3)
        )
        ps = PositionSample(
            p=p, n=d, uv=jnp.zeros((n, 2)), pdf=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
        )
        return ray, weight, ps


@pytree
class ConstantEmitter:
    """Uniform environment radiance (src/emitters/constant.cpp).

    ``scene_radius``/``scene_center`` are set at scene build so sampled
    points lie outside all geometry.
    """

    radiance: jnp.ndarray      # (3,)
    scene_center: jnp.ndarray  # (3,)
    scene_radius: jnp.ndarray  # ()
    id: str = static("constant")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = False
    is_infinite = True

    def eval_env(self, d, active):
        """Radiance for escaped rays with direction d."""
        return jnp.where(
            active[..., None],
            jnp.broadcast_to(self.radiance, d.shape[:-1] + (3,)),
            0.0,
        )

    def eval(self, si, active):
        return self.eval_env(-si.wi_world() if hasattr(si, "wi_world") else si.uv, active)

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        d = warp.square_to_uniform_sphere(sample2)
        r = 2.0 * self.scene_radius
        p = ref_p + d * r
        n = ref_p.shape[0]
        pdf = jnp.full((n,), warp.INV_FOUR_PI)
        weight = jnp.broadcast_to(
            self.radiance / warp.INV_FOUR_PI, (n, 3)
        )
        ds = DirectionSample(
            p=p,
            n=-d,
            uv=jnp.zeros((n, 2)),
            d=d,
            dist=jnp.full((n,), r),
            pdf=pdf,
            delta=jnp.zeros((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom=None):
        return jnp.full(ds.pdf.shape, warp.INV_FOUR_PI)

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        le = jnp.broadcast_to(self.radiance, ds.d.shape[:-1] + (3,))
        return jnp.where(active[..., None], le, 0.0) if active is not None else le

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom=None):
        """Inward ray from the bounding sphere (constant.cpp sample_ray):
        uniform sphere position x cosine-weighted inward direction."""
        n = direction_sample.shape[0]
        r = 1.01 * self.scene_radius
        n_out = warp.square_to_uniform_sphere(position_sample)
        p = self.scene_center + r * n_out
        d_local = warp.square_to_cosine_hemisphere(direction_sample)
        s, t, nn = Frame.from_normal(-n_out)
        d = Frame.to_world((s, t, nn), d_local)
        from ..core.records import PositionSample, Ray

        ray = Ray.make(p, d, time=time)
        # weight = Le * area * pi / (pdf_pos=1/area * pdf_dir=cos/pi)... the
        # standard result: 4*pi^2*r^2*Le (constant.cpp)
        area_w = 4.0 * jnp.pi**2 * r * r
        weight = jnp.broadcast_to(self.radiance * area_w, (n, 3))
        ps = PositionSample(
            p=p, n=-n_out, uv=jnp.zeros((n, 2)),
            pdf=jnp.full((n,), 1.0 / (4.0 * jnp.pi * r * r)),
            delta=jnp.zeros((n,), bool),
        )
        return ray, weight, ps


@pytree
class DirectionalEmitter:
    """Distant collimated emitter (src/emitters/directional.cpp)."""

    irradiance: jnp.ndarray     # (3,)
    direction: jnp.ndarray      # (3,) direction the light TRAVELS
    scene_center: jnp.ndarray
    scene_radius: jnp.ndarray
    id: str = static("directional")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = True
    is_infinite = True

    def eval(self, si, active):
        return jnp.zeros(si.uv.shape[:-1] + (3,))

    def eval_env(self, d, active):
        return jnp.zeros(d.shape[:-1] + (3,))

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        d = -normalize(self.direction)
        n = ref_p.shape[0]
        r = 2.0 * self.scene_radius
        db = jnp.broadcast_to(d, (n, 3))
        ds = DirectionSample(
            p=ref_p + db * r,
            n=-db,
            uv=jnp.zeros((n, 2)),
            d=db,
            dist=jnp.full((n,), r),
            pdf=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        weight = jnp.broadcast_to(self.irradiance, (n, 3))
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom=None):
        return jnp.zeros(ds.pdf.shape)

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        le = jnp.broadcast_to(self.irradiance, ds.d.shape[:-1] + (3,))
        return jnp.where(active[..., None], le, 0.0) if active is not None else le

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom=None):
        """Collimated ray from the scene's bounding disk
        (directional.cpp sample_ray)."""
        n = direction_sample.shape[0]
        d = normalize(self.direction)
        db = jnp.broadcast_to(d, (n, 3))
        r = 1.01 * self.scene_radius
        p_disk = warp.square_to_uniform_disk_concentric(position_sample) * r
        s, t, nn = Frame.from_normal(db)
        offset = s * p_disk[..., 0:1] + t * p_disk[..., 1:2]
        p = self.scene_center - db * r + offset
        from ..core.records import PositionSample, Ray

        ray = Ray.make(p, db, time=time)
        weight = jnp.broadcast_to(
            self.irradiance * (jnp.pi * r * r), (n, 3)
        )
        ps = PositionSample(
            p=p, n=db, uv=jnp.zeros((n, 2)),
            pdf=jnp.full((n,), 1.0 / (jnp.pi * r * r)),
            delta=jnp.zeros((n,), bool),
        )
        return ray, weight, ps


class _FakeSI:
    """Minimal SI stand-in for texture eval at sampled emitter points."""

    def __init__(self, uv):
        self.uv = uv


@pytree
class EnvmapEmitter:
    """Lat-long environment map with luminance importance sampling
    (src/emitters/envmap.cpp:591, Hierarchical2D -> core/distr2d
    Marginal2D here).

    Direction convention (envmap.cpp): u = atan2(d.x, -d.z)/2pi,
    v = acos(d.y)/pi — y-up lat-long.  ``data`` is a differentiable
    (H, W, 3) leaf; the sampling table is detached.
    """

    data: jnp.ndarray          # (H, W, 3) radiance texels
    distr: object              # Marginal2D over (H, W), sin-theta weighted
    scale: jnp.ndarray         # () radiance scale
    to_world: jnp.ndarray      # (4, 4) rotation
    scene_center: jnp.ndarray
    scene_radius: jnp.ndarray
    id: str = static("envmap")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = False
    is_infinite = True

    @staticmethod
    def create(data, scale=1.0, to_world=None):
        import numpy as np
        from ..core.distr2d import Marginal2D

        data = jnp.asarray(data, jnp.float32)
        h = data.shape[0]
        lum = np.asarray(
            0.2126 * data[..., 0] + 0.7152 * data[..., 1]
            + 0.0722 * data[..., 2]
        )
        theta = (np.arange(h) + 0.5) / h * np.pi
        table = lum * np.sin(theta)[:, None] + 1e-12
        return EnvmapEmitter(
            data=data,
            distr=Marginal2D.create(table),
            scale=jnp.asarray(scale, jnp.float32),
            to_world=jnp.asarray(
                to_world if to_world is not None else jnp.eye(4), jnp.float32
            ),
            scene_center=jnp.zeros(3),
            scene_radius=jnp.asarray(1.0),
        )

    def _dir_to_uv(self, d_world):
        from ..core import transform as tf

        d = tf.apply_vector(jnp.linalg.inv(self.to_world), d_world)
        u = jnp.arctan2(d[..., 0], -d[..., 2]) * (0.5 / jnp.pi)
        u = u - jnp.floor(u)
        v = jnp.arccos(jnp.clip(d[..., 1], -1.0, 1.0)) / jnp.pi
        return jnp.stack([u, v], axis=-1)

    def _uv_to_dir(self, uv):
        from ..core import transform as tf

        phi = 2.0 * jnp.pi * uv[..., 0]
        theta = jnp.pi * uv[..., 1]
        st, ct = jnp.sin(theta), jnp.cos(theta)
        d = jnp.stack([st * jnp.sin(phi), ct, -st * jnp.cos(phi)], axis=-1)
        return tf.apply_vector(self.to_world, d), st

    def _bilinear(self, uv):
        h, w = self.data.shape[0], self.data.shape[1]
        x = uv[..., 0] * w - 0.5
        y = uv[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[..., None]
        fy = (y - y0)[..., None]
        x0i = jnp.mod(x0.astype(jnp.int32), w)
        x1i = jnp.mod(x0i + 1, w)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        d = self.data
        return (d[y0i, x0i] * (1 - fx) * (1 - fy) + d[y0i, x1i] * fx * (1 - fy)
                + d[y1i, x0i] * (1 - fx) * fy + d[y1i, x1i] * fx * fy)

    def eval_env(self, d, active):
        uv = self._dir_to_uv(d)
        val = self._bilinear(uv) * self.scale
        return jnp.where(active[..., None], val, 0.0)

    def eval(self, si, active):
        return jnp.zeros(si.uv.shape[:-1] + (3,))

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        uv, pdf_uv = self.distr.sample(sample2)
        d, st = self._uv_to_dir(uv)
        # uv-area pdf -> solid angle: dOmega = 2 pi^2 sin(theta) dA_uv
        pdf = safe_div(pdf_uv, 2.0 * jnp.pi**2 * jnp.maximum(st, 1e-6))
        le = self._bilinear(uv) * self.scale
        weight = jnp.where(
            (pdf > 0.0)[..., None], le / jnp.maximum(pdf, 1e-20)[..., None],
            0.0,
        )
        n = ref_p.shape[0]
        r = 2.0 * self.scene_radius
        ds = DirectionSample(
            p=ref_p + d * r, n=-d, uv=uv, d=d,
            dist=jnp.full((n,), 1.0) * r, pdf=pdf,
            delta=jnp.zeros((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom=None):
        uv = self._dir_to_uv(ds.d)
        st = jnp.sqrt(jnp.maximum(
            1.0 - jnp.square(jnp.cos(jnp.pi * uv[..., 1])), 1e-12))
        return safe_div(self.distr.pdf(uv),
                        2.0 * jnp.pi**2 * jnp.maximum(st, 1e-6))

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        le = self._bilinear(self._dir_to_uv(ds.d)) * self.scale
        return jnp.where(active[..., None], le, 0.0) if active is not None else le

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom=None):
        """Importance-sampled inward ray from the bounding sphere."""
        n = direction_sample.shape[0]
        uv, pdf_uv = self.distr.sample(direction_sample)
        d_out, st = self._uv_to_dir(uv)
        d = -d_out  # travel direction: from the env toward the scene
        r = 1.01 * self.scene_radius
        # position: disk perpendicular to d
        from ..core.records import PositionSample, Ray

        p_disk = warp.square_to_uniform_disk_concentric(position_sample) * r
        s, t, nn = Frame.from_normal(d)
        p = self.scene_center - d * r + s * p_disk[..., 0:1] + t * p_disk[..., 1:2]
        pdf_dir = safe_div(pdf_uv, 2.0 * jnp.pi**2 * jnp.maximum(st, 1e-6))
        le = self._bilinear(uv) * self.scale
        area = jnp.pi * r * r
        weight = le * safe_div(area, jnp.maximum(pdf_dir, 1e-20))[..., None]
        ray = Ray.make(p, d, time=time)
        ps = PositionSample(
            p=p, n=d, uv=uv, pdf=jnp.full((n,), 1.0 / area),
            delta=jnp.zeros((n,), bool),
        )
        return ray, weight, ps


@pytree
class SpotEmitter:
    """Spot light: delta position, smooth angular falloff
    (src/emitters/spot.cpp:286)."""

    intensity: jnp.ndarray      # (3,)
    position: jnp.ndarray       # (3,)
    direction: jnp.ndarray      # (3,) beam direction
    cutoff_angle: float = static(20.0)   # degrees
    beam_width: float = static(15.0)     # degrees (full intensity inside)
    id: str = static("spot")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = True
    is_infinite = False

    def _falloff(self, d_to_ref):
        """Angular falloff for light leaving toward d_to_ref."""
        import numpy as np

        cos_cut = float(np.cos(np.deg2rad(self.cutoff_angle)))
        cos_beam = float(np.cos(np.deg2rad(self.beam_width)))
        cd = dot(normalize(self.direction), d_to_ref)
        t = safe_div(cd - cos_cut, cos_beam - cos_cut)
        return jnp.clip(t, 0.0, 1.0)

    def eval(self, si, active):
        return jnp.zeros(si.uv.shape[:-1] + (3,))

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        delta = self.position - ref_p
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        dist = jnp.sqrt(dist2)
        d = delta / dist[..., None]
        fall = self._falloff(-d)
        weight = self.intensity * (fall / dist2)[..., None]
        n = ref_p.shape[0]
        ds = DirectionSample(
            p=jnp.broadcast_to(self.position, ref_p.shape), n=-d,
            uv=jnp.zeros((n, 2)), d=d, dist=dist,
            pdf=jnp.ones((n,)), delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom=None):
        return jnp.zeros(ds.pdf.shape)

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        d2 = jnp.maximum(ds.dist * ds.dist, 1e-12)
        w = self.intensity * (self._falloff(-ds.d) / d2)[..., None]
        return jnp.where(active[..., None], w, 0.0) if active is not None else w

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom=None):
        """Uniform-cone emission within the cutoff."""
        import numpy as np
        from ..core.records import PositionSample, Ray

        n = direction_sample.shape[0]
        cos_cut = float(np.cos(np.deg2rad(self.cutoff_angle)))
        d_local = warp.square_to_uniform_cone(direction_sample, cos_cut)
        frame = Frame.from_normal(normalize(self.direction))
        d = Frame.to_world(frame, d_local)
        pdf_dir = warp.square_to_uniform_cone_pdf(d_local, cos_cut)
        fall = self._falloff(d)
        p = jnp.broadcast_to(self.position, (n, 3))
        weight = self.intensity * safe_div(fall, pdf_dir)[..., None]
        ray = Ray.make(p, d, time=time)
        ps = PositionSample(
            p=p, n=d, uv=jnp.zeros((n, 2)), pdf=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
        )
        return ray, weight, ps


@pytree
class ProjectorEmitter:
    """Image projector: delta position emitting a texture through a
    perspective frustum (src/emitters/projector.cpp).

    ``irradiance``: texture projected onto the scene; ``scale`` a global
    multiplier.  Directions outside the frustum carry nothing.
    """

    irradiance: object              # texture
    position: jnp.ndarray           # (3,)
    direction: jnp.ndarray          # (3,) optical axis
    up: jnp.ndarray = None          # (3,)
    scale: jnp.ndarray = None       # ()
    fov: float = static(45.0)       # horizontal, degrees
    aspect: float = static(1.0)     # width / height
    id: str = static("projector")
    # relative selection probability (endpoint.h sampling_weight, scene.cpp:103-115)
    sampling_weight: float = static(1.0)

    is_delta = True
    is_infinite = False

    def __post_init__(self):
        if self.up is None:
            object.__setattr__(self, "up", jnp.asarray([0.0, 1.0, 0.0]))
        if self.scale is None:
            object.__setattr__(self, "scale", jnp.asarray(1.0))

    def _frame(self):
        import numpy as np

        d = normalize(self.direction)
        s = normalize(jnp.cross(self.up, d))
        t = jnp.cross(d, s)
        return s, t, d

    def _tan(self):
        import numpy as np

        tx = float(np.tan(np.deg2rad(self.fov) * 0.5))
        return tx, tx / self.aspect

    def _eval_tex(self, d_out, active):
        """Texture value for light leaving along world direction d_out."""
        s, t, dax = self._frame()
        z = dot(d_out, dax)
        x = dot(d_out, s)
        y = dot(d_out, t)
        tx, ty = self._tan()
        inside = z > 1e-6
        zi = jnp.where(inside, z, 1.0)
        u = 0.5 * (x / (zi * tx) + 1.0)
        v = 0.5 * (y / (zi * ty) + 1.0)
        inside = inside & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (v <= 1.0)
        val = self.irradiance.eval(_FakeSI(uv=jnp.stack([u, v], axis=-1)))
        ok = active & inside if active is not None else inside
        return jnp.where(ok[..., None], val * self.scale, 0.0)

    def eval(self, si, active):
        return jnp.zeros(si.uv.shape[:-1] + (3,))

    def sample_direction(self, ref_p, sample1, sample2, geom=None):
        delta = self.position - ref_p
        dist2 = jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-12)
        dist = jnp.sqrt(dist2)
        d = delta / dist[..., None]
        val = self._eval_tex(-d, None)
        weight = val / dist2[..., None]
        n = ref_p.shape[0]
        ds = DirectionSample(
            p=jnp.broadcast_to(self.position, ref_p.shape), n=-d,
            uv=jnp.zeros((n, 2)), d=d, dist=dist,
            pdf=jnp.ones((n,)), delta=jnp.ones((n,), bool),
            emitter_index=jnp.zeros((n,), jnp.int32),
        )
        return ds, weight

    def pdf_direction(self, ref_p, ds, geom=None):
        return jnp.zeros(ds.pdf.shape)

    def eval_direction(self, ref_p, ds, geom=None, active=None):
        d2 = jnp.maximum(ds.dist * ds.dist, 1e-12)
        return self._eval_tex(-ds.d, active) / d2[..., None]

    def sample_ray(self, time, wavelength_sample, direction_sample,
                   position_sample, geom=None):
        """Sample a frustum direction uniformly in image space."""
        from ..core.records import PositionSample, Ray

        n = direction_sample.shape[0]
        s, t, dax = self._frame()
        tx, ty = self._tan()
        x = (direction_sample[..., 0] * 2.0 - 1.0) * tx
        y = (direction_sample[..., 1] * 2.0 - 1.0) * ty
        d = normalize(s * x[:, None] + t * y[:, None] + dax[None, :])
        cos_theta = dot(d, dax)
        # image-plane area pdf -> solid angle: p = 1/(4 tx ty cos^3)
        a = 4.0 * tx * ty
        val = self._eval_tex(d, None)
        weight = val * (a * cos_theta ** 3)[..., None]
        p = jnp.broadcast_to(self.position, (n, 3))
        ray = Ray.make(p, d, time=time)
        ps = PositionSample(
            p=p, n=d, uv=jnp.zeros((n, 2)), pdf=jnp.ones((n,)),
            delta=jnp.ones((n,), bool),
        )
        return ray, weight, ps

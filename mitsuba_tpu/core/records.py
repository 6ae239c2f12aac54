"""SoA interaction records (reference: include/mitsuba/render/{ray.h,
interaction.h,records.h}).

Each record is a pytree dataclass whose fields are batched arrays of shape
(N, ...) — one entry per wavefront lane.  They flow through `lax.while_loop`
path state and across `shard_map` boundaries unchanged.

Key reproduced semantics:
- ``PreliminaryIntersection``: traversal returns only (t, prim_index,
  uv-barycentrics, shape_index); the *differentiable* surface interaction is
  re-derived from mesh vertices afterwards (reference shape.h:526,571 /
  mesh.cpp:1376), so geometry gradients flow without differentiating the BVH.
- ``spawn_ray`` offsets along the normal to avoid self-intersection.
"""
from __future__ import annotations

import jax.numpy as jnp

from .pytree import pytree, field
from .math import RAY_EPS, dot, normalize, Frame

INF = jnp.float32(jnp.inf)


@pytree
class Ray:
    o: jnp.ndarray        # (N, 3) origin
    d: jnp.ndarray        # (N, 3) unit direction
    maxt: jnp.ndarray     # (N,)
    time: jnp.ndarray     # (N,)
    wavelengths: jnp.ndarray  # (N, W) nm; W=0-width array in RGB mode

    @staticmethod
    def make(o, d, maxt=None, time=None, wavelengths=None):
        n = o.shape[:-1]
        if maxt is None:
            maxt = jnp.full(n, INF)
        if time is None:
            time = jnp.zeros(n)
        if wavelengths is None:
            wavelengths = jnp.zeros(n + (0,))
        return Ray(o=o, d=d, maxt=maxt, time=time, wavelengths=wavelengths)

    def at(self, t):
        return self.o + self.d * t[..., None]


@pytree
class RayDifferential:
    """Primary ray plus its one-pixel-offset neighbors (ray.h
    RayDifferential): offset rays transfer onto the hit plane to give
    texture-space footprints (compute_uv_partials)."""

    ray: Ray
    o_x: jnp.ndarray   # (N, 3) origin of the +1px-in-x ray
    d_x: jnp.ndarray   # (N, 3)
    o_y: jnp.ndarray   # (N, 3)
    d_y: jnp.ndarray   # (N, 3)


@pytree
class PreliminaryIntersection:
    t: jnp.ndarray          # (N,) hit distance (inf = miss)
    prim_index: jnp.ndarray  # (N,) global triangle/primitive index, int32
    prim_uv: jnp.ndarray    # (N, 2) barycentrics (b1, b2)
    shape_index: jnp.ndarray  # (N,) scene shape id, -1 = miss
    # instance id within the hit shape's group (models/instancing.py);
    # None unless the scene has instanced geometry (instance.cpp's
    # per-instance hit bookkeeping)
    inst_index: jnp.ndarray = None

    def is_valid(self):
        return jnp.isfinite(self.t)


@pytree
class SurfaceInteraction:
    """Differentiable surface interaction at a hit point."""

    t: jnp.ndarray          # (N,)
    p: jnp.ndarray          # (N, 3) hit position (differentiable)
    n: jnp.ndarray          # (N, 3) geometric normal
    sh_n: jnp.ndarray       # (N, 3) shading normal (frame n)
    sh_s: jnp.ndarray       # (N, 3) shading frame tangent
    sh_t: jnp.ndarray       # (N, 3) shading frame bitangent
    uv: jnp.ndarray         # (N, 2) surface parameterization
    wi: jnp.ndarray         # (N, 3) incident direction, LOCAL shading frame
    shape_index: jnp.ndarray  # (N,) int32, -1 = environment/miss
    prim_index: jnp.ndarray   # (N,) int32
    wavelengths: jnp.ndarray  # (N, W)
    time: jnp.ndarray       # (N,)
    # screen-space uv footprint (compute_uv_partials); None unless ray
    # differentials were attached (interaction.h:85 duv_dx/duv_dy)
    duv_dx: jnp.ndarray = None   # (N, 2) or None
    duv_dy: jnp.ndarray = None   # (N, 2) or None
    # instance id (models/instancing.py); None unless instanced
    inst_index: jnp.ndarray = None

    def is_valid(self):
        return self.shape_index >= 0

    @property
    def sh_frame(self):
        return (self.sh_s, self.sh_t, self.sh_n)

    def to_world(self, v):
        return Frame.to_world(self.sh_frame, v)

    def to_local(self, v):
        return Frame.to_local(self.sh_frame, v)

    def wi_world(self):
        return self.to_world(self.wi)

    def to_world_mueller(self, M_local, in_forward_local,
                         out_forward_local):
        """Convert a Mueller matrix expressed in local shading
        coordinates (implicit local-direction Stokes bases) into one
        operating on world-space implicit bases (interaction.h:374).
        M_local: (N, ..., 4, 4); rotators broadcast over channel dims."""
        from . import mueller

        in_fw = self.to_world(in_forward_local)
        out_fw = self.to_world(out_forward_local)
        in_cur = self.to_world(mueller.stokes_basis(in_forward_local))
        out_cur = self.to_world(mueller.stokes_basis(out_forward_local))
        r_in = mueller.rotate_stokes_basis(
            in_fw, in_cur, mueller.stokes_basis(in_fw))
        r_out = mueller.rotate_stokes_basis(
            out_fw, out_cur, mueller.stokes_basis(out_fw))
        extra = M_local.ndim - r_in.ndim
        for _ in range(extra):
            r_in = r_in[..., None, :, :]
            r_out = r_out[..., None, :, :]
        return r_out @ M_local @ jnp.swapaxes(r_in, -1, -2)

    def spawn_ray(self, d):
        """Offset origin along the geometric normal on the side of d."""
        sign = jnp.sign(dot(d, self.n, keepdims=True))
        scale = RAY_EPS * jnp.maximum(
            1.0, jnp.max(jnp.abs(self.p), axis=-1, keepdims=True)
        )
        o = self.p + sign * scale * self.n
        return Ray.make(
            o, d, time=self.time, wavelengths=self.wavelengths
        )

    def spawn_ray_to(self, target):
        """Shadow ray toward target with [eps, 1-eps] clipped extent."""
        delta = target - self.p
        dist = jnp.sqrt(jnp.maximum(jnp.sum(delta * delta, axis=-1), 1e-20))
        d = delta / dist[..., None]
        sign = jnp.sign(dot(d, self.n, keepdims=True))
        scale = RAY_EPS * jnp.maximum(
            1.0, jnp.max(jnp.abs(self.p), axis=-1, keepdims=True)
        )
        o = self.p + sign * scale * self.n
        maxt = dist * (1.0 - 1e-3)
        return Ray.make(o, d, maxt=maxt, time=self.time,
                        wavelengths=self.wavelengths)


@pytree
class PositionSample:
    p: jnp.ndarray      # (N, 3)
    n: jnp.ndarray      # (N, 3)
    uv: jnp.ndarray     # (N, 2)
    pdf: jnp.ndarray    # (N,) area-measure pdf
    delta: jnp.ndarray  # (N,) bool — Dirac (point emitters)


@pytree
class DirectionSample:
    """Sample of a direction toward an emitter (NEE), solid-angle measure.

    Reference: records.h DirectionSample3f.
    """

    p: jnp.ndarray        # (N, 3) point on emitter
    n: jnp.ndarray        # (N, 3) emitter normal at p
    uv: jnp.ndarray       # (N, 2)
    d: jnp.ndarray        # (N, 3) direction ref -> p (unit)
    dist: jnp.ndarray     # (N,)
    pdf: jnp.ndarray      # (N,) solid-angle pdf (0 = invalid)
    delta: jnp.ndarray    # (N,) bool
    emitter_index: jnp.ndarray  # (N,) int32


@pytree
class BSDFSample:
    """Result of BSDF importance sampling (reference: bsdf.h BSDFSample3f)."""

    wo: jnp.ndarray      # (N, 3) sampled direction, local frame
    pdf: jnp.ndarray     # (N,)
    eta: jnp.ndarray     # (N,) relative IOR along the sampled path
    delta: jnp.ndarray   # (N,) bool — specular (Dirac) lobe
    sampled_type: jnp.ndarray  # (N,) int32 BSDFFlags of the lobe

"""Pallas path-tracing megakernel for smooth-BSDF triangle scenes.

The renderer's speed-of-light mode (PERF.md item 1; the analogue of the
reference's dr::Loop megakernel path tracer, src/integrators/path.cpp):
the ENTIRE bounce loop — closest-hit, area-light NEE with shadow rays,
cosine BSDF sampling, MIS, russian roulette — runs inside ONE Pallas
kernel over (8, 128)-ray tiles.  All per-bounce state lives in
VMEM/registers; HBM traffic is O(rays + triangles) per pass instead of
the wavefront path's O(rays x shading-chain) (the 152 GB/pass HBM-bound
profile documented in PERF.md).

Scope (checked by ``megakernel_applicable``): surfaces are diffuse
(constant or small-bitmap textured), smooth conductor / dielectric,
GGX rough conductor / rough dielectric; emitters are one constant
AreaEmitter and/or one small envmap; no media/SDF.  This covers the
Cornell-box benchmark family including its metal/glass/rough/textured
variants plus environment-lit scenes; everything else falls back to
the general wavefront integrator.  The kernel specializes statically
on the BSDF set, so pure-diffuse scenes pay nothing for the extra
lobes.  Textures/envmaps live in a VMEM LUT arena fetched with
per-lane ``take_along_axis`` row sweeps; envmap NEE candidates are
precomputed per (lane, bounce) in XLA with the exact wavefront chain
(they do not depend on the shading point), keeping the sample streams
aligned.

Sampling matches the wavefront path EXACTLY: the same PCG3D counter RNG
(core/rng.py) with the same (seed, lane, dim) layout
(integrators/common.py), the same warps (concentric disk, sqrt
triangle), the same frame construction (Duff), and the same MIS/RR
arithmetic — so the megakernel image agrees with PathIntegrator's to
float rounding (tested in tests/test_megakernel.py).

Layout: rays live as (8, 128) vreg-shaped tiles (1024 rays per grid
step) so EVERY op — intersection, shading, RNG — runs at full VPU lane
utilization.  Triangles are a (F_pad, 17) row-major table; the
closest-hit loop reads one triangle per iteration as a (1, 17) dynamic
sublane slice and broadcasts (1, 1) scalars against the ray tile.  The
winning triangle's shading attributes are carried with elementwise
selects — no gathers anywhere.  Only the REAL triangle count is looped
(no block padding waste).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# Sublanes per tile for the BRUTE (SMEM-triangle-table) megakernel
# only; the BVH-family entry points below use traverse.SUB (default 16,
# MITSUBA_TPU_SUB_BVH) so the wide-packet shared walk ships without
# retiling this kernel, which was last measured at 8.
SUB = int(_os.environ.get("MITSUBA_TPU_SUB", "8"))  # sublanes per tile
LANES = 128
R_TILE = SUB * LANES    # rays per grid step
DET_EPS = 1e-9
RAY_EPS = 1e-4          # records.py RAY_EPS (spawn_ray offset scale)
MAX_FACES = 1024        # SMEM budget cap for the packed table (~68 KB)
MAX_LIGHT_FACES = 16    # static select loop per light face
INV_PI = float(1.0 / np.pi)

# must match models/integrators/common.py dimension layout
DIM_BOUNCE_BASE = 8
DIMS_PER_BOUNCE = 8
SLOT_EM_SELECT = 0
SLOT_EM_POS = 1
SLOT_BSDF_LOBE = 2
SLOT_BSDF_DIR = 3
SLOT_RR = 4

# triangle table columns:
#   0:3 p0, 3:6 e1, 6:9 e2, 9:12 reflectance, 12:15 emission,
#   15 is_light, 16 pdf_area, 17 bsdf_type (0 diffuse / 1 conductor /
#   2 dielectric), 18:21 + 21:24 type params (conductor: eta, k rgb;
#   dielectric: eta scalar in col 18)
TRI_COLS = 39     # 24:30 uv0 uv1 uv2 (textured) | 30:39 n0 n1 n2 (smooth)
BSDF_DIFFUSE = 0.0
BSDF_CONDUCTOR = 1.0
BSDF_DIELECTRIC = 2.0
BSDF_ROUGH_CONDUCTOR = 3.0
BSDF_ROUGH_DIELECTRIC = 4.0
BSDF_TEX_DIFFUSE = 5.0
BSDF_PLASTIC = 6.0
BSDF_ROUGH_PLASTIC = 7.0
# texture arena budget: channel-planar texel LUT in VMEM, fetched with
# per-lane take_along_axis row sweeps (128 texels per row)
MAX_TEX_FLOATS = 6144
MAX_ENV_TEXELS = 2048   # envmap H*W cap (RGB + pdf planes in the arena)
# env meta scalars (SMEM (1, 32)): 0:9 world->env rotation (row major),
# 9 scale, 10 W, 11 H, 12 radiance-plane offset, 13 pdf-plane offset,
# 14 pdf-table total, 15 env selection pmf, 16 area selection pmf
ENV_COLS = 32
# column 16 doubles as pdf_area (light faces) and GGX alpha (rough
# faces) — a face is never both, and _trace_loop masks each use
# light table columns: 0:3 p0, 3:6 e1, 6:9 e2, 9:12 n, 12 cdf,
#   13 pdf_area, 14:17 Le
LIGHT_COLS = 17


# ------------------------------------------------------------- RNG (PCG3D)
# In-kernel replica of core/rng.py sample_1d/sample_2d.

def _pcg3d(v0, v1, v2):
    M = jnp.uint32(1664525)
    A = jnp.uint32(1013904223)
    v0 = v0 * M + A
    v1 = v1 * M + A
    v2 = v2 * M + A
    v0 = v0 + v1 * v2
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v0 = v0 + v1 * v2
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    return v0, v1, v2


def _to_unit(bits):
    # >>8 leaves 24 bits, so the int32 hop is exact (Mosaic has no
    # direct uint32->float32 cast)
    return ((bits >> 8).astype(jnp.int32).astype(jnp.float32)
            * jnp.float32(1.0 / (1 << 24)))


def _rng2(seed_x, lane, dim):
    """seed_x: per-lane uint32 (seed ^ 0xDEADBEEF, precomputed)."""
    v0, v1, _ = _pcg3d(lane, jnp.full_like(lane, jnp.uint32(dim)), seed_x)
    return _to_unit(v0), _to_unit(v1)


def _rng1(seed_x, lane, dim):
    return _rng2(seed_x, lane, dim)[0]


# ------------------------------------------------------------ scene packing

_warned_inelig = set()


def _log_inelig(msg: str) -> bool:
    """Log (once per distinct reason) why a scene falls off a megakernel
    fast path — the eligibility cliff costs ~3-10x and used to be silent
    (round-4 verdict weak #9).  Returns False for use in return sites."""
    if msg not in _warned_inelig:
        _warned_inelig.add(msg)
        from ...utils.logging import Info, log

        log(Info, "megakernel eligibility: %s", msg)
    return False


def _plugin_subset_ok(scene, allow_tex: bool = True) -> bool:
    """Shared plugin-set gate for both megakernels: diffuse (constant
    or small-bitmap textured) / conductor / dielectric / GGX rough
    surfaces, one constant area light with few faces, no
    env/media/SDF.  ``allow_tex=False`` for the BVH variant (its leaf
    layout has no UV slots yet)."""
    from ...models.bsdfs import (
        RoughConductor,
        RoughDielectric,
        RoughPlastic,
        SmoothConductor,
        SmoothDielectric,
        SmoothDiffuse,
        SmoothPlastic,
    )
    from ...models.emitters import AreaEmitter
    from ...models.textures import ConstantTexture

    if scene.scene_medium is not None:
        return False
    if getattr(scene, "instances", ()):
        # two-level instanced geometry rides the wavefront path
        return False
    if scene.env_index >= 0:
        e = scene.emitters[scene.env_index]
        d = getattr(e, "data", None)
        if (not allow_tex or d is None
                or int(d.shape[0]) * int(d.shape[1]) > MAX_ENV_TEXELS):
            return False
    if getattr(scene, "scene_sdf", None) is not None:
        return False
    if getattr(scene, "scene_analytic", None) is not None:
        return False
    # the in-kernel PCG3D stream is the *independent* sampler's; a
    # stratified sampler would break the bit-match with the wavefront path
    smp = getattr(scene.sensor, "sampler", None)
    if smp is not None and getattr(smp, "id", "independent") != "independent":
        return False
    # up to two emitters: at most one constant-radiance AreaEmitter and
    # at most one (small) envmap
    from ...models.emitters import EnvmapEmitter

    if not 1 <= len(scene.emitters) <= 2:
        return False
    n_area = 0
    for i, e in enumerate(scene.emitters):
        if isinstance(e, AreaEmitter):
            n_area += 1
            if not isinstance(e.radiance, ConstantTexture):
                return False
            if scene.emitter_shape[i] < 0:
                return False
        elif isinstance(e, EnvmapEmitter):
            if i != scene.env_index:
                return False
        else:
            return False
    if n_area > 1 or n_area + (scene.env_index >= 0) != len(scene.emitters):
        return False
    # weighted emitter selection not mirrored in-kernel yet
    if any(float(getattr(e, "sampling_weight", 1.0)) != 1.0
           for e in scene.emitters):
        return False
    from ...models.textures import BitmapTexture

    from ...models.bsdfs import TwoSided

    tex_total = 0
    for b in scene.bsdfs:
        if isinstance(b, TwoSided):
            # twosided over a dielectric is disallowed (as in the
            # reference); the inner lobe must itself be supported
            b = b.nested
            if isinstance(b, (SmoothDielectric, RoughDielectric)):
                return False
        if isinstance(b, SmoothDiffuse):
            if isinstance(b.reflectance, BitmapTexture):
                d = b.reflectance.data
                if not allow_tex:
                    return _log_inelig(
                        "bitmap texture present but this accel variant "
                        "carries no uv resolve rows (BVH kernel needs "
                        "the MXU layout) — wavefront fallback")
                if d.ndim != 3 or d.shape[2] not in (1, 3):
                    return _log_inelig(
                        f"bitmap texture shape {tuple(d.shape)} "
                        "unsupported in-kernel (need (H,W,1) or "
                        "(H,W,3)) — wavefront fallback")
                tex_total += int(d.shape[0]) * int(d.shape[1]) * 3
                if tex_total > MAX_TEX_FLOATS:
                    return _log_inelig(
                        f"bitmap textures exceed the {MAX_TEX_FLOATS}"
                        "-float VMEM table budget — wavefront fallback")
            elif not isinstance(b.reflectance, ConstantTexture):
                return False
        elif isinstance(b, SmoothConductor):
            if b.specular_reflectance is not None:
                return False
        elif isinstance(b, SmoothDielectric):
            if (b.specular_reflectance is not None
                    or b.specular_transmittance is not None):
                return False
        elif isinstance(b, RoughConductor):
            if b.specular_reflectance is not None:
                return False
        elif isinstance(b, RoughDielectric):
            if (b.specular_reflectance is not None
                    or b.specular_transmittance is not None):
                return False
        elif isinstance(b, (SmoothPlastic, RoughPlastic)):
            if not isinstance(b.diffuse_reflectance, ConstantTexture):
                return False
        else:
            return False
    for i, e in enumerate(scene.emitters):
        shp = scene.emitter_shape[i]
        if shp >= 0:
            if int(scene.meshes[shp].faces.shape[0]) > MAX_LIGHT_FACES:
                return False
    return True


def megakernel_applicable(scene) -> bool:
    """True iff the scene fits the brute-force megakernel: supported
    plugin subset AND at most MAX_FACES triangles (SMEM table cap)."""
    if not _plugin_subset_ok(scene):
        return False
    n_faces = sum(int(m.faces.shape[0]) for m in scene.meshes)
    return n_faces <= MAX_FACES


def pack_scene(scene):
    """Packed VMEM tables (traceable — scene arrays may be tracers).

    Returns (tris (F_pad, TRI_COLS), light (8*, LIGHT_COLS), F, n_lights).
    NEE pdf of hitting a light face is uniform 1/total_light_area in area
    measure (emitters.py AreaEmitter.pdf_direction).  Face->shape wiring
    is static metadata, so the light-face set and all indices are
    host-side numpy; only coordinates/colors are traced.
    """
    v, f, n_all, uv_all, _fs, _fsmooth = scene.geometry()
    v = jax.lax.stop_gradient(v)
    n_all = jax.lax.stop_gradient(n_all)
    F = int(f.shape[0])
    F_pad = -(-F // SUB) * SUB

    from ...models.emitters import AreaEmitter

    counts = [int(m.faces.shape[0]) for m in scene.meshes]
    # per-face smooth flag from static mesh metadata (host-side: the
    # traced fsmooth from geometry() would not survive np.asarray under jit)
    fsm = np.repeat(
        np.asarray([m.normals is not None for m in scene.meshes], bool),
        counts) if counts else np.zeros((0,), bool)
    fshape = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    bsdf_idx = np.asarray(scene.shape_bsdf, np.int32)[fshape]
    area_idx = next((i for i, e in enumerate(scene.emitters)
                     if isinstance(e, AreaEmitter)), -1)
    is_light_np = (np.asarray(scene.shape_emitter, np.int32)[fshape]
                   == area_idx) & (area_idx >= 0)
    light_faces = np.nonzero(is_light_np)[0]
    L = len(light_faces)
    assert L <= MAX_LIGHT_FACES

    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0

    # per-BSDF rows: [refl(3) | type(1) | params(6) | alpha(1)]
    from ...models.bsdfs import (RoughConductor, RoughDielectric,
                                 RoughPlastic, SmoothConductor,
                                 SmoothDielectric, SmoothPlastic,
                                 _fdr_fit)

    from ...models.textures import BitmapTexture

    from ...models.bsdfs import TwoSided

    rows = []
    tex_planes = []
    tex_off = 0
    for b in scene.bsdfs:
        ts_off = 0.0
        if isinstance(b, TwoSided):
            b = b.nested
            ts_off = 16.0   # twosided.cpp wrapper: +16 on the type code
        if (hasattr(b, "reflectance")
                and isinstance(getattr(b, "reflectance", None),
                               BitmapTexture)):
            t = b.reflectance
            H, W = int(t.data.shape[0]), int(t.data.shape[1])
            # channel-planar: R plane | G plane | B plane; grayscale
            # (H,W,1) broadcasts to three identical planes so the
            # kernel keeps its fixed RGB layout
            td = t.data
            if td.shape[2] == 1:
                td = jnp.broadcast_to(td, (H, W, 3))
            tex_planes.append(
                jnp.transpose(td, (2, 0, 1)).reshape(-1))
            rows.append(jnp.concatenate([
                jnp.ones(3), jnp.asarray([BSDF_TEX_DIFFUSE]),
                jnp.asarray([float(tex_off), float(W), float(H),
                             1.0 if t.filter_nearest else 0.0,
                             1.0 if t.wrap_repeat else 0.0, 0.0]),
                jnp.zeros(1),
            ]))
            tex_off += 3 * H * W
        elif isinstance(b, SmoothPlastic):
            rows.append(jnp.concatenate([
                jnp.asarray(b.diffuse_reflectance.value,
                            jnp.float32).reshape(3),
                jnp.asarray([BSDF_PLASTIC]),
                jnp.asarray(b.eta, jnp.float32).reshape(1),
                _fdr_fit(jnp.asarray(b.eta, jnp.float32)).reshape(1),
                jnp.asarray([1.0 if b.nonlinear else 0.0]),
                jnp.zeros(3), jnp.zeros(1),
            ]))
        elif isinstance(b, RoughPlastic):
            rows.append(jnp.concatenate([
                jnp.asarray(b.diffuse_reflectance.value,
                            jnp.float32).reshape(3),
                jnp.asarray([BSDF_ROUGH_PLASTIC]),
                jnp.asarray(b.eta, jnp.float32).reshape(1),
                _fdr_fit(jnp.asarray(b.eta, jnp.float32)).reshape(1),
                jnp.asarray([1.0 if b.nonlinear else 0.0]),
                jnp.zeros(3),
                jnp.asarray(b.alpha, jnp.float32).reshape(1),
            ]))
        elif isinstance(b, RoughDielectric):
            rows.append(jnp.concatenate([
                jnp.zeros(3), jnp.asarray([BSDF_ROUGH_DIELECTRIC]),
                jnp.asarray(b.eta, jnp.float32).reshape(1), jnp.zeros(5),
                jnp.asarray(b.alpha, jnp.float32).reshape(1),
            ]))
        elif isinstance(b, RoughConductor):
            rows.append(jnp.concatenate([
                jnp.zeros(3), jnp.asarray([BSDF_ROUGH_CONDUCTOR]),
                jnp.asarray(b.eta, jnp.float32).reshape(3),
                jnp.asarray(b.k, jnp.float32).reshape(3),
                jnp.asarray(b.alpha, jnp.float32).reshape(1),
            ]))
        elif isinstance(b, SmoothConductor):
            rows.append(jnp.concatenate([
                jnp.zeros(3), jnp.asarray([BSDF_CONDUCTOR]),
                jnp.asarray(b.eta, jnp.float32).reshape(3),
                jnp.asarray(b.k, jnp.float32).reshape(3), jnp.zeros(1),
            ]))
        elif isinstance(b, SmoothDielectric):
            rows.append(jnp.concatenate([
                jnp.zeros(3), jnp.asarray([BSDF_DIELECTRIC]),
                jnp.asarray(b.eta, jnp.float32).reshape(1), jnp.zeros(6),
            ]))
        else:
            rows.append(jnp.concatenate([
                jnp.asarray(b.reflectance.value, jnp.float32).reshape(3),
                jnp.asarray([BSDF_DIFFUSE]), jnp.zeros(7),
            ]))
        if ts_off:
            rows[-1] = rows[-1].at[3].add(ts_off)
    bsdf_tab = jnp.stack(rows)                    # (n_bsdf, 11)
    per_face = bsdf_tab[jnp.asarray(bsdf_idx)]    # (F, 11)
    refl = per_face[:, 0:3]
    btype = per_face[:, 3:4]
    bparams = per_face[:, 4:10]
    alpha_face = per_face[:, 10]
    le = (jnp.asarray(scene.emitters[area_idx].radiance.value,
                      jnp.float32)
          if area_idx >= 0 else jnp.zeros(3))
    is_light = jnp.asarray(is_light_np, jnp.float32)
    emission = is_light[:, None] * le[None, :]

    la = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(
        jnp.cross(e1[light_faces], e2[light_faces]) ** 2, axis=-1), 1e-30))
    total_la = jnp.maximum(jnp.sum(la), 1e-20)
    # col 16: pdf_area on light faces, GGX alpha elsewhere (a face is
    # never both; _trace_loop masks each use on is_light / btype)
    pdf_area = jnp.where(is_light > 0.5, is_light / total_la, alpha_face)

    uv0 = jax.lax.stop_gradient(uv_all[f[:, 0]])
    uv1 = jax.lax.stop_gradient(uv_all[f[:, 1]])
    uv2 = jax.lax.stop_gradient(uv_all[f[:, 2]])
    # shading-normal columns: vertex normals on smooth faces, the face
    # normal replicated otherwise (interpolation then reproduces it)
    ngf = jnp.cross(e1, e2)
    ngf = ngf / jnp.sqrt(jnp.maximum(
        jnp.sum(ngf * ngf, -1, keepdims=True), 1e-30))
    smf = jnp.asarray(fsm, jnp.float32)[:, None]
    n0 = jnp.where(smf > 0.5, n_all[f[:, 0]], ngf)
    n1 = jnp.where(smf > 0.5, n_all[f[:, 1]], ngf)
    n2 = jnp.where(smf > 0.5, n_all[f[:, 2]], ngf)
    tris = jnp.concatenate([
        p0, e1, e2, refl, emission,
        is_light[:, None], pdf_area[:, None],
        btype, bparams, uv0, uv1, uv2, n0, n1, n2,
    ], axis=1)
    tris = jnp.pad(tris, ((0, F_pad - F), (0, 0)))
    env_meta = jnp.zeros((1, ENV_COLS))
    if scene.env_index >= 0:
        env = scene.emitters[scene.env_index]
        H_e, W_e = int(env.data.shape[0]), int(env.data.shape[1])
        off_rad = tex_off
        tex_planes.append(jax.lax.stop_gradient(
            jnp.transpose(env.data, (2, 0, 1)).reshape(-1)))
        off_pdf = tex_off + 3 * H_e * W_e
        tex_planes.append(jax.lax.stop_gradient(
            env.distr.pdf_table.reshape(-1)))
        inv_rot = jnp.linalg.inv(env.to_world)[:3, :3].reshape(-1)
        n_em = len(scene.emitters)
        env_meta = jnp.concatenate([
            jax.lax.stop_gradient(inv_rot),
            jnp.asarray(env.scale, jnp.float32).reshape(1),
            jnp.asarray([float(W_e), float(H_e), float(off_rad),
                         float(off_pdf)]),
            jax.lax.stop_gradient(env.distr.total).reshape(1),
            jnp.asarray([1.0 / n_em, 1.0 / n_em]),
            jnp.zeros(ENV_COLS - 17),
        ]).reshape(1, ENV_COLS)
    if tex_planes:
        flat = jnp.concatenate(tex_planes)
        n_rows = -(-int(flat.shape[0]) // LANES)
        tex = jnp.pad(flat, (0, n_rows * LANES - flat.shape[0])).reshape(
            n_rows, LANES)
    else:
        tex = jnp.zeros((1, LANES))

    ln = jnp.cross(e1[light_faces], e2[light_faces])
    ln = ln / jnp.sqrt(jnp.maximum(jnp.sum(ln * ln, -1, keepdims=True),
                                   1e-30))
    cdf = jnp.cumsum(la) / total_la
    inv_a = jnp.full((L, 1), 1.0) / total_la  # pmf/area = 1/total (uniform)
    light = jnp.concatenate([
        p0[light_faces], e1[light_faces], e2[light_faces], ln,
        cdf[:, None], inv_a, jnp.broadcast_to(le[None, :], (L, 3)),
    ], axis=1)
    L_pad = max(SUB, -(-L // SUB) * SUB)
    light = jnp.pad(light, ((0, L_pad - L), (0, 0)))
    return tris, light, F, L, tex, env_meta


# ----------------------------------------------------------------- kernel

def _cross(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _normalize3(x, y, z):
    inv = jax.lax.rsqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    return x * inv, y * inv, z * inv


def _frame(nx, ny, nz):
    """Duff orthonormal basis (core/math.py coordinate_system)."""
    sign = jnp.where(nz >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + nz)
    b = nx * ny * a
    sx = 1.0 + sign * nx * nx * a
    sy = sign * b
    sz = -sign * nx
    tx = b
    ty = sign + ny * ny * a
    tz = -ny
    return sx, sy, sz, tx, ty, tz


def _concentric_disk(u1, u2):
    """core/warp.py square_to_uniform_disk_concentric."""
    x = 2.0 * u1 - 1.0
    y = 2.0 * u2 - 1.0
    is_zero = (x == 0.0) & (y == 0.0)
    quad_x = jnp.abs(x) > jnp.abs(y)
    r = jnp.where(quad_x, x, y)
    ratio = jnp.where(
        quad_x,
        y / jnp.where(x != 0.0, x, 1.0),
        x / jnp.where(y != 0.0, y, 1.0),
    )
    phi = jnp.where(quad_x, (np.pi / 4.0) * ratio,
                    (np.pi / 2.0) - (np.pi / 4.0) * ratio)
    r = jnp.where(is_zero, 0.0, r)
    return r * jnp.cos(phi), r * jnp.sin(phi)


def _tri_test(c, ox, oy, oz, dx, dy, dz, maxt):
    """Moller-Trumbore: ray tile (8,128) vs ONE triangle.

    ``c(k)`` returns column k of the triangle row as an SMEM SCALAR —
    vector-scalar arithmetic lowers to native splats (the cheap path for
    per-iteration constants on TPU).  Returns (hit, t).
    """
    e1x, e1y, e1z = c(3), c(4), c(5)
    e2x, e2y, e2z = c(6), c(7), c(8)
    pvx, pvy, pvz = _cross(dx, dy, dz, e2x, e2y, e2z)
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > DET_EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvx = ox - c(0)
    tvy = oy - c(1)
    tvz = oz - c(2)
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx, qvy, qvz = _cross(tvx, tvy, tvz, e1x, e1y, e1z)
    vv = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    hit = (ok & (u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0)
           & (t > 0.0) & (t <= maxt))
    return hit, t


UNROLL = 4


def _closest_hit(tris_ref, n_faces, ox, oy, oz, dx, dy, dz,
                 n_attr=TRI_COLS):
    """Loop over triangles carrying only (best_t, best_index) — two vregs,
    no spills; the winner's 17 attributes are resolved afterwards with a
    cheap masked-accumulate loop.  The table's zero rows (padding) have
    det = 0 so over-running n_faces to the unroll boundary is safe."""
    shape = ox.shape
    inf = jnp.float32(jnp.inf)
    n_iter = -(-n_faces // UNROLL)

    def body(i, carry):
        bt, bj = carry
        for u in range(UNROLL):
            j = i * UNROLL + u
            c = lambda k: tris_ref[j, k]
            hit, t = _tri_test(c, ox, oy, oz, dx, dy, dz, bt)
            win = hit & (t < bt)
            bt = jnp.where(win, t, bt)
            bj = jnp.where(win, j.astype(jnp.float32), bj)
        return bt, bj

    bt, bj = jax.lax.fori_loop(
        0, n_iter, body,
        (jnp.full(shape, inf), jnp.full(shape, -1.0)))

    def resolve(j, attrs):
        m = (bj == j.astype(jnp.float32)).astype(jnp.float32)
        return tuple(
            a + m * tris_ref[j, k] for k, a in enumerate(attrs)
        )

    z = jnp.zeros(shape, jnp.float32)
    attrs = jax.lax.fori_loop(0, n_faces, resolve, (z,) * n_attr)
    # pad unresolved columns with zeros so callers unpack uniformly
    return (bt,) + attrs + (z,) * (TRI_COLS - n_attr)


def _any_hit(tris_ref, n_faces, ox, oy, oz, dx, dy, dz, maxt):
    # carry occlusion as f32 0/1: Mosaic mislays i1 vectors in scf carries
    n_iter = -(-n_faces // UNROLL)

    def body(i, occluded):
        for u in range(UNROLL):
            j = i * UNROLL + u
            c = lambda k: tris_ref[j, k]
            hit, _ = _tri_test(c, ox, oy, oz, dx, dy, dz, maxt)
            occluded = jnp.maximum(occluded, hit.astype(jnp.float32))
        return occluded

    occ = jax.lax.fori_loop(
        0, n_iter, body, jnp.zeros(ox.shape, jnp.float32))
    return occ > 0.5


def _mis(pa, pb):
    """Power heuristic, common.py mis_weight."""
    a2 = pa * pa
    w = a2 / jnp.maximum(a2 + pb * pb, 1e-32)
    return jnp.where(pa > 0.0, w, 0.0)


# ----------------------------------------------- GGX microfacet (tile form)
# Componentwise mirrors of models/microfacet.py (same op order so the
# megakernel bit-matches the wavefront RoughConductor).

def _safe_sqrt_t(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def _safe_div_t(a, b, eps=1e-20):
    ok = jnp.abs(b) > eps
    return jnp.where(ok, a / jnp.where(ok, b, 1.0), 0.0)


def _rsqrt_safe_t(x, eps=1e-20):
    return jnp.where(x > eps,
                     1.0 / jnp.sqrt(jnp.maximum(x, eps)), 0.0)


def _ggx_g1(wx, wy, wz, mx, my, mz, a):
    c2 = wz * wz
    a2 = (wx * a) * (wx * a) + (wy * a) * (wy * a)
    lam = 0.5 * (_safe_sqrt_t(1.0 + _safe_div_t(a2, c2)) - 1.0)
    g = 1.0 / (1.0 + lam)
    back = ((wx * mx + wy * my + wz * mz) * wz) <= 0.0
    return jnp.where(back, 0.0, g)


def _ggx_d(mx, my, mz, a):
    t = (mx / a) * (mx / a) + (my / a) * (my / a) + mz * mz
    d = _safe_div_t(1.0, jnp.pi * a * a * (t * t))
    return jnp.where(mz > 0.0, d, 0.0)


def _vndf_pdf(wix, wiy, wiz, mx, my, mz, a):
    g1 = _ggx_g1(wix, wiy, wiz, mx, my, mz, a)
    return _safe_div_t(
        g1 * jnp.abs(wix * mx + wiy * my + wiz * mz)
        * _ggx_d(mx, my, mz, a),
        jnp.abs(wiz))


def _fr_cond(c, e, k):
    """Conductor Fresnel, one channel (core/fresnel.py)."""
    c2 = c * c
    s2 = 1.0 - c2
    e2 = e * e
    k2 = k * k
    t0 = e2 - k2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * e2 * k2, 0.0))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 0.0))
    t2 = 2.0 * a * jnp.abs(c)
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-20)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-20)
    return 0.5 * (rp + rs)


def _lut_fetch(tex_ref, idx, n_rows):
    """Per-lane LUT gather out[s,l] = arena[idx[s,l]] from an (n_rows,
    128) VMEM table.  Mosaic's dynamic gather works along the lanes of
    one row, so this sweeps the (static, small) row count with a
    lane-gather + select per row."""
    lane_i = idx & (LANES - 1)
    row_i = idx >> 7
    out = jnp.zeros(idx.shape, jnp.float32)
    for r in range(n_rows):
        rowv = jnp.broadcast_to(tex_ref[r:r + 1, :], idx.shape)
        part = jnp.take_along_axis(rowv, lane_i, axis=1)
        out = jnp.where(row_i == r, part, out)
    return out


def _tex_eval(tex_ref, n_tex_rows, off, W, H, nearest_f, wrap_f, u, v):
    """BitmapTexture.eval mirror on tiles (textures.py): channel-planar
    arena, per-lane texture params.  Returns (R, G, B) tiles."""
    uu = jnp.where(wrap_f > 0.5, u - jnp.floor(u), jnp.clip(u, 0.0, 1.0))
    vv = jnp.where(wrap_f > 0.5, v - jnp.floor(v), jnp.clip(v, 0.0, 1.0))
    x = uu * W - 0.5
    y = (1.0 - vv) * H - 0.5
    Wi = W.astype(jnp.int32)
    Hi = H.astype(jnp.int32)
    offi = off.astype(jnp.int32)
    hw = Wi * Hi
    xn = jnp.clip(jnp.round(x).astype(jnp.int32), 0, Wi - 1)
    yn = jnp.clip(jnp.round(y).astype(jnp.int32), 0, Hi - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Wi - 1)
    x1i = jnp.clip(x0i + 1, 0, Wi - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hi - 1)
    y1i = jnp.clip(y0i + 1, 0, Hi - 1)
    out = []
    for c in range(3):
        po = offi + c * hw
        near = _lut_fetch(tex_ref, po + yn * Wi + xn, n_tex_rows)
        b00 = _lut_fetch(tex_ref, po + y0i * Wi + x0i, n_tex_rows)
        b10 = _lut_fetch(tex_ref, po + y0i * Wi + x1i, n_tex_rows)
        b01 = _lut_fetch(tex_ref, po + y1i * Wi + x0i, n_tex_rows)
        b11 = _lut_fetch(tex_ref, po + y1i * Wi + x1i, n_tex_rows)
        bil = (b00 * (1 - fx) * (1 - fy) + b10 * fx * (1 - fy)
               + b01 * (1 - fx) * fy + b11 * fx * fy)
        out.append(jnp.where(nearest_f > 0.5, near, bil))
    return out[0], out[1], out[2]


def _fr_diel(ci, eta):
    """Unpolarized dielectric Fresnel, signed cosine (core/fresnel.py
    fresnel_dielectric mirror).  Returns (F, cos_theta_t, eta_it,
    eta_ti)."""
    outside = ci >= 0.0
    eta_it = jnp.where(outside, eta, 1.0 / eta)
    eta_ti = jnp.where(outside, 1.0 / eta, eta)
    cti = jnp.abs(ci)
    sin2_t = (eta_ti * eta_ti) * jnp.maximum(0.0, 1.0 - cti * cti)
    tir = sin2_t >= 1.0
    ctt = _safe_sqrt_t(1.0 - sin2_t)
    rs = (cti - eta_it * ctt) / jnp.maximum(cti + eta_it * ctt, 1e-20)
    rp = (eta_it * cti - ctt) / jnp.maximum(eta_it * cti + ctt, 1e-20)
    f = 0.5 * (rs * rs + rp * rp)
    f = jnp.where(tir, 1.0, f)
    f = jnp.where(jnp.abs(eta - 1.0) < 1e-6, 0.0, f)
    cos_t = jnp.where(tir, 0.0, -jnp.sign(ci) * ctt)
    return f, cos_t, eta_it, eta_ti


def _vndf_sample(wix, wiy, wiz, u1, u2, a):
    """Heitz 2018 VNDF sample (microfacet.py sample_vndf, isotropic)."""
    hx, hy, hz = a * wix, a * wiy, wiz
    inv = _rsqrt_safe_t(hx * hx + hy * hy + hz * hz)
    vhx, vhy, vhz = hx * inv, hy * inv, hz * inv
    lensq = vhx * vhx + vhy * vhy
    inv2 = _safe_div_t(1.0, _safe_sqrt_t(lensq))
    ok = lensq > 1e-12
    t1x = jnp.where(ok, -vhy * inv2, 1.0)
    t1y = jnp.where(ok, vhx * inv2, 0.0)
    t1z = jnp.zeros_like(t1x)
    t2x, t2y, t2z = _cross(vhx, vhy, vhz, t1x, t1y, t1z)
    r = _safe_sqrt_t(u1)
    phi = 2.0 * jnp.pi * u2
    p1 = r * jnp.cos(phi)
    p2 = r * jnp.sin(phi)
    s = 0.5 * (1.0 + vhz)
    p2 = (1.0 - s) * _safe_sqrt_t(1.0 - p1 * p1) + s * p2
    p3 = _safe_sqrt_t(jnp.maximum(0.0, 1.0 - p1 * p1 - p2 * p2))
    nhx = p1 * t1x + p2 * t2x + p3 * vhx
    nhy = p1 * t1y + p2 * t2y + p3 * vhy
    nhz = p1 * t1z + p2 * t2z + p3 * vhz
    mx, my, mz = a * nhx, a * nhy, jnp.maximum(1e-6, nhz)
    inv3 = _rsqrt_safe_t(mx * mx + my * my + mz * mz)
    return mx * inv3, my * inv3, mz * inv3


def _trace_loop(closest, anyhit, lc, n_lights, btypes, max_depth, rr_depth,
                lane, seed_x, ox, oy, oz, dx, dy, dz, act, env_ctx=None):
    """Fused path-trace bounce loop over one (8, 128) ray tile, shared by
    the brute-force and BVH-packet megakernels.  ``btypes`` is the static
    tuple of BSDF type codes present in the scene; the kernel specializes
    on it, so pure-diffuse scenes pay nothing for the extra lobes.

    - ``closest(ox..dz, act) -> (valid, t, ngx, ngy, ngz, shx, shy,
      shz, Rr, Rg, Rb, IsL, PdfA, Btype, C0..C5)`` — closest-hit with
      geometric + shading normals and resolved shading
      attrs (ng = unit geometric normal, Btype/C* zero when ``not
      multi``); ``act`` is the per-bounce live mask so dead lanes don't
      force BVH descent (their best_t would otherwise pin at inf);
    - ``anyhit(ox..dz, maxt, act) -> bool`` — shadow occlusion;
    - ``lc(j, k)`` — scalar accessor into the packed light table.
    """
    multi = tuple(btypes) != (0,)
    state = (
        ox, oy, oz, dx, dy, dz,
        jnp.zeros_like(ox), jnp.zeros_like(ox), jnp.zeros_like(ox),  # L
        jnp.ones_like(ox), jnp.ones_like(ox), jnp.ones_like(ox),    # B
        jnp.ones_like(ox),     # eta_acc
        jnp.ones_like(ox),     # prev_pdf
        jnp.ones_like(ox),     # prev_delta (f32 0/1: Mosaic i1 carry)
        act,
    )
    for depth in range(max_depth):
        state = _bounce_step(closest, anyhit, lc, n_lights, btypes,
                             depth, max_depth, rr_depth, lane, seed_x,
                             env_ctx, state)
    return state[6], state[7], state[8]


# ---- per-bounce ablation flags (round 5, VERDICT #4) ----
# Split the ~38 ms/bounce shading+state slab (PERF.md round-4
# decomposition) into measurable pieces.  Profiling affordances ONLY:
# images are wrong while set, and because module flags are not part of
# the jit cache key, call jax.clear_caches() (or use a fresh process)
# after changing them — examples/profile_slab.py does this.
DEBUG_SKIP_NEE = False        # light sampling + shadow trace + contrib
DEBUG_SKIP_NEE_TRACE = False  # keep the NEE math, stub the shadow trace
DEBUG_SKIP_SAMPLING = False   # BSDF sampling / next-ray state update
DEBUG_SKIP_EMITHIT = False    # emitter-hit MIS accumulation



def _bounce_step(closest, anyhit, lc, n_lights, btypes, depth, max_depth,
                 rr_depth, lane, seed_x, env_ctx, state):
    """ONE path-tracing bounce over a ray tile: closest-hit, env/emitter
    MIS terms, NEE + shadow, BSDF sampling, russian roulette.  Shared by
    the all-depth megakernels (Python-unrolled) and the sorted
    per-bounce pipeline (one kernel launch per depth with ray
    re-sorting in between).  ``state`` is the 16-tuple
    (o(3), d(3), L(3), B(3), eta_acc, prev_pdf, prev_delta(f32), act).
    """
    multi = tuple(btypes) != (0,)
    # twosided wrapper = +16 on the inner type (twosided.cpp frame
    # flip); the static lobe flags look at the inner codes
    has_ts = any(b >= 16 for b in btypes)
    inner = {b % 16 for b in btypes}
    has_cond = 1 in inner
    has_diel = 2 in inner
    has_rcond = 3 in inner
    has_rdiel = 4 in inner
    has_pl = 6 in inner
    has_rpl = 7 in inner
    has_ggx = has_rcond or has_rdiel or has_rpl
    has_env = env_ctx is not None
    if has_env:
        em, en, env_tex_ref, n_env_rows, env_pos = env_ctx
        n_em = 2 if n_lights > 0 else 1
    (ox, oy, oz, dx, dy, dz, Lr, Lg, Lb, Br, Bg, Bb, eta_acc,
     prev_pdf, prev_delta, act) = state
    dbase = DIM_BOUNCE_BASE + depth * DIMS_PER_BOUNCE
    (valid, t, ngx, ngy, ngz, shx, shy, shz, Rr, Rg, Rb,
     IsL, PdfA, Btype, C0, C1, C2, C3, C4, C5) = closest(
        ox, oy, oz, dx, dy, dz, act)
    valid = valid & act

    if has_env:
        # escaped rays collect the environment with MIS
        # (path.py eval_env branch; envmap.cpp conventions)
        escaped = act & ~valid
        r00, r01, r02 = em(0), em(1), em(2)
        r10, r11, r12 = em(3), em(4), em(5)
        r20, r21, r22 = em(6), em(7), em(8)
        exv = r00 * dx + r01 * dy + r02 * dz
        eyv = r10 * dx + r11 * dy + r12 * dz
        ezv = r20 * dx + r21 * dy + r22 * dz
        ue = jnp.arctan2(exv, -ezv) * jnp.float32(0.5 / jnp.pi)
        ue = ue - jnp.floor(ue)
        ve = jnp.arccos(jnp.clip(eyv, -1.0, 1.0)) \
            * jnp.float32(1.0 / jnp.pi)
        Wt, Ht = em(10), em(11)
        Wi_e = Wt.astype(jnp.int32)
        Hi_e = Ht.astype(jnp.int32)
        offr = em(12).astype(jnp.int32)
        offp = em(13).astype(jnp.int32)
        hw_e = Wi_e * Hi_e
        # bilinear radiance (envmap._bilinear: wrap x, clamp y)
        xe = ue * Wt - 0.5
        ye = ve * Ht - 0.5
        xe0 = jnp.floor(xe)
        ye0 = jnp.floor(ye)
        fxe = xe - xe0
        fye = ye - ye0
        x0e = jnp.mod(xe0.astype(jnp.int32), Wi_e)
        x1e = jnp.mod(x0e + 1, Wi_e)
        y0e = jnp.clip(ye0.astype(jnp.int32), 0, Hi_e - 1)
        y1e = jnp.clip(y0e + 1, 0, Hi_e - 1)
        le_env = []
        for c in range(3):
            po = offr + c * hw_e
            f00 = _lut_fetch(env_tex_ref, po + y0e * Wi_e + x0e,
                             n_env_rows)
            f10 = _lut_fetch(env_tex_ref, po + y0e * Wi_e + x1e,
                             n_env_rows)
            f01 = _lut_fetch(env_tex_ref, po + y1e * Wi_e + x0e,
                             n_env_rows)
            f11 = _lut_fetch(env_tex_ref, po + y1e * Wi_e + x1e,
                             n_env_rows)
            le_env.append(
                (f00 * (1 - fxe) * (1 - fye)
                 + f10 * fxe * (1 - fye)
                 + f01 * (1 - fxe) * fye
                 + f11 * fxe * fye) * em(9))
        # Marginal2D.pdf at the cell + solid-angle factor
        # (envmap.pdf_direction) + selection pmf
        ce = jnp.clip((ue * Wt).astype(jnp.int32), 0, Wi_e - 1)
        re = jnp.clip((ve * Ht).astype(jnp.int32), 0, Hi_e - 1)
        cell = _lut_fetch(env_tex_ref, offp + re * Wi_e + ce,
                          n_env_rows)
        tot = em(14)
        pdf_uv = jnp.where(jnp.abs(tot) > 1e-20,
                           cell * (Wt * Ht) / tot, 0.0)
        st_e = jnp.sqrt(jnp.maximum(
            1.0 - jnp.square(jnp.cos(jnp.pi * ve)), 1e-12))
        pdf_env = pdf_uv / (
            2.0 * jnp.float32(jnp.pi) ** 2
            * jnp.maximum(st_e, 1e-6)) * em(15)
        m_esc = jnp.where(prev_delta > 0.5, 1.0,
                          _mis(prev_pdf, pdf_env))
        # le/pdf carry NaN on dead lanes (inf/NaN ray state);
        # the where must wrap the whole product
        Lr = Lr + Br * jnp.where(escaped, le_env[0] * m_esc, 0.0)
        Lg = Lg + Bg * jnp.where(escaped, le_env[1] * m_esc, 0.0)
        Lb = Lb + Bb * jnp.where(escaped, le_env[2] * m_esc, 0.0)

    # single-emitter constant radiance: emission = is_light * Le
    # (pack_scene wrote the emission column as exactly this
    # product, so the arithmetic is unchanged)
    Er = IsL * lc(0, 14)
    Eg = IsL * lc(0, 15)
    Eb = IsL * lc(0, 16)
    if has_ts:
        ts_flag = Btype >= 15.5
        Btype = Btype - jnp.where(ts_flag, 16.0, 0.0)
    if multi:
        is_diff = Btype < 0.5
        is_cond = (Btype >= 0.5) & (Btype < 1.5)
        is_diel = (Btype >= 1.5) & (Btype < 2.5)
        is_rcond = (Btype >= 2.5) & (Btype < 3.5)
        is_rdiel = (Btype >= 3.5) & (Btype < 4.5)
        is_pl = (Btype >= 5.5) & (Btype < 6.5)
        is_rpl = Btype >= 6.5
    else:
        is_diff = jnp.ones_like(act)
        is_cond = is_diel = is_rcond = is_rdiel = is_pl = is_rpl = \
            jnp.zeros_like(act)

    px = ox + dx * t
    py = oy + dy * t
    pz = oz + dz * t
    # one-sided diffuse/conductor conventions: front iff -d.n > 0;
    # dielectrics are two-sided (glass interiors)
    cos_wi = -(dx * shx + dy * shy + dz * shz)    # shading
    cos_geo = -(dx * ngx + dy * ngy + dz * ngz)   # geometric
    cos_wi_sgn = cos_wi          # signed: the mirror/refract formulas
    if has_ts:
        # twosided.cpp: back hits evaluate the nested BSDF in the
        # z-flipped local frame.  Mirroring the wavefront adapter
        # exactly (flip wi.z, flip the sampled wo.z back) keeps the
        # sample stream bit-identical.
        flip = ts_flag & (cos_wi < 0.0)
        cos_wi = jnp.where(flip, -cos_wi, cos_wi)
    else:
        flip = jnp.zeros_like(act)
    front = cos_wi > 0.0

    if not DEBUG_SKIP_EMITHIT:
        # ---- MIS'd radiance of directly-hit emitters (path.py:82) ----
        dist2 = t * t
        pdf_hit = jnp.where(
            cos_geo > 1e-6,
            PdfA * dist2 / jnp.maximum(cos_geo, 1e-6), 0.0)
        if has_env:
            pdf_hit = pdf_hit * em(16)   # area selection pmf
        m_h = jnp.where(prev_delta > 0.5, 1.0,
                        _mis(prev_pdf, pdf_hit))
        wgt = jnp.where(valid & front & (IsL > 0.5), m_h, 0.0)
        Lr = Lr + Br * Er * wgt
        Lg = Lg + Bg * Eg * wgt
        Lb = Lb + Bb * Eb * wgt

    if multi:
        two_sided = is_diel | is_rdiel if has_rdiel else is_diel
        act_next = (valid & (front | two_sided)
                    & (depth + 1 < max_depth))
    else:
        act_next = valid & front & (depth + 1 < max_depth)

    # spawn-ray offset scale (records.py spawn_ray)
    off = RAY_EPS * jnp.maximum(
        1.0, jnp.maximum(jnp.abs(px),
                         jnp.maximum(jnp.abs(py), jnp.abs(pz))))

    # local shading frame (Duff; equals the wavefront SI frame
    # for the supported flat-mesh family) + local wi for the
    # GGX lobes
    sx, sy, sz, tx, ty, tz = _frame(shx, shy, shz)
    if has_ggx:
        wix = -(dx * sx + dy * sy + dz * sz)
        wiy = -(dx * tx + dy * ty + dz * tz)
        wiz = cos_wi
        alpha = jnp.maximum(PdfA, 1e-4)   # col 16 (rough faces)

    if not DEBUG_SKIP_NEE:
        # ---- NEE toward the area light (path.py:92-105) ----
        u_sel = _rng1(seed_x, lane, dbase + SLOT_EM_SELECT)
        ue1, ue2 = _rng2(seed_x, lane, dbase + SLOT_EM_POS)
        z = jnp.zeros_like(u_sel)
        if has_env:
            # uniform emitter selection with sample reuse
            # (DiscreteDistribution.sample_reuse_pmf)
            if n_em == 2:
                second = u_sel > 0.5
                pick_env = second if env_pos == 1 else ~second
                lo_sel = jnp.where(second, 0.5, 0.0)
                u_face = jnp.clip((u_sel - lo_sel) / 0.5,
                                  0.0, 1.0 - 2.0 ** -24)
            else:
                pick_env = jnp.ones_like(u_sel, bool)
                u_face = jnp.clip(u_sel, 0.0, 1.0 - 2.0 ** -24)
        else:
            u_face = u_sel
        idx = z
        for j in range(n_lights):
            idx = idx + (lc(j, 12) < u_face).astype(jnp.float32)
        sel = [z] * LIGHT_COLS
        for j in range(n_lights):
            m = (idx == j).astype(jnp.float32)
            for k in list(range(12)) + list(range(13, LIGHT_COLS)):
                sel[k] = sel[k] + m * lc(j, k)
        (lp0x, lp0y, lp0z, le1x, le1y, le1z, le2x, le2y, le2z,
         lnx, lny, lnz) = sel[:12]
        lpdfA = sel[13]
        Ler, Leg, Leb = sel[14], sel[15], sel[16]
        # warp.square_to_uniform_triangle
        stri = jnp.sqrt(jnp.maximum(1.0 - ue1, 0.0))
        b0 = 1.0 - stri
        b1 = stri * ue2
        lpx = lp0x + le1x * b0 + le2x * b1
        lpy = lp0y + le1y * b0 + le2y * b1
        lpz = lp0z + le1z * b0 + le2z * b1
        sdx = lpx - px
        sdy = lpy - py
        sdz = lpz - pz
        sdist2 = jnp.maximum(sdx * sdx + sdy * sdy + sdz * sdz, 1e-12)
        sdist = jnp.sqrt(sdist2)
        sdx, sdy, sdz = sdx / sdist, sdy / sdist, sdz / sdist
        cos_l = -(sdx * lnx + sdy * lny + sdz * lnz)
        pdf_nee = jnp.where(
            cos_l > 1e-6,
            lpdfA * sdist2 / jnp.maximum(cos_l, 1e-6), 0.0)
        maxt_s = sdist * (1.0 - 1e-3)
        # per-lane NEE sample: (direction, effective pdf incl.
        # selection, emitter weight W = Le/pdf/sel, shadow maxt)
        if has_env:
            sel_area = em(16)
            e_pdf = en(depth, 3)
            sdx = jnp.where(pick_env, en(depth, 0), sdx)
            sdy = jnp.where(pick_env, en(depth, 1), sdy)
            sdz = jnp.where(pick_env, en(depth, 2), sdz)
            maxt_s = jnp.where(pick_env, en(depth, 7), maxt_s)
            pdf_eff = jnp.where(pick_env, e_pdf, pdf_nee * sel_area)
            inv_pa = 1.0 / (jnp.maximum(pdf_nee, 1e-20) * sel_area)
            Wr_nee = jnp.where(pick_env, en(depth, 4), Ler * inv_pa)
            Wg_nee = jnp.where(pick_env, en(depth, 5), Leg * inv_pa)
            Wb_nee = jnp.where(pick_env, en(depth, 6), Leb * inv_pa)
        else:
            pdf_eff = pdf_nee
            inv_pa = 1.0 / jnp.maximum(pdf_nee, 1e-20)
            Wr_nee = Ler * inv_pa
            Wg_nee = Leg * inv_pa
            Wb_nee = Leb * inv_pa
        cos_s = sdx * shx + sdy * shy + sdz * shz
        if has_ts:
            cos_s = jnp.where(flip, -cos_s, cos_s)   # flipped-frame wo.z
        # NEE pays off on smooth-eval lobes (diffuse + GGX); delta
        # BSDFs eval to 0 (path.py:99 bsdf_eval_pdf); samples are
        # drawn regardless so the dimension layout matches the
        # wavefront path
        ok_nee = act_next & (pdf_eff > 0.0)
        if multi:
            # diffuse/rough-conductor/plastic need the light on the
            # front side; rough dielectric is two-sided (its eval
            # handles the reflection/transmission configuration itself)
            nee_lobe = is_diff
            if has_rcond:
                nee_lobe = nee_lobe | is_rcond
            if has_pl:
                nee_lobe = nee_lobe | is_pl
            if has_rpl:
                nee_lobe = nee_lobe | is_rpl
            front_ok = nee_lobe & front & (cos_s > 0.0)
            if has_rdiel:
                ok_nee = ok_nee & (front_ok | is_rdiel)
            else:
                ok_nee = ok_nee & front_ok
        else:
            ok_nee = ok_nee & (cos_s > 0.0)
        # shadow-ray offset side follows the GEOMETRIC normal
        # (spawn_ray_to uses si.n)
        sgn_s = jnp.where(
            sdx * ngx + sdy * ngy + sdz * ngz >= 0.0, 1.0, -1.0)
        if DEBUG_SKIP_NEE_TRACE:
            occ = jnp.zeros_like(ok_nee)
        else:
            occ = anyhit(
                px + sgn_s * off * ngx, py + sgn_s * off * ngy,
                pz + sgn_s * off * ngz,
                sdx, sdy, sdz, maxt_s, ok_nee)
        ok_nee = ok_nee & ~occ
        # per-lobe f (RGB, premultiplied by cos) + pdf for MIS
        f_pdf = INV_PI * jnp.maximum(cos_s, 0.0)
        fr_nee = Rr * (INV_PI * cos_s)
        fg_nee = Rg * (INV_PI * cos_s)
        fb_nee = Rb * (INV_PI * cos_s)
        if has_rcond:
            # RoughConductor.eval mirror: half vector of (wi, wo_nee)
            wox = sdx * sx + sdy * sy + sdz * sz
            woy = sdx * tx + sdy * ty + sdz * tz
            woz = cos_s
            hmx, hmy, hmz = wix + wox, wiy + woy, wiz + woz
            hnorm = jnp.sqrt(jnp.maximum(
                hmx * hmx + hmy * hmy + hmz * hmz, 1e-20))
            hmx, hmy, hmz = hmx / hnorm, hmy / hnorm, hmz / hnorm
            d_ggx = _ggx_d(hmx, hmy, hmz, alpha)
            g2 = (_ggx_g1(wix, wiy, wiz, hmx, hmy, hmz, alpha)
                  * _ggx_g1(wox, woy, woz, hmx, hmy, hmz, alpha))
            cos_im = wix * hmx + wiy * hmy + wiz * hmz
            scal = d_ggx * g2 / jnp.maximum(4.0 * wiz, 1e-20)
            fr_r = _fr_cond(cos_im, C0, C3) * scal
            fg_r = _fr_cond(cos_im, C1, C4) * scal
            fb_r = _fr_cond(cos_im, C2, C5) * scal
            pdf_r_nee = _vndf_pdf(wix, wiy, wiz, hmx, hmy, hmz,
                                  alpha) / jnp.maximum(
                4.0 * jnp.abs(wox * hmx + woy * hmy + woz * hmz),
                1e-20)
            fr_nee = jnp.where(is_rcond, fr_r, fr_nee)
            fg_nee = jnp.where(is_rcond, fg_r, fg_nee)
            fb_nee = jnp.where(is_rcond, fb_r, fb_nee)
            f_pdf = jnp.where(is_rcond, pdf_r_nee, f_pdf)
        if has_rdiel:
            # RoughDielectric._eval_pdf_impl mirror (two-sided)
            wox = sdx * sx + sdy * sy + sdz * sz
            woy = sdx * tx + sdy * ty + sdz * tz
            woz = cos_s
            eta_d = jnp.maximum(C0, 1e-3)
            refl_cfg = wiz * woz > 0.0
            eta_path = jnp.where(wiz > 0.0, eta_d, 1.0 / eta_d)
            qx = jnp.where(refl_cfg, wix + wox, wix + wox * eta_path)
            qy = jnp.where(refl_cfg, wiy + woy, wiy + woy * eta_path)
            qz = jnp.where(refl_cfg, wiz + woz, wiz + woz * eta_path)
            n2 = qx * qx + qy * qy + qz * qz
            qinv = jnp.where(n2 > 1e-20,
                             1.0 / jnp.sqrt(jnp.maximum(n2, 1e-20)),
                             0.0)
            qx, qy, qz = qx * qinv, qy * qinv, qz * qinv
            sg_m = jnp.where(qz >= 0.0, 1.0, -1.0)
            qx, qy, qz = qx * sg_m, qy * sg_m, qz * sg_m
            sg_o = jnp.where(wiz >= 0.0, 1.0, -1.0)
            mox, moy, moz = qx * sg_o, qy * sg_o, qz * sg_o
            cim = wix * mox + wiy * moy + wiz * moz
            com = wox * mox + woy * moy + woz * moz
            fD, _, eta_it, eta_ti = _fr_diel(cim, eta_d)
            sgn_i = jnp.where(wiz >= 0.0, 1.0, -1.0)
            sgn_o = jnp.where(woz >= 0.0, 1.0, -1.0)
            d_g = _ggx_d(qx, qy, qz, alpha)
            g2d = (_ggx_g1(wix * sgn_i, wiy * sgn_i, wiz * sgn_i,
                           qx, qy, qz, alpha)
                   * _ggx_g1(wox * sgn_o, woy * sgn_o, woz * sgn_o,
                             qx, qy, qz, alpha))
            val_rr = fD * d_g * g2d / jnp.maximum(
                4.0 * jnp.abs(wiz), 1e-20)
            den = cim + eta_it * com
            val_tt = ((1.0 - fD) * d_g * g2d
                      * jnp.abs(cim * com) * (eta_it * eta_it)
                      / jnp.maximum(jnp.abs(wiz) * den * den, 1e-20)
                      ) * (eta_ti * eta_ti)
            val_d = jnp.where(refl_cfg, val_rr, jnp.abs(val_tt))
            pdm = _vndf_pdf(wix * sgn_i, wiy * sgn_i, wiz * sgn_i,
                            qx, qy, qz, alpha)
            jr = 1.0 / jnp.maximum(4.0 * jnp.abs(com), 1e-20)
            jt = jnp.abs(com) * (eta_it * eta_it) / jnp.maximum(
                den * den, 1e-20)
            pdf_d = pdm * jnp.where(refl_cfg, fD * jr,
                                    (1.0 - fD) * jt)
            ok_d = ((jnp.abs(wiz) > 1e-6) & (n2 > 1e-20)
                    & (refl_cfg | (cim * com < 0.0)))
            val_d = jnp.where(ok_d, val_d, 0.0)
            pdf_d = jnp.where(ok_d, pdf_d, 0.0)
            fr_nee = jnp.where(is_rdiel, val_d, fr_nee)
            fg_nee = jnp.where(is_rdiel, val_d, fg_nee)
            fb_nee = jnp.where(is_rdiel, val_d, fb_nee)
            f_pdf = jnp.where(is_rdiel, pdf_d, f_pdf)
            ok_nee = ok_nee & (~is_rdiel | (val_d > 0.0))
        if has_pl or has_rpl:
            # plastic.cpp / roughplastic.cpp eval+pdf: dielectric coat
            # over diffuse with internal-scattering correction
            eta_p = jnp.maximum(C0, 1.0 + 1e-4)
            fdr_p = C1
            F_ip, _, _, _ = _fr_diel(cos_wi, eta_p)
            F_op, _, _, _ = _fr_diel(cos_s, eta_p)
            inv_eta2 = 1.0 / (eta_p * eta_p)
            fac_p = (INV_PI * jnp.maximum(cos_s, 0.0)
                     * (1.0 - F_ip) * (1.0 - F_op) * inv_eta2)
            nl = C2 > 0.5
            den_pr = 1.0 - jnp.where(nl, Rr * fdr_p, fdr_p)
            den_pg = 1.0 - jnp.where(nl, Rg * fdr_p, fdr_p)
            den_pb = 1.0 - jnp.where(nl, Rb * fdr_p, fdr_p)
            dif_pr = Rr / jnp.maximum(den_pr, 1e-6) * fac_p
            dif_pg = Rg / jnp.maximum(den_pg, 1e-6) * fac_p
            dif_pb = Rb / jnp.maximum(den_pb, 1e-6) * fac_p
            cos_pdf_s = INV_PI * jnp.maximum(cos_s, 0.0)
            if has_pl:
                fr_nee = jnp.where(is_pl, dif_pr, fr_nee)
                fg_nee = jnp.where(is_pl, dif_pg, fg_nee)
                fb_nee = jnp.where(is_pl, dif_pb, fb_nee)
                f_pdf = jnp.where(is_pl, cos_pdf_s * (1.0 - F_ip),
                                  f_pdf)
            if has_rpl:
                wox = sdx * sx + sdy * sy + sdz * sz
                woy = sdx * tx + sdy * ty + sdz * tz
                woz = cos_s
                hpx, hpy, hpz = wix + wox, wiy + woy, wiz + woz
                hn = jnp.sqrt(jnp.maximum(
                    hpx * hpx + hpy * hpy + hpz * hpz, 1e-20))
                hpx, hpy, hpz = hpx / hn, hpy / hn, hpz / hn
                cim_p = wix * hpx + wiy * hpy + wiz * hpz
                F_mp, _, _, _ = _fr_diel(cim_p, eta_p)
                d_p = _ggx_d(hpx, hpy, hpz, alpha)
                g2_p = (_ggx_g1(wix, wiy, wiz, hpx, hpy, hpz, alpha)
                        * _ggx_g1(wox, woy, woz, hpx, hpy, hpz, alpha))
                spec_p = F_mp * d_p * g2_p / jnp.maximum(
                    4.0 * wiz, 1e-20)
                jac_p = 1.0 / jnp.maximum(
                    4.0 * jnp.abs(wox * hpx + woy * hpy + woz * hpz),
                    1e-20)
                pdf_rpl = (F_ip * _vndf_pdf(wix, wiy, wiz, hpx, hpy,
                                            hpz, alpha) * jac_p
                           + (1.0 - F_ip) * cos_pdf_s)
                fr_nee = jnp.where(is_rpl, dif_pr + spec_p, fr_nee)
                fg_nee = jnp.where(is_rpl, dif_pg + spec_p, fg_nee)
                fb_nee = jnp.where(is_rpl, dif_pb + spec_p, fb_nee)
                f_pdf = jnp.where(is_rpl, pdf_rpl, f_pdf)
        wnee = jnp.where(ok_nee, _mis(pdf_eff, f_pdf), 0.0)
        # the f/W terms carry inf/NaN on miss lanes (t = inf); the
        # where must wrap the product, not just the weight
        Lr = Lr + Br * jnp.where(ok_nee, fr_nee * wnee * Wr_nee, 0.0)
        Lg = Lg + Bg * jnp.where(ok_nee, fg_nee * wnee * Wg_nee, 0.0)
        Lb = Lb + Bb * jnp.where(ok_nee, fb_nee * wnee * Wb_nee, 0.0)

    if not DEBUG_SKIP_SAMPLING:
        # ---- BSDF sampling (diffuse / conductor / dielectric) ----
        if multi:
            u_lobe = _rng1(seed_x, lane, dbase + SLOT_BSDF_LOBE)
        ub1, ub2 = _rng2(seed_x, lane, dbase + SLOT_BSDF_DIR)

        # diffuse: cosine hemisphere (SmoothDiffuse.sample); twosided
        # back hits emit into the flipped hemisphere (wo.z sign flip)
        dxl, dyl = _concentric_disk(ub1, ub2)
        dzl = jnp.sqrt(jnp.maximum(1.0 - (dxl * dxl + dyl * dyl), 0.0))
        dzl_w = jnp.where(flip, -dzl, dzl) if has_ts else dzl
        ddx = sx * dxl + tx * dyl + shx * dzl_w
        ddy = sy * dxl + ty * dyl + shy * dzl_w
        ddz = sz * dxl + tz * dyl + shz * dzl_w
        pdf_diff = INV_PI * dzl

        if multi:
            # mirror direction (conductor + dielectric-reflect)
            # signed cosine: the plane reflection (and the twosided
            # wrapper's back-face mirror) both reduce to this world form
            rx = dx + 2.0 * cos_wi_sgn * shx
            ry = dy + 2.0 * cos_wi_sgn * shy
            rz = dz + 2.0 * cos_wi_sgn * shz

            # conductor Fresnel per channel (core/fresnel.py)
            Fc_r = _fr_cond(cos_wi, C0, C3)
            Fc_g = _fr_cond(cos_wi, C1, C4)
            Fc_b = _fr_cond(cos_wi, C2, C5)

            # dielectric Fresnel with signed cosine (fresnel_dielectric)
            eta_rel = jnp.maximum(C0, 1e-3)
            outside = cos_wi >= 0.0
            eta_it = jnp.where(outside, eta_rel, 1.0 / eta_rel)
            eta_ti = jnp.where(outside, 1.0 / eta_rel, eta_rel)
            cti = jnp.abs(cos_wi)
            sin2_t = eta_ti * eta_ti * jnp.maximum(1.0 - cti * cti, 0.0)
            tir = sin2_t >= 1.0
            ctt = jnp.sqrt(jnp.maximum(1.0 - sin2_t, 0.0))
            frs = (cti - eta_it * ctt) / jnp.maximum(
                cti + eta_it * ctt, 1e-20)
            frp = (eta_it * cti - ctt) / jnp.maximum(
                eta_it * cti + ctt, 1e-20)
            Fd = 0.5 * (frs * frs + frp * frp)
            Fd = jnp.where(tir, 1.0, Fd)
            Fd = jnp.where(jnp.abs(eta_rel - 1.0) < 1e-6, 0.0, Fd)
            cos_t = jnp.where(tir, 0.0,
                              -jnp.sign(cos_wi) * ctt)
            # refracted world direction (fresnel.py refract, world form)
            tfac = eta_ti * cos_wi + cos_t
            wtx = eta_ti * dx + tfac * shx
            wty = eta_ti * dy + tfac * shy
            wtz = eta_ti * dz + tfac * shz
            pick_refl = u_lobe <= Fd
            pdf_diel = jnp.where(pick_refl, Fd, 1.0 - Fd)
            w_diel = jnp.where(pick_refl, 1.0, eta_ti * eta_ti)
            eta_mult = jnp.where(pick_refl, 1.0, eta_it)
            gdx = jnp.where(pick_refl, rx, wtx)
            gdy = jnp.where(pick_refl, ry, wty)
            gdz = jnp.where(pick_refl, rz, wtz)

        if has_rcond:
            # GGX rough conductor (RoughConductor.sample mirror:
            # VNDF half-vector, weight = F * G2/G1)
            mgx, mgy, mgz = _vndf_sample(wix, wiy, wiz, ub1, ub2,
                                         alpha)
            cim = wix * mgx + wiy * mgy + wiz * mgz
            rlx = 2.0 * cim * mgx - wix
            rly = 2.0 * cim * mgy - wiy
            rlz = 2.0 * cim * mgz - wiz
            pdf_m = _vndf_pdf(wix, wiy, wiz, mgx, mgy, mgz, alpha)
            com = rlx * mgx + rly * mgy + rlz * mgz
            pdf_rc = pdf_m / jnp.maximum(4.0 * jnp.abs(com), 1e-20)
            g1w = _ggx_g1(wix, wiy, wiz, mgx, mgy, mgz, alpha)
            g1o = _ggx_g1(rlx, rly, rlz, mgx, mgy, mgz, alpha)
            wgt_g = jnp.where(g1w > 0.0,
                              g1w * g1o / jnp.maximum(g1w, 1e-20),
                              0.0)
            Frc_r = _fr_cond(cim, C0, C3) * wgt_g
            Frc_g = _fr_cond(cim, C1, C4) * wgt_g
            Frc_b = _fr_cond(cim, C2, C5) * wgt_g
            ok_rc = (wiz > 0.0) & (rlz > 0.0)
            pdf_rc = jnp.where(ok_rc, pdf_rc, 0.0)
            # local -> world (z flipped back on twosided back hits)
            rlz_w = jnp.where(flip, -rlz, rlz) if has_ts else rlz
            rcx = sx * rlx + tx * rly + shx * rlz_w
            rcy = sy * rlx + ty * rly + shy * rlz_w
            rcz = sz * rlx + tz * rly + shz * rlz_w
        else:
            rcx = rcy = rcz = pdf_rc = Frc_r = Frc_g = Frc_b = \
                jnp.zeros_like(ox)

        if has_rdiel:
            # GGX rough dielectric (RoughDielectric.sample mirror)
            eta_d = jnp.maximum(C0, 1e-3)
            sgn_i = jnp.where(wiz >= 0.0, 1.0, -1.0)
            mdx, mdy, mdz = _vndf_sample(
                wix * sgn_i, wiy * sgn_i, wiz * sgn_i, ub1, ub2,
                alpha)
            modx, mody, modz = mdx * sgn_i, mdy * sgn_i, mdz * sgn_i
            cim = wix * modx + wiy * mody + wiz * modz
            fD, cost_d, eta_it, eta_ti = _fr_diel(cim, eta_d)
            pick_d = u_lobe <= fD
            # reflect / refract about the micronormal
            wrx = 2.0 * cim * modx - wix
            wry = 2.0 * cim * mody - wiy
            wrz = 2.0 * cim * modz - wiz
            tfac2 = cim * eta_ti + cost_d
            wtx2 = modx * tfac2 - wix * eta_ti
            wty2 = mody * tfac2 - wiy * eta_ti
            wtz2 = modz * tfac2 - wiz * eta_ti
            wdx = jnp.where(pick_d, wrx, wtx2)
            wdy = jnp.where(pick_d, wry, wty2)
            wdz = jnp.where(pick_d, wrz, wtz2)
            g1i = _ggx_g1(wix * sgn_i, wiy * sgn_i, wiz * sgn_i,
                          mdx, mdy, mdz, alpha)
            sgn_od = jnp.where(wdz >= 0.0, 1.0, -1.0)
            g2o = g1i * _ggx_g1(wdx * sgn_od, wdy * sgn_od,
                                wdz * sgn_od, mdx, mdy, mdz, alpha)
            w_rd = jnp.where(g1i > 0.0,
                             g2o / jnp.maximum(g1i, 1e-20), 0.0)
            w_rd = jnp.where(pick_d, w_rd, w_rd * (eta_ti * eta_ti))
            pdm_d = _vndf_pdf(wix * sgn_i, wiy * sgn_i, wiz * sgn_i,
                              mdx, mdy, mdz, alpha)
            com_d = wdx * modx + wdy * mody + wdz * modz
            jr_d = 1.0 / jnp.maximum(4.0 * jnp.abs(com_d), 1e-20)
            den_d = cim + eta_it * com_d
            jt_d = jnp.abs(com_d) * (eta_it * eta_it) / jnp.maximum(
                den_d * den_d, 1e-20)
            pdf_rd = pdm_d * jnp.where(pick_d, fD * jr_d,
                                       (1.0 - fD) * jt_d)
            same_sd = wdz * wiz > 0.0
            valid_d = jnp.where(pick_d, same_sd,
                                ~same_sd & (cost_d != 0.0))
            pdf_rd = jnp.where(valid_d, pdf_rd, 0.0)
            eta_rd = jnp.where(pick_d, 1.0, eta_it)
            # local -> world
            tdx = sx * wdx + tx * wdy + shx * wdz
            tdy = sy * wdx + ty * wdy + shy * wdz
            tdz = sz * wdx + tz * wdy + shz * wdz
        else:
            tdx = tdy = tdz = pdf_rd = w_rd = jnp.zeros_like(ox)
            eta_rd = jnp.ones_like(ox)

        if has_pl or has_rpl:
            # plastic.cpp / roughplastic.cpp sample: Fresnel lobe choice
            # between the coat reflection and the diffuse base
            eta_p2 = jnp.maximum(C0, 1.0 + 1e-4)
            fdr_s = C1
            nl_s = C2 > 0.5
            F_is, _, _, _ = _fr_diel(cos_wi, eta_p2)
            pick_sp = u_lobe < F_is
            inv_eta2s = 1.0 / (eta_p2 * eta_p2)
            den_sr = 1.0 - jnp.where(nl_s, Rr * fdr_s, fdr_s)
            den_sg = 1.0 - jnp.where(nl_s, Rg * fdr_s, fdr_s)
            den_sb = 1.0 - jnp.where(nl_s, Rb * fdr_s, fdr_s)
        if has_pl:
            # smooth coat: mirror direction (shading normal)
            F_od, _, _, _ = _fr_diel(dzl, eta_p2)
            wdf = inv_eta2s * (1.0 - F_od)
            plx = jnp.where(pick_sp, dx + 2.0 * cos_wi_sgn * shx, ddx)
            ply = jnp.where(pick_sp, dy + 2.0 * cos_wi_sgn * shy, ddy)
            plz = jnp.where(pick_sp, dz + 2.0 * cos_wi_sgn * shz, ddz)
            wPl_r = jnp.where(pick_sp, 1.0,
                              Rr / jnp.maximum(den_sr, 1e-6) * wdf)
            wPl_g = jnp.where(pick_sp, 1.0,
                              Rg / jnp.maximum(den_sg, 1e-6) * wdf)
            wPl_b = jnp.where(pick_sp, 1.0,
                              Rb / jnp.maximum(den_sb, 1e-6) * wdf)
            pdf_pl_f = jnp.where(pick_sp, F_is,
                                 pdf_diff * (1.0 - F_is))
        else:
            plx = ply = plz = pdf_pl_f = jnp.zeros_like(ox)
            wPl_r = wPl_g = wPl_b = jnp.zeros_like(ox)
        if not (has_pl or has_rpl):
            pick_sp = jnp.zeros_like(act)
        if has_rpl:
            # GGX coat: VNDF reflect or cosine diffuse, then weight =
            # full eval / mixture pdf (roughplastic.cpp sample)
            mpx, mpy, mpz = _vndf_sample(wix, wiy, wiz, ub1, ub2,
                                         alpha)
            cimp = wix * mpx + wiy * mpy + wiz * mpz
            splx = 2.0 * cimp * mpx - wix
            sply = 2.0 * cimp * mpy - wiy
            splz = 2.0 * cimp * mpz - wiz
            wolx = jnp.where(pick_sp, splx, dxl)
            woly = jnp.where(pick_sp, sply, dyl)
            wolz = jnp.where(pick_sp, splz, dzl)
            # eval+pdf at the sampled direction
            hqx, hqy, hqz = wix + wolx, wiy + woly, wiz + wolz
            hqn = jnp.sqrt(jnp.maximum(
                hqx * hqx + hqy * hqy + hqz * hqz, 1e-20))
            hqx, hqy, hqz = hqx / hqn, hqy / hqn, hqz / hqn
            cimq = wix * hqx + wiy * hqy + wiz * hqz
            F_mq, _, _, _ = _fr_diel(cimq, eta_p2)
            d_q = _ggx_d(hqx, hqy, hqz, alpha)
            g2_q = (_ggx_g1(wix, wiy, wiz, hqx, hqy, hqz, alpha)
                    * _ggx_g1(wolx, woly, wolz, hqx, hqy, hqz, alpha))
            spec_q = F_mq * d_q * g2_q / jnp.maximum(4.0 * wiz, 1e-20)
            F_oq, _, _, _ = _fr_diel(wolz, eta_p2)
            fac_q = (INV_PI * jnp.maximum(wolz, 0.0)
                     * (1.0 - F_is) * (1.0 - F_oq) * inv_eta2s)
            jac_q = 1.0 / jnp.maximum(
                4.0 * jnp.abs(wolx * hqx + woly * hqy + wolz * hqz),
                1e-20)
            pdf_q = (F_is * _vndf_pdf(wix, wiy, wiz, hqx, hqy, hqz,
                                      alpha) * jac_q
                     + (1.0 - F_is) * INV_PI * jnp.maximum(wolz, 0.0))
            ok_q = (wiz > 0.0) & (wolz > 0.0) & (pdf_q > 1e-20)
            inv_pdf_q = jnp.where(ok_q, 1.0 / jnp.maximum(pdf_q, 1e-20),
                                  0.0)
            wRp_r = (Rr / jnp.maximum(den_sr, 1e-6) * fac_q + spec_q) \
                * inv_pdf_q
            wRp_g = (Rg / jnp.maximum(den_sg, 1e-6) * fac_q + spec_q) \
                * inv_pdf_q
            wRp_b = (Rb / jnp.maximum(den_sb, 1e-6) * fac_q + spec_q) \
                * inv_pdf_q
            pdf_rpl_f = jnp.where(ok_q, pdf_q, 0.0)
            wolz_w = jnp.where(flip, -wolz, wolz) if has_ts else wolz
            rpx = sx * wolx + tx * woly + shx * wolz_w
            rpy = sy * wolx + ty * woly + shy * wolz_w
            rpz = sz * wolx + tz * woly + shz * wolz_w
        else:
            rpx = rpy = rpz = pdf_rpl_f = jnp.zeros_like(ox)
            wRp_r = wRp_g = wRp_b = jnp.zeros_like(ox)

        # combine by surface type
        if multi:
            ndx = jnp.where(is_diff, ddx, jnp.where(
                is_cond, rx, jnp.where(is_diel, gdx, jnp.where(
                    is_rcond, rcx, jnp.where(is_rdiel, tdx, jnp.where(
                        is_pl, plx, rpx))))))
            ndy = jnp.where(is_diff, ddy, jnp.where(
                is_cond, ry, jnp.where(is_diel, gdy, jnp.where(
                    is_rcond, rcy, jnp.where(is_rdiel, tdy, jnp.where(
                        is_pl, ply, rpy))))))
            ndz = jnp.where(is_diff, ddz, jnp.where(
                is_cond, rz, jnp.where(is_diel, gdz, jnp.where(
                    is_rcond, rcz, jnp.where(is_rdiel, tdz, jnp.where(
                        is_pl, plz, rpz))))))
            wR = jnp.where(is_diff, Rr, jnp.where(
                is_cond, Fc_r, jnp.where(is_diel, w_diel, jnp.where(
                    is_rcond, Frc_r, jnp.where(is_rdiel, w_rd, jnp.where(
                        is_pl, wPl_r, wRp_r))))))
            wG = jnp.where(is_diff, Rg, jnp.where(
                is_cond, Fc_g, jnp.where(is_diel, w_diel, jnp.where(
                    is_rcond, Frc_g, jnp.where(is_rdiel, w_rd, jnp.where(
                        is_pl, wPl_g, wRp_g))))))
            wB = jnp.where(is_diff, Rb, jnp.where(
                is_cond, Fc_b, jnp.where(is_diel, w_diel, jnp.where(
                    is_rcond, Frc_b, jnp.where(is_rdiel, w_rd, jnp.where(
                        is_pl, wPl_b, wRp_b))))))
            pdf_fwd = jnp.where(is_diff, pdf_diff, jnp.where(
                is_cond, 1.0, jnp.where(is_diel, pdf_diel, jnp.where(
                    is_rcond, pdf_rc, jnp.where(is_rdiel, pdf_rd,
                                                jnp.where(is_pl, pdf_pl_f,
                                                          pdf_rpl_f))))))
        else:
            ndx, ndy, ndz = ddx, ddy, ddz
            wR, wG, wB = Rr, Rg, Rb
            pdf_fwd = pdf_diff
        Br = jnp.where(act_next, Br * wR, Br)
        Bg = jnp.where(act_next, Bg * wG, Bg)
        Bb = jnp.where(act_next, Bb * wB, Bb)
        if multi:
            eta_acc = jnp.where(act_next & is_diel,
                                eta_acc * eta_mult, eta_acc)
            if has_rdiel:
                eta_acc = jnp.where(act_next & is_rdiel,
                                    eta_acc * eta_rd, eta_acc)
        bmax = jnp.maximum(Br, jnp.maximum(Bg, Bb))
        act_next = act_next & (pdf_fwd > 0.0) & (bmax > 0.0)
        sgn_b = jnp.where(ndx * ngx + ndy * ngy + ndz * ngz >= 0.0,
                          1.0, -1.0)
        ox = px + sgn_b * off * ngx
        oy = py + sgn_b * off * ngy
        oz = pz + sgn_b * off * ngz
        dx, dy, dz = ndx, ndy, ndz
        prev_pdf = jnp.where(act_next, pdf_fwd, prev_pdf)
        if multi:
            smooth_lobe = is_diff
            if has_rcond:
                smooth_lobe = smooth_lobe | is_rcond
            if has_rpl:
                smooth_lobe = smooth_lobe | is_rpl
            if has_pl:
                # plastic: delta only when the coat reflection was picked
                smooth_lobe = smooth_lobe | (is_pl & ~pick_sp)
            prev_delta = jnp.where(act_next,
                                   jnp.where(smooth_lobe, 0.0, 1.0),
                                   prev_delta)
        else:
            prev_delta = jnp.where(act_next, 0.0, prev_delta)

        # ---- russian roulette (path.py:117-128; eta^2 factor) ----
        if depth + 1 >= rr_depth:
            rr_p = jnp.minimum(bmax * eta_acc * eta_acc, 0.95)
            u_rr = _rng1(seed_x, lane, dbase + SLOT_RR)
            survive = u_rr < rr_p
            inv_p = 1.0 / jnp.maximum(rr_p, 1e-8)
            Br = jnp.where(act_next, Br * inv_p, Br)
            Bg = jnp.where(act_next, Bg * inv_p, Bg)
            Bb = jnp.where(act_next, Bb * inv_p, Bb)
            act_next = act_next & survive
    else:
        # ablation: rays continue with stale direction/throughput; only
        # the hit-point advance remains so state stores stay realistic
        ox = px + off * ngx
        oy = py + off * ngy
        oz = pz + off * ngz
    return (ox, oy, oz, dx, dy, dz, Lr, Lg, Lb, Br, Bg, Bb, eta_acc,
            prev_pdf, prev_delta, act_next)


def _mk_kernel(max_depth, rr_depth, n_faces, n_lights, btypes,
               n_tex_rows, env_pos=-1, smooth=False):
    """Brute-force megakernel: SMEM triangle table, O(F) sweep per query
    (the right shape for scenes up to MAX_FACES)."""

    def kernel(tris_ref, light_ref, env_ref, tex_ref, en_ref,
               lane_ref, seed_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
               lr_ref, lg_ref, lb_ref):
        lane = lane_ref[:]
        seed_x = seed_ref[:] ^ jnp.uint32(0xDEADBEEF)

        multi = tuple(btypes) != (0,)
        has_tex = 5 in btypes

        def closest(ox, oy, oz, dx, dy, dz, act_b):
            if smooth:
                n_attr = TRI_COLS
            elif has_tex:
                n_attr = 30
            else:
                n_attr = 24 if multi else 17
            hit = _closest_hit(tris_ref, n_faces, ox, oy, oz, dx, dy, dz,
                               n_attr)
            (t, P0x, P0y, P0z, E1x, E1y, E1z, E2x, E2y, E2z,
             Rr, Rg, Rb, Er, Eg, Eb, IsL, PdfA,
             Btype, C0, C1, C2, C3, C4, C5,
             U0x, U0y, U1x, U1y, U2x, U2y,
             N0x, N0y, N0z, N1x, N1y, N1z, N2x, N2y, N2z) = hit
            ngx, ngy, ngz = _cross(E1x, E1y, E1z, E2x, E2y, E2z)
            ngx, ngy, ngz = _normalize3(ngx, ngy, ngz)
            if has_tex or smooth:
                # recompute the winner's barycentrics (compute_si mirror:
                # ray_triangle then clip)
                pvx, pvy, pvz = _cross(dx, dy, dz, E2x, E2y, E2z)
                det = E1x * pvx + E1y * pvy + E1z * pvz
                okd = jnp.abs(det) > DET_EPS
                inv = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
                tvx, tvy, tvz = ox - P0x, oy - P0y, oz - P0z
                ub = jnp.clip((tvx * pvx + tvy * pvy + tvz * pvz) * inv,
                              0.0, 1.0)
                qvx, qvy, qvz = _cross(tvx, tvy, tvz, E1x, E1y, E1z)
                vb = jnp.clip((dx * qvx + dy * qvy + dz * qvz) * inv,
                              0.0, 1.0)
                b0 = 1.0 - ub - vb
            if has_tex:
                uvx = U0x * b0 + U1x * ub + U2x * vb
                uvy = U0y * b0 + U1y * ub + U2y * vb
                # textured diffuse bands: 5 (one-sided) and 21
                # (twosided) collapse to 0 / 16 after the fetch
                is_texd = ((Btype >= 4.5) & (Btype < 5.5)) \
                    | ((Btype >= 20.5) & (Btype < 21.5))
                tr, tg, tb = _tex_eval(tex_ref, n_tex_rows,
                                       C0, C1, C2, C3, C4, uvx, uvy)
                Rr = jnp.where(is_texd, tr, Rr)
                Rg = jnp.where(is_texd, tg, Rg)
                Rb = jnp.where(is_texd, tb, Rb)
                Btype = jnp.where(is_texd,
                                  jnp.where(Btype >= 15.5, 16.0, 0.0),
                                  Btype)
            if smooth:
                # interpolated shading normal (compute_si mirror;
                # flat faces store ng at all three slots)
                nsx = N0x * b0 + N1x * ub + N2x * vb
                nsy = N0y * b0 + N1y * ub + N2y * vb
                nsz = N0z * b0 + N1z * ub + N2z * vb
                rinv = _rsqrt_safe_t(nsx * nsx + nsy * nsy + nsz * nsz)
                shx, shy, shz = nsx * rinv, nsy * rinv, nsz * rinv
            else:
                shx, shy, shz = ngx, ngy, ngz
            return (jnp.isfinite(t), t, ngx, ngy, ngz, shx, shy, shz,
                    Rr, Rg, Rb, IsL, PdfA, Btype, C0, C1, C2, C3, C4, C5)

        def anyhit(ox, oy, oz, dx, dy, dz, maxt, act_b):
            return _any_hit(tris_ref, n_faces, ox, oy, oz, dx, dy, dz,
                            maxt)

        lc = lambda j, k: light_ref[j, k]
        env_ctx = None
        if env_pos >= 0:
            env_ctx = (
                lambda k: env_ref[0, k],                     # scalars
                lambda dth, k: en_ref[:, 8 * dth + k, :],    # NEE slab
                tex_ref, n_tex_rows, env_pos,
            )
        Lr, Lg, Lb = _trace_loop(
            closest, anyhit, lc, n_lights, btypes, max_depth, rr_depth,
            lane, seed_x,
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:], act_ref[:] > 0.5,
            env_ctx=env_ctx)
        lr_ref[:] = Lr
        lg_ref[:] = Lg
        lb_ref[:] = Lb

    return kernel


def _mk_kernel_bvh(max_depth, rr_depth, n_nodes, n_lights, btypes,
                   rpl, batch, smooth=False, mxu=False, res=False,
                   box16=False):
    """BVH-packet megakernel: same fused path loop, but ray queries run
    the SMEM-node / HBM-leaf packet traversal (ops/pallas/traverse.py) —
    lifts the MAX_FACES cap to the SMEM node budget (~300k triangles).
    ``mxu`` switches leaf intersection to the dot_general stage; ``res``
    switches the winner-attribute resolve to the one-hot matmul form.
    With the MXU stage active the wave-parallel walk is used (USE_WAVE,
    traverse.py round 4: up to WAVE node visits per vector->scalar
    sync instead of one)."""
    from .traverse import (USE_WAVE, traverse_any, traverse_any_wave,
                           traverse_closest, traverse_closest_wave)

    wave = USE_WAVE and mxu

    def kernel(node_box_ref, node_meta_ref, light_ref, rows_ref, *rest):
        if mxu:
            mxu_ref, rest = rest[0], rest[1:]
        if res:
            res_ref, rest = rest[0], rest[1:]
        (lane_ref, seed_ref,
         ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, act_ref,
         lr_ref, lg_ref, lb_ref, qbuf, sems) = rest[:14]
        rest = rest[14:]
        mctx = rctx = None
        if mxu:
            mctx = (mxu_ref, rest[0], rest[1])
            rest = rest[2:]
        if res:
            rctx = (res_ref, rest[0], rest[1])
        lane = lane_ref[:]
        seed_x = seed_ref[:] ^ jnp.uint32(0xDEADBEEF)
        act0 = act_ref[:] > 0.5
        shape = lane.shape
        zero = jnp.zeros(shape)

        # 32-col leaf-row layout (traverse.py): 0:9 p0|e1|e2 | 9:12 refl
        # | 12 is_light | 13 pdf_area(/alpha) | 14 btype | 15:21 bparams
        # | 21 face_id | 22:31 n0 n1 n2; the geometric normal is
        # recomputed from the edges
        multi = tuple(btypes) != (0,)
        res_cols = tuple(range(0, 15))
        if multi:
            res_cols += tuple(range(15, 21))
        if smooth:
            res_cols += tuple(range(22, 31))

        def closest(ox, oy, oz, dx, dy, dz, act_b):
            if wave:
                found, t, attrs = traverse_closest_wave(
                    node_box_ref, node_meta_ref, rows_ref,
                    qbuf, sems, n_nodes,
                    ox, oy, oz, dx, dy, dz,
                    jnp.full(shape, jnp.inf), act_b,
                    resolve_cols=res_cols, rpl=rpl,
                    mxu_ctx=mctx, res_ctx=rctx, box16=box16)
            else:
                found, t, attrs = traverse_closest(
                    node_box_ref, node_meta_ref, rows_ref,
                    qbuf, sems, n_nodes,
                    ox, oy, oz, dx, dy, dz,
                    jnp.full(shape, jnp.inf), act_b,
                    resolve_cols=res_cols, rpl=rpl, batch=batch,
                    mxu_ctx=mctx, res_ctx=rctx, box16=box16)
            (P0x, P0y, P0z, E1x, E1y, E1z, E2x, E2y, E2z,
             Rr, Rg, Rb, IsL, PdfA, Btype) = attrs[:15]
            k = 15
            if multi:
                C0, C1, C2, C3, C4, C5 = attrs[k:k + 6]
                k += 6
            else:
                Btype = C0 = C1 = C2 = C3 = C4 = C5 = zero
            ngx, ngy, ngz = _cross(E1x, E1y, E1z, E2x, E2y, E2z)
            ngx, ngy, ngz = _normalize3(ngx, ngy, ngz)
            if smooth:
                (N0x, N0y, N0z, N1x, N1y, N1z,
                 N2x, N2y, N2z) = attrs[k:k + 9]
                # winner barycentrics -> interpolated shading normal
                # (compute_si mirror; flat faces replicate ng)
                pvx, pvy, pvz = _cross(dx, dy, dz, E2x, E2y, E2z)
                det = E1x * pvx + E1y * pvy + E1z * pvz
                okd = jnp.abs(det) > DET_EPS
                inv = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
                tvx, tvy, tvz = ox - P0x, oy - P0y, oz - P0z
                ub = jnp.clip((tvx * pvx + tvy * pvy + tvz * pvz) * inv,
                              0.0, 1.0)
                qvx, qvy, qvz = _cross(tvx, tvy, tvz, E1x, E1y, E1z)
                vb = jnp.clip((dx * qvx + dy * qvy + dz * qvz) * inv,
                              0.0, 1.0)
                b0 = 1.0 - ub - vb
                nsx = N0x * b0 + N1x * ub + N2x * vb
                nsy = N0y * b0 + N1y * ub + N2y * vb
                nsz = N0z * b0 + N1z * ub + N2z * vb
                rinv = _rsqrt_safe_t(nsx * nsx + nsy * nsy + nsz * nsz)
                shx, shy, shz = nsx * rinv, nsy * rinv, nsz * rinv
            else:
                shx, shy, shz = ngx, ngy, ngz
            valid = found > 0.0
            t = jnp.where(valid, t, jnp.inf)
            return (valid, t, ngx, ngy, ngz, shx, shy, shz, Rr, Rg, Rb,
                    IsL, PdfA, Btype, C0, C1, C2, C3, C4, C5)

        def anyhit(ox, oy, oz, dx, dy, dz, maxt, act_b):
            if wave:
                return traverse_any_wave(
                    node_box_ref, node_meta_ref, rows_ref,
                    qbuf, sems, n_nodes,
                    ox, oy, oz, dx, dy, dz, maxt, act_b,
                    rpl=rpl, mxu_ctx=mctx,
                    box16=box16) > 0.5
            return traverse_any(
                node_box_ref, node_meta_ref, rows_ref,
                qbuf, sems, n_nodes,
                ox, oy, oz, dx, dy, dz, maxt, act_b,
                rpl=rpl, batch=batch, mxu_ctx=mctx,
                box16=box16) > 0.5

        lc = lambda j, k: light_ref[j, k]
        Lr, Lg, Lb = _trace_loop(
            closest, anyhit, lc, n_lights, btypes, max_depth, rr_depth,
            lane, seed_x,
            ox_ref[:], oy_ref[:], oz_ref[:],
            dx_ref[:], dy_ref[:], dz_ref[:], act0)
        lr_ref[:] = Lr
        lg_ref[:] = Lg
        lb_ref[:] = Lb

    return kernel


@partial(jax.jit,
         static_argnames=("max_depth", "rr_depth", "n_faces", "n_lights",
                          "btypes", "interpret", "env_pos", "smooth"))
def megakernel_trace(tris, light, lane, o, d, active, seed,
                     max_depth: int, rr_depth: int, n_faces: int,
                     n_lights: int, btypes: tuple = (0,),
                     interpret: bool = False, tex=None,
                     env_meta=None, env_nee=None, env_pos: int = -1,
                     smooth: bool = False):
    """Run the path-tracing megakernel.  Returns per-lane L (N, 3)."""
    if tex is None:
        tex = jnp.zeros((1, LANES))
    has_env = env_pos >= 0
    n_tex_rows = (int(tex.shape[0])
                  if (5 in btypes or has_env) else 0)
    if env_meta is None:
        env_meta = jnp.zeros((1, ENV_COLS))
    n = o.shape[0]
    n_pad = -(-n // R_TILE) * R_TILE
    pad = n_pad - n
    rows = n_pad // LANES

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            rows, LANES)

    lane_t = comp(lane.astype(jnp.uint32)).astype(jnp.uint32)
    seed_t = jnp.full((rows, LANES), jnp.asarray(seed, jnp.uint32))
    args = [
        lane_t, seed_t,
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(active.astype(jnp.float32)),
    ]
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    K = 8 * max_depth
    if has_env:
        # per-(lane, depth) precomputed envmap NEE samples, tiled
        # (rows, K, LANES) so each grid step sees its packet's slab
        en_t = jnp.pad(env_nee, ((0, pad), (0, 0))).reshape(
            rows, LANES, K)
        en_t = jnp.transpose(en_t, (0, 2, 1))
        en_spec = pl.BlockSpec((SUB, K, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        en_t = jnp.zeros((SUB, 1, LANES))
        en_spec = pl.BlockSpec((SUB, 1, LANES), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    kernel = _mk_kernel(max_depth, rr_depth, n_faces, n_lights,
                        btypes, n_tex_rows, env_pos, smooth)
    lr, lg, lb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),   # env meta
            pl.BlockSpec(memory_space=pltpu.VMEM),   # texture arena
            en_spec,                                  # env NEE slab
        ] + [ray_spec] * 9,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 3,
        interpret=interpret,
    )(tris, light, env_meta, tex, en_t, *args)

    flat = lambda x: x.reshape(n_pad)[:n]
    return jnp.stack([flat(lr), flat(lg), flat(lb)], axis=-1)


# ----------------------------------------------------- BVH-packet variant

def megakernel_bvh_applicable(scene) -> bool:
    """Plugin-subset check for the BVH megakernel: same BSDF/emitter
    constraints as ``megakernel_applicable`` but faces bounded only by
    the SMEM node budget (requires scene.packet_accel, built at
    make_scene).  Bitmap textures and small envmaps are supported when
    the accel carries the MXU one-hot resolve layout (round 4: uv rows
    ride the transposed resolve table; such scenes route through the
    per-bounce pipeline, megapath._sorted_bvh)."""
    from .traverse import MAX_NODES, MAX_NODES_B16

    accel = getattr(scene, "packet_accel", None)
    if accel is None:
        return False
    cap = MAX_NODES_B16 if accel.box16 else MAX_NODES
    if accel.n_nodes > cap:
        return _log_inelig(
            f"packet accel has {accel.n_nodes} nodes > SMEM cap {cap}"
            " — wavefront fallback")
    return _plugin_subset_ok(scene, allow_tex=bool(accel.mxu))


def pack_scene_bvh(scene, layout):
    """Packed leaf-row table + light table for the BVH megakernel.

    Reuses pack_scene's face shading assembly, re-laid out into the
    traverse.py 32-column slot format (refl | ng | is_light | pdf_area |
    btype | bparams | face_id | shading normals) and permuted into HBM
    leaf rows.  When the layout has the MXU leaf stage, also returns
    the Baldwin-Weber coefficient table and the transposed one-hot
    resolve table (with per-vertex uv rows for textured scenes), else
    None for both.  Returns (rows, mxu_rows, res_rows, tex, env_meta,
    light, L)."""
    from .traverse import pack_leaf_rows, pack_mxu_rows, pack_resolve_rows

    tris, light, F, L, tex, env_meta = pack_scene(scene)
    t = tris[:F]
    cols = jnp.concatenate([
        t[:, 0:9],                 # p0 | e1 | e2
        t[:, 9:12],                # refl
        t[:, 15:18],               # is_light | pdf_area(/alpha) | btype
        t[:, 18:24],               # bparams
        jnp.arange(F, dtype=jnp.float32)[:, None],
        t[:, 30:39],               # n0 n1 n2 (shading normals)
        jnp.zeros((F, 1)),
    ], axis=1)
    rows = pack_leaf_rows(cols, layout)
    mxu_rows = pack_mxu_rows(cols, layout) if layout.mxu else None
    res_rows = (pack_resolve_rows(cols, layout, uv=t[:, 24:30])
                if layout.mxu else None)
    return rows, mxu_rows, res_rows, tex, env_meta, light, L


@partial(jax.jit,
         static_argnames=("max_depth", "rr_depth", "n_nodes", "n_lights",
                          "btypes", "interpret", "rpl", "batch",
                          "smooth", "box16"))
def megakernel_trace_bvh(node_box, node_meta, rows, light,
                         lane, o, d, active, seed,
                         max_depth: int, rr_depth: int, n_nodes: int,
                         n_lights: int, btypes: tuple = (0,),
                         interpret: bool = False,
                         rpl: int = None, batch: int = None,
                         smooth: bool = False, mxu_rows=None,
                         res_rows=None, box16: bool = False):
    """Path-tracing megakernel with packet-BVH ray queries; same sample
    streams / image as megakernel_trace, unbounded by MAX_FACES."""
    from .traverse import (BATCH, PACK, QUEUE, RES_COLS,
                           RPL, USE_WAVE, mxu_scratch_shapes,
                           res_width)
    from .traverse import SUB as SUB_BVH

    rpl = RPL if rpl is None else rpl
    batch = BATCH if batch is None else batch
    mxu = mxu_rows is not None
    res = res_rows is not None

    n = o.shape[0]
    r_tile = SUB_BVH * LANES
    n_pad = -(-n // r_tile) * r_tile
    pad = n_pad - n
    rows_t = n_pad // LANES

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            rows_t, LANES)

    lane_t = comp(lane.astype(jnp.uint32)).astype(jnp.uint32)
    seed_t = jnp.full((rows_t, LANES), jnp.asarray(seed, jnp.uint32))
    args = [
        lane_t, seed_t,
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(active.astype(jnp.float32)),
    ]
    grid = (rows_t // SUB_BVH,)
    ray_spec = pl.BlockSpec((SUB_BVH, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = _mk_kernel_bvh(max_depth, rr_depth, n_nodes, n_lights,
                            btypes, rpl, batch, smooth, mxu=mxu,
                            res=res, box16=box16)
    # with BOTH the MXU leaf stage and the one-hot resolve active the
    # SMEM leaf-row queue is dead code — shrink it so large-leaf
    # configs (rpl=64 for multi-million-triangle scenes) fit the SMEM
    # budget next to the node tables
    qrpl = 1 if (mxu and res) else rpl
    scratch = [
        pltpu.SMEM((QUEUE, qrpl, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((QUEUE,)),
    ]
    extra_in = []
    extra_args = []
    if mxu:
        scratch += mxu_scratch_shapes(rpl, USE_WAVE)
        extra_in += [pl.BlockSpec(memory_space=pl.ANY)]
        extra_args += [mxu_rows]
    if res:
        scratch += [pltpu.VMEM((2 * RES_COLS, res_width(rpl)),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
        extra_in += [pl.BlockSpec(memory_space=pl.ANY)]
        extra_args += [res_rows]
    lr, lg, lb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node_box (packed)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node_meta (packed)
            pl.BlockSpec(memory_space=pltpu.SMEM),   # light
            pl.BlockSpec(memory_space=pl.ANY),       # leaf rows (HBM)
        ] + extra_in + [ray_spec] * 9,
        out_specs=[ray_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((rows_t, LANES), jnp.float32)] * 3,
        scratch_shapes=scratch,
        interpret=interpret,
    )(node_box, node_meta, light, rows, *extra_args, *args)

    flat = lambda x: x.reshape(n_pad)[:n]
    return jnp.stack([flat(lr), flat(lg), flat(lb)], axis=-1)


# ------------------------------------------- sorted per-bounce pipeline

def _mk_bounce_kernel_bvh(depth, max_depth, rr_depth, n_nodes, n_lights,
                          btypes, rpl, batch, smooth, env_pos,
                          mxu=False, res=False,
                          box16=False):
    """ONE bounce of the BVH megakernel with full state I/O — the
    building block of the sorted per-bounce pipeline: between launches
    the caller re-sorts rays by (direction octant, position cell) so
    every packet traverses coherently (PERF.md round-2: sorted packets
    are ~8-10x cheaper than divergent ones).  ``res`` enables the
    one-hot matmul attribute resolve; bitmap-textured diffuse faces
    (btype 5/21) additionally resolve per-vertex uv rows and evaluate
    the texture arena in-kernel like the brute megakernel
    (path.cpp:216 fused texture vcalls)."""
    from .traverse import (COL_UV, USE_WAVE, traverse_any,
                           traverse_any_wave, traverse_closest,
                           traverse_closest_wave)

    wave = USE_WAVE and mxu

    has_tex = any(b % 16 == 5 for b in btypes)
    assert not has_tex or res, "textured BVH kernel needs the resolve table"

    def kernel(node_box_ref, node_meta_ref, light_ref, env_ref, tex_ref,
               tflag_ref, en_ref, rows_ref, *rest):
        if mxu:
            mxu_ref, rest = rest[0], rest[1:]
        if res:
            res_ref, rest = rest[0], rest[1:]
        lane_ref, seed_ref = rest[0], rest[1]
        st_refs = rest[2:]
        in_refs = st_refs[:16]
        out_refs = st_refs[16:32]
        qbuf, sems = st_refs[32], st_refs[33]
        st_refs = st_refs[34:]
        mctx = rctx = None
        if mxu:
            mctx = (mxu_ref, st_refs[0], st_refs[1])
            st_refs = st_refs[2:]
        if res:
            rctx = (res_ref, st_refs[0], st_refs[1])

        # ---- path-state compaction (SURVEY §7): the caller sorts dead
        # lanes to trailing tiles, so a tile whose activity flag is 0
        # passes its state straight through and skips the whole BVH
        # walk — the static-shape equivalent of wavefront compaction.
        flag = tflag_ref[pl.program_id(0)]

        @pl.when(flag == 0)
        def _passthrough():
            for r, v in zip(out_refs, in_refs):
                r[:] = v[:]

        @pl.when(flag > 0)
        def _body():
            _bounce_body(node_box_ref, node_meta_ref, light_ref,
                         env_ref, tex_ref, en_ref, rows_ref, lane_ref,
                         seed_ref, in_refs, out_refs, qbuf, sems, mctx,
                         rctx)

    def _bounce_body(node_box_ref, node_meta_ref, light_ref, env_ref,
                     tex_ref, en_ref, rows_ref, lane_ref, seed_ref,
                     in_refs, out_refs, qbuf, sems, mctx, rctx):
        lane = lane_ref[:]
        seed_x = seed_ref[:] ^ jnp.uint32(0xDEADBEEF)
        shape = lane.shape
        zero = jnp.zeros(shape)
        n_tex_rows = int(tex_ref.shape[0])

        multi = tuple(btypes) != (0,)
        res_cols = tuple(range(0, 15))
        if multi:
            res_cols += tuple(range(15, 21))
        if smooth:
            res_cols += tuple(range(22, 31))
        if has_tex:
            res_cols += tuple(range(COL_UV, COL_UV + 6))

        def closest(ox, oy, oz, dx, dy, dz, act_b):
            if wave:
                found, t, attrs = traverse_closest_wave(
                    node_box_ref, node_meta_ref, rows_ref,
                    qbuf, sems, n_nodes,
                    ox, oy, oz, dx, dy, dz,
                    jnp.full(shape, jnp.inf), act_b,
                    resolve_cols=res_cols, rpl=rpl,
                    mxu_ctx=mctx, res_ctx=rctx, box16=box16)
            else:
                found, t, attrs = traverse_closest(
                    node_box_ref, node_meta_ref, rows_ref,
                    qbuf, sems, n_nodes,
                    ox, oy, oz, dx, dy, dz,
                    jnp.full(shape, jnp.inf), act_b,
                    resolve_cols=res_cols, rpl=rpl, batch=batch,
                    mxu_ctx=mctx, res_ctx=rctx, box16=box16)
            (P0x, P0y, P0z, E1x, E1y, E1z, E2x, E2y, E2z,
             Rr, Rg, Rb, IsL, PdfA, Btype) = attrs[:15]
            k = 15
            if multi:
                C0, C1, C2, C3, C4, C5 = attrs[k:k + 6]
                k += 6
            else:
                Btype = C0 = C1 = C2 = C3 = C4 = C5 = zero
            ngx, ngy, ngz = _cross(E1x, E1y, E1z, E2x, E2y, E2z)
            ngx, ngy, ngz = _normalize3(ngx, ngy, ngz)
            if smooth or has_tex:
                # winner barycentrics (compute_si mirror)
                pvx, pvy, pvz = _cross(dx, dy, dz, E2x, E2y, E2z)
                det = E1x * pvx + E1y * pvy + E1z * pvz
                okd = jnp.abs(det) > DET_EPS
                inv = jnp.where(okd, 1.0 / jnp.where(okd, det, 1.0), 0.0)
                tvx, tvy, tvz = ox - P0x, oy - P0y, oz - P0z
                ub = jnp.clip((tvx * pvx + tvy * pvy + tvz * pvz) * inv,
                              0.0, 1.0)
                qvx, qvy, qvz = _cross(tvx, tvy, tvz, E1x, E1y, E1z)
                vb = jnp.clip((dx * qvx + dy * qvy + dz * qvz) * inv,
                              0.0, 1.0)
                b0 = 1.0 - ub - vb
            if has_tex:
                kk = len(res_cols) - 6
                (U0x, U0y, U1x, U1y, U2x, U2y) = attrs[kk:kk + 6]
                uvx = U0x * b0 + U1x * ub + U2x * vb
                uvy = U0y * b0 + U1y * ub + U2y * vb
                # textured diffuse bands 5 (one-sided) / 21 (twosided)
                # collapse to 0 / 16 after the fetch (brute-kernel
                # mirror, megakernel.py _mk_kernel)
                is_texd = ((Btype >= 4.5) & (Btype < 5.5)) \
                    | ((Btype >= 20.5) & (Btype < 21.5))
                tr, tg, tb_ = _tex_eval(tex_ref, n_tex_rows,
                                        C0, C1, C2, C3, C4, uvx, uvy)
                Rr = jnp.where(is_texd, tr, Rr)
                Rg = jnp.where(is_texd, tg, Rg)
                Rb = jnp.where(is_texd, tb_, Rb)
                Btype = jnp.where(is_texd,
                                  jnp.where(Btype >= 15.5, 16.0, 0.0),
                                  Btype)
            if smooth:
                (N0x, N0y, N0z, N1x, N1y, N1z,
                 N2x, N2y, N2z) = attrs[k:k + 9]
                nsx = N0x * b0 + N1x * ub + N2x * vb
                nsy = N0y * b0 + N1y * ub + N2y * vb
                nsz = N0z * b0 + N1z * ub + N2z * vb
                rinv = _rsqrt_safe_t(nsx * nsx + nsy * nsy + nsz * nsz)
                shx, shy, shz = nsx * rinv, nsy * rinv, nsz * rinv
            else:
                shx, shy, shz = ngx, ngy, ngz
            valid = found > 0.0
            t = jnp.where(valid, t, jnp.inf)
            return (valid, t, ngx, ngy, ngz, shx, shy, shz, Rr, Rg, Rb,
                    IsL, PdfA, Btype, C0, C1, C2, C3, C4, C5)

        def anyhit(ox, oy, oz, dx, dy, dz, maxt, act_b):
            if wave:
                return traverse_any_wave(
                    node_box_ref, node_meta_ref, rows_ref,
                    qbuf, sems, n_nodes,
                    ox, oy, oz, dx, dy, dz, maxt, act_b,
                    rpl=rpl, mxu_ctx=mctx,
                    box16=box16) > 0.5
            return traverse_any(
                node_box_ref, node_meta_ref, rows_ref,
                qbuf, sems, n_nodes,
                ox, oy, oz, dx, dy, dz, maxt, act_b,
                rpl=rpl, batch=batch, mxu_ctx=mctx,
                box16=box16) > 0.5

        lc = lambda j, k: light_ref[j, k]
        env_ctx = None
        if env_pos >= 0:
            env_ctx = (
                lambda k: env_ref[0, k],
                # per-bounce slab carries only THIS depth's 8 features
                lambda dth, k: en_ref[:, k, :],
                tex_ref, int(tex_ref.shape[0]), env_pos,
            )
        state = tuple(r[:] for r in in_refs[:15]) + (in_refs[15][:] > 0.5,)
        out = _bounce_step(closest, anyhit, lc, n_lights, btypes, depth,
                           max_depth, rr_depth, lane, seed_x, env_ctx,
                           state)
        for r, v in zip(out_refs[:15], out[:15]):
            r[:] = v
        out_refs[15][:] = out[15].astype(jnp.float32)

    return kernel


@partial(jax.jit,
         static_argnames=("depth", "max_depth", "rr_depth", "n_nodes",
                          "n_lights", "btypes", "interpret", "rpl",
                          "batch", "smooth", "env_pos", "box16"))
def megakernel_bounce_bvh(node_box, node_meta, rows, light, lane, seed,
                          state, depth: int, max_depth: int,
                          rr_depth: int, n_nodes: int, n_lights: int,
                          btypes: tuple = (0,), interpret: bool = False,
                          rpl: int = None, batch: int = None,
                          smooth: bool = False, env_meta=None,
                          env_nee_d=None, env_pos: int = -1, tex=None,
                          mxu_rows=None, res_rows=None,
                          box16: bool = False):
    """One sorted-pipeline bounce over flat (N,) state arrays.  ``state``
    is the 16-tuple of (N,) float arrays matching _bounce_step (act as
    f32 0/1); ``env_nee_d`` is this depth's (N, 8) envmap NEE slice."""
    from .traverse import (BATCH, PACK, QUEUE, RES_COLS,
                           RPL, USE_WAVE, mxu_scratch_shapes,
                           res_width)
    from .traverse import SUB as SUB_BVH

    rpl = RPL if rpl is None else rpl
    batch = BATCH if batch is None else batch
    mxu = mxu_rows is not None
    res = res_rows is not None
    n = lane.shape[0]
    r_tile = SUB_BVH * LANES
    n_pad = -(-n // r_tile) * r_tile
    pad = n_pad - n
    rows_t = n_pad // LANES

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill).reshape(
            rows_t, LANES)

    lane_t = comp(lane.astype(jnp.uint32)).astype(jnp.uint32)
    seed_t = jnp.full((rows_t, LANES), jnp.asarray(seed, jnp.uint32))
    fills = [0.0] * 5 + [1.0] + [0.0] * 10   # dz pad 1 to keep rays valid
    st_t = [comp(x, f) for x, f in zip(state, fills)]

    grid = (rows_t // SUB_BVH,)
    ray_spec = pl.BlockSpec((SUB_BVH, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    if env_pos >= 0:
        en_t = jnp.pad(env_nee_d, ((0, pad), (0, 0))).reshape(
            rows_t, LANES, 8)
        en_t = jnp.transpose(en_t, (0, 2, 1))
        en_spec = pl.BlockSpec((SUB_BVH, 8, LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    else:
        en_t = jnp.zeros((SUB_BVH, 1, LANES))
        en_spec = pl.BlockSpec((SUB_BVH, 1, LANES), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    if env_meta is None:
        env_meta = jnp.zeros((1, ENV_COLS))
    if tex is None:
        tex = jnp.zeros((1, LANES))
    kernel = _mk_bounce_kernel_bvh(depth, max_depth, rr_depth, n_nodes,
                                   n_lights, btypes, rpl, batch, smooth,
                                   env_pos, mxu=mxu, res=res, box16=box16)
    # per-tile activity flags: with lanes sorted dead-last, trailing
    # tiles go fully inactive and the kernel passes them through
    tflags = (st_t[15].reshape(grid[0], -1).max(axis=-1)
              > 0.5).astype(jnp.int32)
    # with BOTH the MXU leaf stage and the one-hot resolve active the
    # SMEM leaf-row queue is dead code — shrink it so large-leaf
    # configs (rpl=64 for multi-million-triangle scenes) fit the SMEM
    # budget next to the node tables
    qrpl = 1 if (mxu and res) else rpl
    scratch = [
        pltpu.SMEM((QUEUE, qrpl, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((QUEUE,)),
    ]
    extra_in = []
    extra_args = []
    if mxu:
        scratch += mxu_scratch_shapes(rpl, USE_WAVE)
        extra_in += [pl.BlockSpec(memory_space=pl.ANY)]
        extra_args += [mxu_rows]
    if res:
        scratch += [pltpu.VMEM((2 * RES_COLS, res_width(rpl)),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
        extra_in += [pl.BlockSpec(memory_space=pl.ANY)]
        extra_args += [res_rows]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node_box
            pl.BlockSpec(memory_space=pltpu.SMEM),   # node_meta
            pl.BlockSpec(memory_space=pltpu.SMEM),   # light
            pl.BlockSpec(memory_space=pltpu.SMEM),   # env meta
            pl.BlockSpec(memory_space=pltpu.VMEM),   # tex arena
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile flags
            en_spec,                                  # env NEE slice
            pl.BlockSpec(memory_space=pl.ANY),       # leaf rows (HBM)
        ] + extra_in + [ray_spec] * 18,
        out_specs=[ray_spec] * 16,
        out_shape=[jax.ShapeDtypeStruct((rows_t, LANES),
                                        jnp.float32)] * 16,
        scratch_shapes=scratch,
        interpret=interpret,
    )(node_box, node_meta, light, env_meta, tex, tflags,
      en_t, rows, *extra_args, lane_t, seed_t, *st_t)
    flat = lambda x: x.reshape(n_pad)[:n]
    return tuple(flat(x) for x in out)

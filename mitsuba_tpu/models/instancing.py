"""True geometry instancing: per-group BLAS + iterative instance rounds.

TPU-native replacement for the reference's two-level acceleration
(shapegroup.cpp + instance.cpp; Embree builds one sub-scene per
ShapeGroup and instances it in the top-level scene,
scene_embree.inl:113-160).  Until round 3 the loader FLATTENED
instances into geometry copies — memory O(instances x geometry) and an
immediate SMEM-node-budget blowout.  Here each group's object-space
geometry and BLAS are stored ONCE and rays are intersected against the
group in candidate ROUNDS:

1. Every ray slab-tests all instance world bounds (chunked scan — no
   (N, I) materialization) and selects its nearest untested candidate
   whose entry t can still beat the current best hit.
2. Rays are transformed into THEIR candidate's object space with the
   UNNORMALIZED direction d' = M^-1 d, which preserves the world-t
   parametrization, so one batched BLAS query (the existing packet
   kernel on TPU, brute-force otherwise) serves every instance at once
   — the group BLAS is shared, each ray just arrives pre-transformed.
3. A frontier key (entry t, instance id) guarantees strict progress;
   the loop ends when no ray has a candidate left that could improve.

Instances of different groups are handled by a static per-group loop.
Hits carry (prim within group, instance id); the differentiable SI is
rebuilt from the object-space triangle transformed by the instance's
(traced) to_world, so gradients flow to both group vertices and
instance transforms.  Like the reference, emitters inside shapegroups
are not supported (instance.cpp errors on nested emitters).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..core.pytree import pytree, static

INF = jnp.float32(jnp.inf)
CHUNK = 64       # instances per scan chunk in candidate selection


@pytree
class InstancedGroup:
    """One ShapeGroup + its instances (object-space geometry stored
    once; transforms traced so instancing is differentiable)."""

    vertices: jnp.ndarray      # (V, 3) object space
    faces: jnp.ndarray         # (F, 3) int32
    normals: jnp.ndarray       # (V, 3)
    uvs: jnp.ndarray           # (V, 2)
    fshape_g: jnp.ndarray      # (F,) int32 submesh id (bsdf slot offset)
    fsmooth: jnp.ndarray       # (F,) f32 0/1 smooth-shading flag
    to_world: jnp.ndarray      # (I, 4, 4)
    to_object: jnp.ndarray     # (I, 4, 4)
    world_lo: jnp.ndarray      # (I, 3) instance world bounds
    world_hi: jnp.ndarray      # (I, 3)
    accel: object = None       # PacketAccel (BLAS over group faces)
    n_inst: int = static(0)
    n_submeshes: int = static(0)
    bsdf_of_submesh: tuple = static(())
    id: str = static("group")

    @staticmethod
    def create(submeshes, transforms, id="group"):
        """Merge ``submeshes`` (list[Mesh], object space) and attach
        ``transforms`` (list/array of 4x4 to_world); builds the shared
        BLAS at creation time like the reference's per-group Embree
        scene (scene_embree.inl:113)."""
        offs = np.cumsum([0] + [int(m.vertices.shape[0])
                                for m in submeshes])
        v = jnp.concatenate([m.vertices for m in submeshes])
        f = jnp.concatenate([m.faces + offs[i]
                             for i, m in enumerate(submeshes)])
        nrm = jnp.concatenate([
            (m.normals if m.normals is not None
             else jnp.zeros_like(m.vertices))
            for m in submeshes])
        uv = jnp.concatenate([
            (m.uvs if m.uvs is not None
             else jnp.zeros((m.vertices.shape[0], 2)))
            for m in submeshes])
        counts = [int(m.faces.shape[0]) for m in submeshes]
        fshape_g = jnp.asarray(np.repeat(
            np.arange(len(submeshes), dtype=np.int32), counts))
        fsmooth = jnp.asarray(np.repeat(
            np.asarray([m.normals is not None for m in submeshes],
                       np.float32), counts))
        M = jnp.asarray(np.asarray(
            jax.lax.stop_gradient(jnp.stack(
                [jnp.asarray(t, jnp.float32) for t in transforms]))))
        Minv = jnp.linalg.inv(M)
        # object bbox -> 8 corners -> per-instance world bounds
        vn = np.asarray(jax.lax.stop_gradient(v))
        lo, hi = vn.min(0), vn.max(0)
        corners = np.stack(np.meshgrid(*zip(lo, hi),
                                       indexing="ij")).reshape(3, 8).T
        cw = (np.asarray(jax.lax.stop_gradient(M))[:, :3, :3]
              @ corners.T[None]).transpose(0, 2, 1) \
            + np.asarray(jax.lax.stop_gradient(M))[:, None, :3, 3]
        world_lo = jnp.asarray(cw.min(1))
        world_hi = jnp.asarray(cw.max(1))

        accel = None
        if int(f.shape[0]) > 64:
            from ..ops.pallas.traverse import MAX_NODES, build_packet_bvh

            pa = build_packet_bvh(
                np.asarray(jax.lax.stop_gradient(v)),
                np.asarray(jax.lax.stop_gradient(f)), rpl=32, mxu=True)
            if pa.n_nodes <= MAX_NODES:
                accel = pa
        return InstancedGroup(
            vertices=v, faces=f, normals=nrm, uvs=uv,
            fshape_g=fshape_g, fsmooth=fsmooth,
            to_world=M, to_object=Minv,
            world_lo=world_lo, world_hi=world_hi, accel=accel,
            n_inst=int(M.shape[0]), n_submeshes=len(submeshes),
            bsdf_of_submesh=tuple(int(m.bsdf_index) for m in submeshes),
            id=id)


def group_trace_ctx(g: InstancedGroup):
    """Per-trace packed tables for one group (built once per trace like
    Scene.trace_ctx): the (F, 26) SI gather matrix + TPU packet-kernel
    tables when the group has a BLAS."""
    v, f = g.vertices, g.faces
    p = v[f]
    nv = g.normals[f]
    uvv = g.uvs[f]
    F = int(f.shape[0])
    tri_data = jnp.concatenate([
        p.reshape(F, 9), nv.reshape(F, 9), uvv.reshape(F, 6),
        g.fshape_g.astype(jnp.float32)[:, None],
        g.fsmooth[:, None],
    ], axis=-1)
    ctx = {"tri_data": tri_data,
           "verts_detached": jax.lax.stop_gradient(v)}
    if g.accel is not None and jax.default_backend() == "tpu":
        from ..ops.pallas.traverse import (pack_leaf_rows, pack_mxu_rows,
                                           refit_packet_bvh, tri_columns)

        vd = ctx["verts_detached"]
        cols = tri_columns(vd, f)
        ctx["rows"] = pack_leaf_rows(cols, g.accel)
        ctx["mxu_rows"] = pack_mxu_rows(cols, g.accel)
        ctx["node_box"] = refit_packet_bvh(g.accel, vd)
    return ctx


def _transform_rays(Minv_rows, o, d):
    """Apply per-lane 4x4 inverses (N, 4, 4) to points+directions."""
    R = Minv_rows[:, :3, :3]
    t = Minv_rows[:, :3, 3]
    o2 = jnp.einsum("nij,nj->ni", R, o) + t
    d2 = jnp.einsum("nij,nj->ni", R, d)   # unnormalized: keeps world t
    return o2, d2


def _slab_chunk(o, inv_d, lo, hi, maxt):
    """(N, 3) rays vs (C, 3) boxes -> (t_in (N, C), hit (N, C))."""
    t0 = (lo[None] - o[:, None]) * inv_d[:, None]
    t1 = (hi[None] - o[:, None]) * inv_d[:, None]
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tn = jnp.maximum(tn, 0.0)
    hit = (tn <= tf) & (tn < maxt[:, None])
    return tn, hit


def _select_candidate(g, o, inv_d, best_t, f_t, f_i, active):
    """Per-ray nearest untested instance (frontier-ordered): scans the
    instance boxes in CHUNK-sized slabs carrying a running (t, idx)
    minimum — memory O(N x CHUNK), never O(N x I)."""
    I = g.n_inst
    n = o.shape[0]
    tbest = jnp.full((n,), INF)
    ibest = jnp.full((n,), jnp.int32(-1))
    for c0 in range(0, I, CHUNK):
        c1 = min(c0 + CHUNK, I)
        idxs = jnp.arange(c0, c1, dtype=jnp.int32)
        tn, hit = _slab_chunk(o, inv_d, g.world_lo[c0:c1],
                              g.world_hi[c0:c1], best_t)
        # frontier order: strictly after the last processed (t, idx)
        after = (tn > f_t[:, None]) | (
            (tn == f_t[:, None]) & (idxs[None, :] > f_i[:, None]))
        cand = hit & after & active[:, None]
        tm = jnp.where(cand, tn, INF)
        cmin = jnp.min(tm, axis=1)
        im = jnp.where(cand & (tn == cmin[:, None]), idxs[None, :],
                       jnp.int32(2 ** 30))
        imin = jnp.min(im, axis=1)
        closer = cmin < tbest
        tie = (cmin == tbest) & (imin < ibest)
        take = closer | tie
        tbest = jnp.where(take, cmin, tbest)
        ibest = jnp.where(take, imin, ibest)
    chosen = jnp.where(jnp.isfinite(tbest), ibest, -1)
    return chosen, tbest


def _group_query(g, ctx_g, o_obj, d_obj, maxt, act, closest):
    """One batched BLAS query in object space; returns (t, prim) for
    closest or occluded mask for any-hit."""
    n = o_obj.shape[0]
    if "rows" in ctx_g:
        from ..ops.pallas.traverse import (packet_any_hit,
                                           packet_closest_hit)

        acc = g.accel
        if closest:
            return packet_closest_hit(
                ctx_g["node_box"], acc.node_meta, ctx_g["rows"],
                o_obj, d_obj, maxt, act, n_nodes=acc.n_nodes,
                rpl=acc.rpl, batch=acc.batch,
                mxu_rows=ctx_g["mxu_rows"], box16=acc.box16)
        return packet_any_hit(
            ctx_g["node_box"], acc.node_meta, ctx_g["rows"],
            o_obj, d_obj, maxt, act, n_nodes=acc.n_nodes,
            rpl=acc.rpl, batch=acc.batch, mxu_rows=ctx_g["mxu_rows"], box16=acc.box16)
    from ..core.records import Ray
    from ..ops.intersect import intersect_brute

    ray = Ray.make(o_obj, d_obj, maxt=maxt)
    pi = intersect_brute(ctx_g["verts_detached"], g.faces, ray, act)
    if closest:
        return pi.t, pi.prim_index
    return jnp.isfinite(pi.t) & act


def group_closest(g, ctx_g, o, d, best_t, active):
    """Iterative candidate rounds for one group's closest hit.
    Returns (t (N,), prim (N,), inst (N,)) with t = inf on miss."""
    n = o.shape[0]
    eps = jnp.float32(1e-30)
    inv_d = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                            jnp.where(d >= 0, eps, -eps))

    def sel(best_t, f_t, f_i):
        return _select_candidate(g, o, inv_d, best_t, f_t, f_i, active)

    t0 = jnp.where(active, best_t, 0.0)   # inactive: no candidates
    chosen0, tkey0 = sel(t0, jnp.full((n,), -INF),
                         jnp.full((n,), jnp.int32(-1)))

    def cond(c):
        return jnp.any(c[0] >= 0)

    def body(c):
        chosen, tkey, bt, bp, bi = c
        act_r = chosen >= 0
        Minv = g.to_object[jnp.maximum(chosen, 0)]
        o2, d2 = _transform_rays(jax.lax.stop_gradient(Minv), o, d)
        t, prim = _group_query(g, ctx_g, o2, d2, bt, act_r, True)
        closer = jnp.isfinite(t) & (t < bt) & act_r
        bt = jnp.where(closer, t, bt)
        bp = jnp.where(closer, prim, bp)
        bi = jnp.where(closer, chosen, bi)
        chosen, tkey = sel(jnp.where(active, bt, 0.0), tkey, chosen)
        return chosen, tkey, bt, bp, bi

    _, _, bt, bp, bi = jax.lax.while_loop(
        cond, body,
        (chosen0, tkey0, best_t, jnp.zeros((n,), jnp.int32),
         jnp.full((n,), jnp.int32(-1))))
    hit = bi >= 0
    return jnp.where(hit, bt, INF), bp, bi


def group_any(g, ctx_g, o, d, maxt, active):
    """Iterative candidate rounds for one group's any-hit; returns the
    occluded mask."""
    n = o.shape[0]
    eps = jnp.float32(1e-30)
    inv_d = 1.0 / jnp.where(jnp.abs(d) > eps, d,
                            jnp.where(d >= 0, eps, -eps))

    def sel(live, f_t, f_i):
        return _select_candidate(g, o, inv_d,
                                 jnp.where(live, maxt, 0.0), f_t, f_i,
                                 live)

    occ0 = jnp.zeros((n,), bool)
    chosen0, tkey0 = sel(active, jnp.full((n,), -INF),
                         jnp.full((n,), jnp.int32(-1)))

    def cond(c):
        return jnp.any(c[0] >= 0)

    def body(c):
        chosen, tkey, occ = c
        act_r = chosen >= 0
        Minv = g.to_object[jnp.maximum(chosen, 0)]
        o2, d2 = _transform_rays(jax.lax.stop_gradient(Minv), o, d)
        hit = _group_query(g, ctx_g, o2, d2, maxt, act_r, False)
        occ = occ | (hit & act_r)
        live = active & ~occ
        chosen, tkey = sel(live, tkey, chosen)
        return chosen, tkey, occ

    return jax.lax.while_loop(cond, body, (chosen0, tkey0, occ0))[2]


def instanced_si(scene, pi, ray, ctx, mode, si_base):
    """Differentiable SI for instanced lanes, merged over si_base: the
    object-space winner triangle transformed by the (traced) instance
    to_world — gradients flow to group vertices AND transforms
    (instance.cpp compute_surface_interaction's to_world chain)."""
    from ..core.math import Frame, cross, normalize
    from ..ops.intersect import ray_triangle

    inst = pi.inst_index
    base = scene._instance_base()
    n = ray.o.shape[0]
    si = si_base
    slot0 = base
    for g, ctx_g in zip(scene.instances, ctx["inst"]):
        on_g = (pi.inst_index >= 0) & (pi.shape_index >= slot0) \
            & (pi.shape_index < slot0 + g.n_submeshes)
        prim = jnp.where(on_g, pi.prim_index, 0)
        td = ctx_g["tri_data"][prim]
        if mode == "detach_shape":
            td = jax.lax.stop_gradient(td)
        M = g.to_world[jnp.maximum(jnp.where(on_g, inst, 0), 0)]
        Minv = g.to_object[jnp.maximum(jnp.where(on_g, inst, 0), 0)]
        if mode == "detach_shape":
            M = jax.lax.stop_gradient(M)
            Minv = jax.lax.stop_gradient(Minv)
        R = M[:, :3, :3]
        tr = M[:, :3, 3]

        def xf(p):
            return jnp.einsum("nij,nj->ni", R, p) + tr

        p0, p1, p2 = xf(td[:, 0:3]), xf(td[:, 3:6]), xf(td[:, 6:9])
        # normals via inverse transpose (correct under non-uniform
        # scale): n_w = R_inv^T n_o
        Rit = jnp.swapaxes(Minv[:, :3, :3], 1, 2)

        def xfn(v):
            return jnp.einsum("nij,nj->ni", Rit, v)

        n0 = xfn(td[:, 9:12])
        n1 = xfn(td[:, 12:15])
        n2 = xfn(td[:, 15:18])
        uv0, uv1, uv2 = td[:, 18:20], td[:, 20:22], td[:, 22:24]
        smooth = td[:, 25] > 0.5

        t, u, v_, _hit = ray_triangle(ray.o, ray.d, p0, p1, p2)
        ok = jnp.isfinite(t)
        t = jnp.where(ok, t, pi.t)
        u = jnp.clip(jnp.where(ok, u, 0.0), 0.0, 1.0)
        v_ = jnp.clip(jnp.where(ok, v_, 0.0), 0.0, 1.0)
        if mode == "follow_shape":
            u = jax.lax.stop_gradient(u)
            v_ = jax.lax.stop_gradient(v_)
        b0 = 1.0 - u - v_
        p = p0 * b0[:, None] + p1 * u[:, None] + p2 * v_[:, None]
        if mode == "follow_shape":
            from ..core.math import dot as _dot

            t = jnp.sqrt(
                jnp.maximum(_dot(p - ray.o, p - ray.o), 1e-30)
                / jnp.maximum(_dot(ray.d, ray.d), 1e-30))
        ng = normalize(cross(p1 - p0, p2 - p0))
        ns = normalize(n0 * b0[:, None] + n1 * u[:, None]
                       + n2 * v_[:, None])
        sh_n = jnp.where(smooth[:, None], ns, ng)
        uv = uv0 * b0[:, None] + uv1 * u[:, None] + uv2 * v_[:, None]
        s, tt, _ = Frame.from_normal(sh_n)
        wi = Frame.to_local((s, tt, sh_n), -ray.d)

        m1 = on_g
        m3 = on_g[:, None]
        si = si.replace(
            t=jnp.where(m1, t, si.t),
            p=jnp.where(m3, p, si.p),
            n=jnp.where(m3, ng, si.n),
            sh_n=jnp.where(m3, sh_n, si.sh_n),
            sh_s=jnp.where(m3, s, si.sh_s),
            sh_t=jnp.where(m3, tt, si.sh_t),
            uv=jnp.where(m3, uv, si.uv),
            wi=jnp.where(m3, wi, si.wi),
            shape_index=jnp.where(m1, pi.shape_index, si.shape_index),
            prim_index=jnp.where(m1, prim, si.prim_index),
        )
        slot0 += g.n_submeshes
    return si

"""Silhouette projection operations: walk / jump / hybrid.

Reference parity: ``ProjectOperation`` (projective.py:586-830) and
``Mesh::primitive_silhouette_projection`` (mesh.cpp:1036-1177).  Given a
"seed" surface point (an ordinary path vertex) and a viewpoint (the
previous path vertex), these ops move the point onto a nearby mesh
*silhouette edge as seen from the viewpoint* — the set of edges where a
front-facing and a back-facing triangle meet (or an open-boundary
edge).  Projected points seed the guiding distributions for indirect
(shadow) boundary sampling: instead of warming the octree with uniform
edge samples, warm it exactly where real transport paths graze
geometry (ProjectiveDetail's ``projxpath_*`` init modes,
projective.py:228-373).

TPU formulation: the reference walks the mesh one triangle at a time
inside a Dr.Jit recorded loop with per-lane divergence.  Here the walk
is a fixed-trip-count ``lax.fori_loop`` over SoA lanes: each step does
three neighbor-face gathers + the angular heuristic on the VPU; dead
lanes (already on a silhouette) carry their result through.  Topology
(the directed-edge -> opposite-face table, the reference's ``m_E2E``)
is static per scene and built host-side in numpy.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ...core import rng
from ...core.pytree import pytree
from ...core.records import Ray

# RNG dimension block (disjoint from path dims and boundary dims)
DIM_PROJ = 8300


@pytree
class FaceAdjacency:
    """Per-face directed-edge topology (mesh.h m_E2E parity).

    Slot k of face f is the edge (v_k, v_{k+1 mod 3}); ``neighbors`` is
    the face on its other side (-1 = open boundary) and ``edge_id`` the
    row of that edge in the scene's EdgeTable (projective.EdgeTable).
    """

    neighbors: jnp.ndarray   # (F, 3) int32
    edge_id: jnp.ndarray     # (F, 3) int32


def build_face_adjacency(scene, edges) -> FaceAdjacency:
    """Host-side: match each directed face edge against the unique edge
    table (same sorted-key construction as build_silhouette_edges)."""
    _, f, *_ = scene.geometry()
    f = np.asarray(jax.lax.stop_gradient(f))
    F = f.shape[0]
    # directed edges in slot order (v0,v1),(v1,v2),(v2,v0)
    de = np.stack([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=1)
    key = np.sort(de.reshape(-1, 2), axis=1)
    ev0 = np.asarray(edges.v0)
    ev1 = np.asarray(edges.v1)
    # lookup: edge table rows are unique sorted pairs
    table_key = ev0.astype(np.int64) * (2 ** 31) + ev1.astype(np.int64)
    probe = key[:, 0].astype(np.int64) * (2 ** 31) + key[:, 1].astype(
        np.int64)
    order = np.argsort(table_key)
    pos = np.searchsorted(table_key[order], probe)
    eid = order[np.clip(pos, 0, len(order) - 1)].astype(np.int32)
    assert (table_key[eid] == probe).all(), "edge table mismatch"
    f0 = np.asarray(edges.f0)[eid]
    f1 = np.asarray(edges.f1)[eid]
    me = np.repeat(np.arange(F, dtype=np.int32), 3)
    nb = np.where(f0 == me, f1, f0).astype(np.int32)
    return FaceAdjacency(
        neighbors=jnp.asarray(nb.reshape(F, 3)),
        edge_id=jnp.asarray(eid.reshape(F, 3)),
    )


@pytree
class SilhouetteSample:
    """Projection result (SilhouetteSample3f parity, records.h)."""

    p: jnp.ndarray        # (N, 3) point on the silhouette edge
    d: jnp.ndarray        # (N, 3) direction viewpoint -> p
    edge: jnp.ndarray     # (N,) EdgeTable row, -1 invalid
    t: jnp.ndarray        # (N,) position along the EdgeTable's v0->v1
    prim: jnp.ndarray     # (N,) face the sample lies on
    valid: jnp.ndarray    # (N,) bool


def _edge_endpoints(verts, faces, prim, k):
    """Endpoints of directed edge slot ``k`` (lane-varying) of ``prim``."""
    fi = faces[prim]                                    # (N, 3)
    ia = jnp.take_along_axis(fi, k[:, None], axis=1)[:, 0]
    ib = jnp.take_along_axis(fi, ((k + 1) % 3)[:, None], axis=1)[:, 0]
    return verts[ia], verts[ib], ia, ib


def silhouette_projection(verts, faces, fn, adj: FaceAdjacency,
                          viewpoint, prim, u, active,
                          heuristic: bool):
    """One projection step (mesh.cpp:1036).  Returns
    ``(ss, next_prim)``: with ``heuristic`` the step also *moves* —
    ``next_prim`` is the neighbor across the chosen edge (the walk
    step); without it, only actual silhouette edges produce a valid
    sample and ``next_prim == prim``.
    """
    n = prim.shape[0]
    fi = faces[prim]                                    # (N, 3)
    p = verts[fi]                                       # (N, 3, 3)
    nb = adj.neighbors[prim]                            # (N, 3)
    boundary = nb < 0
    n_self = fn[prim]                                   # (N, 3)
    n_oppo = fn[jnp.maximum(nb, 0)]                     # (N, 3, 3)

    # viewing ray to one vertex of each edge (edge k uses vertex k+1,
    # mesh.cpp:1073-1081)
    vp = viewpoint
    ray_d = p - vp[:, None, :]
    ray_d = ray_d / jnp.sqrt(jnp.maximum(
        jnp.sum(ray_d ** 2, -1, keepdims=True), 1e-20))
    rd_next = jnp.stack([ray_d[:, 1], ray_d[:, 2], ray_d[:, 0]], axis=1)
    sgn_self = jnp.sign(jnp.sum(rd_next * n_self[:, None, :], -1))
    cos_oppo = jnp.sum(rd_next * n_oppo, -1) * sgn_self   # (N, 3)
    cos_oppo = jnp.where(boundary, -1.0, cos_oppo)

    if heuristic:
        # acos weight, silhouette edges flat at pi/2, floor 1 degree
        w = jnp.arccos(jnp.clip(cos_oppo, -1.0, 1.0))
        w = jnp.where(cos_oppo <= 0.0, jnp.pi / 2.0, w)
        w = jnp.maximum(w, jnp.deg2rad(1.0))
    else:
        w = (cos_oppo < 0.0).astype(jnp.float32)
        none_sil = jnp.sum(w, -1) == 0.0
        w = jnp.where(none_sil[:, None], jnp.ones_like(w), w)
    w = w / jnp.sum(w, -1, keepdims=True)

    c0 = w[:, 0]
    c01 = w[:, 0] + w[:, 1]
    k = jnp.where(u >= c0, 1, 0)
    k = jnp.where(u >= c01, 2, k).astype(jnp.int32)
    cos_k = jnp.take_along_axis(cos_oppo, k[:, None], axis=1)[:, 0]
    failed = cos_k > 0.0

    # sample reuse inside the chosen bin (mesh.cpp:1143-1156)
    t_dir = jnp.where(
        k == 0, u / jnp.maximum(c0, 1e-12),
        jnp.where(k == 1, (u - c0) / jnp.maximum(w[:, 1], 1e-12),
                  (u - c01) / jnp.maximum(w[:, 2], 1e-12)))
    t_dir = jnp.clip(t_dir, 0.0, 1.0 - 1e-6)

    pa, pb, ia, ib = _edge_endpoints(verts, faces, prim, k)
    ss_p = pa * (1.0 - t_dir[:, None]) + pb * t_dir[:, None]
    ss_d = ss_p - vp
    ss_d = ss_d / jnp.sqrt(jnp.maximum(
        jnp.sum(ss_d ** 2, -1, keepdims=True), 1e-20))
    eid = jnp.take_along_axis(adj.edge_id[prim], k[:, None], axis=1)[:, 0]
    # EdgeTable stores sorted (v0 < v1); flip t when the directed edge
    # runs the other way so t is in table orientation
    t_tab = jnp.where(ia < ib, t_dir, 1.0 - t_dir)

    valid = active & ~failed
    ss = SilhouetteSample(
        p=ss_p, d=ss_d,
        edge=jnp.where(valid, eid, -1),
        t=t_tab,
        prim=prim,
        valid=valid,
    )
    if heuristic:
        nb_k = jnp.take_along_axis(nb, k[:, None], axis=1)[:, 0]
        next_prim = jnp.where(nb_k >= 0, nb_k, prim)
    else:
        next_prim = prim
    return ss, next_prim


def mesh_walk(verts, faces, fn, adj: FaceAdjacency, viewpoint, prim,
              seed, lane, active, max_walk: int = 16):
    """Heuristic mesh walk (projective.py:600-634 mesh_walk): repeatedly
    step to the neighbor whose shared edge looks most silhouette-like
    until an actual silhouette edge is crossed; the LAST successful
    sample wins (deeper walks refine earlier hits)."""
    n = prim.shape[0]
    zero3 = jnp.zeros((n, 3))
    best = SilhouetteSample(
        p=zero3, d=zero3,
        edge=jnp.full((n,), -1, jnp.int32),
        t=jnp.zeros((n,)),
        prim=prim, valid=jnp.zeros((n,), bool))

    def body(i, carry):
        cur, best = carry
        u = rng.sample_1d(seed, lane, jnp.int32(DIM_PROJ) + i)
        ss, nxt = silhouette_projection(
            verts, faces, fn, adj, viewpoint, cur, u, active,
            heuristic=True)
        hit = ss.valid
        best = SilhouetteSample(
            p=jnp.where(hit[:, None], ss.p, best.p),
            d=jnp.where(hit[:, None], ss.d, best.d),
            edge=jnp.where(hit, ss.edge, best.edge),
            t=jnp.where(hit, ss.t, best.t),
            prim=jnp.where(hit, ss.prim, best.prim),
            valid=best.valid | hit,
        )
        return nxt, best

    _, best = jax.lax.fori_loop(0, max_walk, body, (prim, best))
    return best


def mesh_jump(scene, ctx, viewpoint, si, active, max_jump: int = 2):
    """Newton jump toward the smooth-silhouette set dot(H, n_s(p)) = 0
    of a shading-normal field (projective.py:637-693 mesh_jump): solve
    the first-order normal model for the in-plane offset, re-intersect,
    and test the landing face for a silhouette edge.  Requires vertex
    normals (faceted meshes have dn == 0 -> jump gives up, matching the
    reference where dn_du == 0 makes rcp(a^2+b^2) blow up).
    """
    verts, faces, norms, *_ = scene.geometry()
    verts = jax.lax.stop_gradient(verts)
    norms = jax.lax.stop_gradient(norms)

    prim = si.prim_index
    p = jax.lax.stop_gradient(si.p)
    shape0 = si.shape_index

    def one_jump(carry):
        prim, p, act = carry
        fi = faces[prim]
        pv = verts[fi]                      # (N,3,3)
        nv = norms[fi]                      # (N,3,3)
        # barycentric parameterization: dp/du = p1-p0, dp/dv = p2-p0
        dp_du = pv[:, 1] - pv[:, 0]
        dp_dv = pv[:, 2] - pv[:, 0]
        # unnormalized shading normal field is linear in barycentrics
        dn_du = nv[:, 1] - nv[:, 0]
        dn_dv = nv[:, 2] - nv[:, 0]
        # normal at the current point: project p to barycentrics
        d0 = p - pv[:, 0]
        # solve [dp_du dp_dv] b = d0 in the triangle plane
        e11 = jnp.sum(dp_du * dp_du, -1)
        e12 = jnp.sum(dp_du * dp_dv, -1)
        e22 = jnp.sum(dp_dv * dp_dv, -1)
        q1 = jnp.sum(d0 * dp_du, -1)
        q2 = jnp.sum(d0 * dp_dv, -1)
        det = jnp.maximum(e11 * e22 - e12 * e12, 1e-20)
        b1 = (e22 * q1 - e12 * q2) / det
        b2 = (e11 * q2 - e12 * q1) / det
        n_tilde = (nv[:, 0] * (1.0 - b1 - b2)[:, None]
                   + nv[:, 1] * b1[:, None] + nv[:, 2] * b2[:, None])
        inv_len = 1.0 / jnp.sqrt(jnp.maximum(
            jnp.sum(n_tilde ** 2, -1, keepdims=True), 1e-20))
        n_hat = n_tilde * inv_len
        # normalized-normal derivatives: (I - n n^T) dn~ / |n~|
        def dnorm(dn):
            return (dn - n_hat * jnp.sum(n_hat * dn, -1, keepdims=True)
                    ) * inv_len
        dn_du_n = dnorm(dn_du)
        dn_dv_n = dnorm(dn_dv)

        H = viewpoint - p
        H = H / jnp.sqrt(jnp.maximum(
            jnp.sum(H ** 2, -1, keepdims=True), 1e-20))
        a = jnp.sum(H * dn_du_n, -1)
        b = jnp.sum(H * dn_dv_n, -1)
        c = jnp.sum(H * n_hat, -1)
        ab2 = a * a + b * b
        ok = act & (ab2 > 1e-12)
        rcp = 1.0 / jnp.maximum(ab2, 1e-12)
        Q1 = -a * c * rcp
        Q2 = -b * c * rcp
        p_proj = p + Q1[:, None] * dp_du + Q2[:, None] * dp_dv
        n_proj = n_hat + Q1[:, None] * dn_du_n + Q2[:, None] * dn_dv_n
        n_proj = n_proj / jnp.sqrt(jnp.maximum(
            jnp.sum(n_proj ** 2, -1, keepdims=True), 1e-20))
        eps = 1e-4 * jnp.maximum(1.0, jnp.max(jnp.abs(p_proj), -1,
                                              keepdims=True))
        ray = Ray.make(p_proj + n_proj * eps, -n_proj)
        si2 = scene.ray_intersect(ray, ok, ctx)
        landed = ok & si2.is_valid() & (si2.shape_index == shape0)
        return (jnp.where(landed, si2.prim_index, prim),
                jnp.where(landed[:, None], jax.lax.stop_gradient(si2.p),
                          p),
                landed)

    act = active
    for _ in range(max_jump):
        prim, p, act = one_jump((prim, p, act))
    return prim, p, act


def hybrid_projection(scene, ctx, edges, adj: FaceAdjacency, viewpoint,
                      si, seed, lane, active, max_walk: int = 30):
    """Walk, then ONE jump for lanes the walk left stranded
    (projective.py:695-729 hybrid_mesh_projection): the heuristic walk
    drifts only weakly on smooth meshes (adjacent-face weights are
    nearly equal), so the reference rescues failed walks with a Newton
    jump from a random point on the walk's final face, followed by a
    non-heuristic silhouette pick on the landing face."""
    verts, faces, norms, *_ = scene.geometry()
    verts = jax.lax.stop_gradient(verts)
    fn = _proj_face_normals(verts, faces)

    prim0 = si.prim_index
    ss = mesh_walk(verts, faces, fn, adj, viewpoint, prim0, seed, lane,
                   active, max_walk=max_walk)
    need_jump = active & ~ss.valid

    # jump seed: uniform point on the walk's final face (the reference
    # re-samples prim_uv; ss.prim is the last face the walk visited)
    u2 = rng.sample_2d(seed, lane, jnp.int32(DIM_PROJ + 128))
    st = jnp.sqrt(jnp.maximum(u2[:, 0], 0.0))
    b1 = 1.0 - st
    b2 = st * u2[:, 1]
    fi = faces[ss.prim]
    pv = verts[fi]
    p_seed = (pv[:, 0] * (1.0 - b1 - b2)[:, None]
              + pv[:, 1] * b1[:, None] + pv[:, 2] * b2[:, None])

    @pytree
    class _SI:
        prim_index: jnp.ndarray
        p: jnp.ndarray
        shape_index: jnp.ndarray

    sij = _SI(prim_index=ss.prim, p=p_seed, shape_index=si.shape_index)
    # two Newton iterations: one step from a face centroid still lands
    # a couple of faces from the contour (measured med |p.V-1| 0.18 on
    # the subdiv-3 sphere); the second converges it (0.007) so the
    # strict silhouette pick on the landing face succeeds ~95%
    prim_j, p_j, landed = mesh_jump(scene, ctx, viewpoint, sij, need_jump,
                                    max_jump=2)
    # non-heuristic silhouette pick on the landing face
    u = rng.sample_1d(seed, lane, jnp.int32(DIM_PROJ + 129))
    ss_j, _ = silhouette_projection(verts, faces, fn, adj, viewpoint,
                                    prim_j, u, landed, heuristic=False)
    ok_j = need_jump & ss_j.valid
    return SilhouetteSample(
        p=jnp.where(ok_j[:, None], ss_j.p, ss.p),
        d=jnp.where(ok_j[:, None], ss_j.d, ss.d),
        edge=jnp.where(ok_j, ss_j.edge, ss.edge),
        t=jnp.where(ok_j, ss_j.t, ss.t),
        prim=jnp.where(ok_j, ss_j.prim, ss.prim),
        valid=ss.valid | ok_j,
    )


def _proj_face_normals(verts, faces):
    from .projective import _face_normals

    return _face_normals(verts, faces)


def project_seed_points(scene, edges, adj: FaceAdjacency, seed,
                        n_seeds: int, max_walk: int = 16):
    """Light-side projection seeding for the shadow-boundary octree
    (ProjectiveDetail.init_indirect_silhouette projection modes,
    projective.py:228-373): sample a light point y, shoot a cosine ray
    into the scene, and WALK the hit triangle onto a silhouette edge as
    seen from y.  Returns (u_edge, t, u_light) cube points + validity —
    exactly the cube `_indirect_pass` samples, so the points can seed
    OcSpaceDistr directly.
    """
    from .guiding import UniformDistr
    from .projective import DIM_B_SUB, _face_normals

    scene_det = jax.lax.stop_gradient(scene)
    ctx = scene_det.trace_ctx()
    verts, faces, *_ = scene_det.geometry()
    fn = _face_normals(verts, faces)

    light_shape = scene_det.emitter_shape[0]
    counts = [int(m.faces.shape[0]) for m in scene_det.meshes]
    fshape_np = np.repeat(np.arange(len(counts), dtype=np.int32), counts)
    lfaces = np.nonzero(fshape_np == light_shape)[0]
    lf = faces[jnp.asarray(lfaces)]
    lv0, lv1, lv2 = verts[lf[:, 0]], verts[lf[:, 1]], verts[lf[:, 2]]
    lareas = 0.5 * jnp.sqrt(jnp.maximum(jnp.sum(
        jnp.cross(lv1 - lv0, lv2 - lv0) ** 2, -1), 1e-30))
    ldistr = UniformDistr.create(lareas)

    p0_all = verts[edges.v0]
    p1_all = verts[edges.v1]
    lengths = jnp.sqrt(jnp.maximum(
        jnp.sum((p1_all - p0_all) ** 2, -1), 1e-20))
    edistr = UniformDistr.create(lengths)

    lane = jnp.arange(n_seeds, dtype=jnp.int32)
    seed_p = jnp.uint32(seed) ^ jnp.uint32(0x9E37B9)

    # light point y (same warp as _indirect_pass)
    u_lf = rng.sample_1d(seed_p, lane, jnp.int32(DIM_B_SUB))
    u_ly = rng.sample_2d(seed_p, lane, jnp.int32(DIM_B_SUB + 1))
    lidx, _ = ldistr.sample(u_lf)
    st = jnp.sqrt(jnp.maximum(1.0 - u_ly[:, 0], 0.0))
    b0 = 1.0 - st
    b1 = st * u_ly[:, 1]
    y = (lv0[lidx] * (1.0 - b0 - b1)[:, None] + lv1[lidx] * b0[:, None]
         + lv2[lidx] * b1[:, None])
    n_y = jnp.cross(lv1[lidx] - lv0[lidx], lv2[lidx] - lv0[lidx])
    n_y = n_y / jnp.sqrt(jnp.maximum(
        jnp.sum(n_y ** 2, -1, keepdims=True), 1e-20))

    # cosine-weighted direction about n_y
    from ...core.math import Frame
    from ...core.warp import square_to_cosine_hemisphere

    u_d = rng.sample_2d(seed_p, lane, jnp.int32(DIM_PROJ + 64))
    d_local = square_to_cosine_hemisphere(u_d)
    fr = Frame.from_normal(n_y)
    d = Frame.to_world(fr, d_local)

    act0 = jnp.ones((n_seeds,), bool)
    ray = Ray.make(y + d * 1e-4, d)
    si = scene_det.ray_intersect(ray, act0, ctx)
    hit = si.is_valid() & (si.shape_index != light_shape) & \
        (si.prim_index < faces.shape[0])

    si_c = si.replace(prim_index=jnp.clip(si.prim_index, 0,
                                          faces.shape[0] - 1))
    ss = hybrid_projection(scene_det, ctx, edges, adj, y, si_c,
                           seed_p, lane, hit, max_walk=max_walk)
    valid = hit & ss.valid

    # edge id + t -> u_edge via the length-weighted CDF (inverse of
    # UniformDistr.sample: u = cdf[e-1] + frac * pmf_normalized[e])
    cdf = edistr.distr.cdf
    pmf_n = edistr.distr.pmf / jnp.maximum(edistr.distr.total, 1e-20)
    e = jnp.maximum(ss.edge, 0)
    lo = jnp.where(e > 0, cdf[jnp.maximum(e - 1, 0)], 0.0)
    u_frac = rng.sample_1d(seed_p, lane, jnp.int32(DIM_PROJ + 65))
    u_edge = jnp.clip(lo + u_frac * pmf_n[e], 0.0, 1.0 - 1e-7)

    pts = jnp.stack([u_edge, ss.t, u_lf], axis=-1)
    return pts, valid

"""Pallas packet BVH traversal — accelerated ray queries for large scenes.

TPU-native replacement for the reference's accelerated traversal backends
(Embree scene_embree.inl:113-160, native kd-tree kdtree.h:371,1827,
OptiX scene_optix.inl:65): the round-1 megakernel tested every triangle
from an SMEM table, capping scenes at 1024 faces; this module removes the
cap with a two-level scheme shaped around the TPU memory system:

- **Host build** (numpy + the native C++ SAH builder, native/bvh_builder
  .cpp) with a large leaf size ("cluster", default 40 triangles).  Nodes
  are flattened in DFS order with threaded miss links, so traversal needs
  no stack — just a scalar cursor.
- **Node table in SMEM**: bbox + meta as scalars.  A ray *packet* — one
  (8, 128) vreg tile, 1024 rays — walks the tree with a single scalar
  cursor; each node visit is one full-width VPU slab test and a scalar
  any-lane reduction.  512 KB of SMEM fits ~15k nodes (~300k triangles
  at the default cluster size).
- **Leaf triangles in HBM**, packed 5-per-row into (rows, 128) f32 so DMA
  slices stay lane-aligned.  When the packet enters a leaf its block is
  DMA'd into a 2-slot SMEM queue; node traversal continues while the copy
  is in flight (double buffering), then the leaf is intersected with the
  same scalar-splat Moller-Trumbore loop the megakernel uses (PERF.md:
  scalar->vector splats are the cheap path for loop constants).
- Shading attributes of the winning triangle are resolved with a masked
  select loop over the winning leaf only — O(cluster), not O(F).

Divergence note: a packet shares one traversal, so efficiency depends on
ray coherence.  Lanes are pixel-major (integrators/common.py), which
keeps primary + shadow packets tight; bounce packets pay more node
visits but remain O(visited clusters), never O(F).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.pytree import pytree, static

import os as _os

# sublanes per ray packet for the BVH family: 16 shares ONE walk
# across 2048 rays (round-5 hardware A/B on the 82k-tri interior:
# closest sorted bounce 100.4 ms vs 101.9 at 8, shadow any-hit 55.6 vs
# 59.4, full path +2.2%, bit-identical image mean) and is the default;
# A/B via MITSUBA_TPU_SUB_BVH (legacy MITSUBA_TPU_SUB honored as a
# fallback).  The BRUTE Cornell megakernel keeps its own independent
# megakernel.SUB = 8 — the two kernel families no longer share the
# constant (round-5: sharing it was the only reason 16 stayed opt-in).
SUB = int(_os.environ.get("MITSUBA_TPU_SUB_BVH",
                          _os.environ.get("MITSUBA_TPU_SUB", "16")))
LANES = 128
R_TILE = SUB * LANES
DET_EPS = 1e-9            # matches megakernel._tri_test

PACK = 4          # triangles per 128-float row (stride 32, exact fit)
STRIDE = 32
RPL = 8           # default rows per leaf block (8-row aligned DMA slices)
TB = PACK * RPL   # default triangles per leaf/cluster (32)
BATCH = 4         # speculative nodes tested per traversal iteration

# MXU leaf-stage arithmetic: a single bf16 pass (~8 mantissa bits)
# visibly punches holes at triangle edges (round-3 hardware A/B: image
# mean 8.09 vs 8.89 on the 82k-tri interior), and Precision.HIGHEST's
# 6-pass f32 emulation erases the MXU win.  The kernels therefore use a
# manual bf16x3 split product (mm3: hi*hi + hi*lo + lo*hi, f32
# accumulation) — ~2^-16 relative error, 3 single-pass matmul calls.

# triangle row columns (within a 32-float slot); the geometric normal
# is recomputed in-kernel from e1 x e2 so the slot can carry per-vertex
# shading normals instead:
#   0:3 p0 | 3:6 e1 | 6:9 e2 | 9:12 refl | 12 is_light
#   13 pdf_area (or GGX alpha on rough faces) | 14 btype
#   15:21 bparams | 21 face_id | 22:31 n0 n1 n2 | 31 pad
COL_FACE_ID = 21
N_COLS = 32

# MXU one-hot resolve table (round 4): per leaf a TRANSPOSED attr block
# (RES_COLS attr rows x triangle-slot columns) so the deferred winner
# resolve is ONE one-hot matmul per (distinct winning leaf, active
# sublane group) instead of a tb-iteration scalar-select loop.  Rows
# 0:32 mirror the 32 leaf-row columns above; rows 32:38 carry
# uv0|uv1|uv2 (texture support in the BVH megakernel); 38:48 pad (48 =
# bf16-tile sublane multiple).  f32 attrs are split EXACTLY into three
# bf16 terms by mantissa truncation (top 8 / next 8 / last 8 significant
# bits), and the one-hot operand is exactly representable, so the
# matmul reconstruction is bit-exact for normal f32 values.
RES_COLS = 48
COL_UV = 32        # uv0.x at row 32 ... uv2.y at row 37


# ----------------------------------------------------------------- build

# traversal nodes are SMEM-resident scalars; cap the node table at a safe
# fraction of the ~512 KB SMEM budget (verified on v5e): 14336 nodes =
# 448 KB, ~280k triangles at the default cluster size
MAX_NODES = 14336
# bf16 box mode (round 5): boxes quantized CONSERVATIVELY (lo rounded
# down, hi up) to bf16 pairs packed two-per-i32 — 16 B/node instead of
# 32, doubling the node capacity so million-triangle scenes keep small
# leaves instead of climbing the leaf-size ladder (round-4 verdict
# weak #10).  Quantization only loosens boxes (~0.4% relative), so
# traversal results are exact; a few extra leaf visits are the price.
MAX_NODES_B16 = 28672


def _bf16_conservative_np(lo, hi):
    """Round lo toward -inf and hi toward +inf onto the bf16 grid
    (numpy, uint16 bit patterns)."""
    def enc(x, up):
        x = np.asarray(x, np.float32)
        b = x.view(np.uint32)
        r = (b >> 16).astype(np.uint32)          # truncate mantissa
        back = (r << 16).view(np.float32)
        # truncation moves toward zero; step one bf16 ulp outward when
        # that was the wrong direction for this bound
        need = (back > x) if not up else (back < x)
        pos = x >= 0.0
        step = np.where(pos == (not up), r - 1, r + 1)
        # crossing zero (r==0): the ulp step flips sign bit instead
        step = np.where((r == 0x0000) & need & (not up),
                        np.uint32(0x8001), step)
        step = np.where((r == 0x8000) & need & up,
                        np.uint32(0x0001), step)
        out = np.where(need, step, r).astype(np.uint32)
        return out & 0xFFFF

    return enc(lo, up=False), enc(hi, up=True)


class _StaticPerm:
    """Identity-hashed wrapper so a large numpy permutation can sit in a
    pytree's static treedef without array-equality headaches."""

    __slots__ = ("a",)

    def __init__(self, a):
        self.a = np.asarray(a, np.int32)

    def __eq__(self, other):
        return self is other or (isinstance(other, _StaticPerm)
                                 and self.a is other.a)

    def __hash__(self):
        return id(self.a)


class _StaticObj:
    """Identity-hashed holder for arbitrary static build metadata."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __eq__(self, other):
        return self is other or (isinstance(other, _StaticObj)
                                 and self.v is other.v)

    def __hash__(self):
        return id(self.v)


def _refit_levels(count, miss):
    """Host-side refit metadata from a DFS-ordered miss-link tree:
    (leaf_node_ids, levels) where levels is deepest-first
    [(nodes, lefts, rights), ...] for the bottom-up box sweep.

    Fully vectorized (round 5): the old per-node Python loop cost ~40 s
    at 1.31M triangles / 630k nodes (the bulk of the misattributed
    "51 s SAH build" in PERF.md round 4).  In DFS order node i's
    subtree occupies [i, end(i)) with end(i) = miss[i] (or M at the
    rightmost spine), so depth[j] = #open intervals covering j minus
    one = j - #{ends <= j} — one bincount + cumsum."""
    count = np.asarray(count)
    miss = np.asarray(miss)
    M = len(count)
    idx = np.arange(M, dtype=np.int64)
    end = np.where(miss >= 0, miss, M).astype(np.int64)
    closes = np.bincount(np.minimum(end, M), minlength=M + 1)
    depth = (idx - np.cumsum(closes)[:M]).astype(np.int32)

    inner = np.nonzero(count == 0)[0].astype(np.int32)
    lefts = np.minimum(inner + 1, M - 1)
    rights = np.where(inner + 1 < M, miss[np.minimum(inner + 1, M - 1)],
                      inner).astype(np.int32)
    order = np.argsort(-depth[inner], kind="stable")
    inner, lefts, rights = inner[order], lefts[order], rights[order]
    ds = depth[inner] if len(inner) else np.zeros(0, np.int32)
    cuts = np.nonzero(np.diff(ds))[0] + 1 if len(ds) else []
    levels = [
        (inner[a:b], lefts[a:b], rights[a:b])
        for a, b in zip(np.concatenate([[0], cuts]).astype(np.int64),
                        np.concatenate([cuts, [len(ds)]]).astype(
                            np.int64))
    ] if len(ds) else []
    leaf_nodes = np.nonzero(count > 0)[0].astype(np.int32)
    return leaf_nodes, levels


@pytree
class PacketAccel:
    """Packet-traversal acceleration structure (detached; the traced leaf
    TABLE content is packed separately per trace via pack_leaf_rows).

    SMEM rows are 512-byte granular, so nodes are packed along lanes:
    node_box (ceil(M/16), 128) f32 — node j at cols (j%16)*8:
    [lox loy loz hix hiy hiz _ _]; node_meta (ceil(M/32), 128) i32 —
    node j at cols (j%32)*4: [row_start | -1, count, miss_link, _].
    perm: per-slot face id (-1 pad).
    """
    node_box: jnp.ndarray
    node_meta: jnp.ndarray
    perm: object = static(None)
    n_nodes: int = static(0)
    n_leaves: int = static(0)
    rpl: int = static(RPL)
    batch: int = static(BATCH)
    # bf16 conservative box mode: node_box is (ceil(M/32), 128) i32,
    # node j at cols (j%32)*4 = [lox|loy, loz|hix, hiy|hiz, pad]
    # (high half first); doubles node capacity (MAX_NODES_B16)
    box16: bool = static(False)
    # MXU leaf stage (round 3): leaf triangles are additionally packed as
    # Baldwin-Weber plane coefficients so one dot_general tests a whole
    # leaf against a 128-ray sublane group (see pack_mxu_rows)
    mxu: bool = static(False)
    # static refit metadata (leaf slot vertex ids + bottom-up levels)
    # for refit_packet_bvh — the jit-compatible analogue of the
    # reference's parameters_changed accel rebuild (scene.cpp:481)
    refit: object = static(None)


def _pack_box16_np(lo, hi):
    """Pack conservative bf16 boxes into the 32-nodes-per-row i32
    table (see PacketAccel.box16)."""
    M = lo.shape[0]
    lo_q, hi_q = _bf16_conservative_np(lo, hi)     # (M,3) uint16 each
    w = np.zeros((M, 4), np.uint32)
    w[:, 0] = (lo_q[:, 0] << 16) | lo_q[:, 1]
    w[:, 1] = (lo_q[:, 2] << 16) | hi_q[:, 0]
    w[:, 2] = (hi_q[:, 1] << 16) | hi_q[:, 2]
    rows32 = -(-M // 32)
    w = np.pad(w, ((0, rows32 * 32 - M), (0, 0)))
    return w.reshape(rows32, 128).view(np.int32)


def build_packet_bvh(verts_np, faces_np, rpl: int = RPL,
                     batch: int = BATCH, mxu: bool = False,
                     box16: bool = False) -> PacketAccel:
    """Host SAH build + cluster layout (reference accel build,
    scene_embree.inl:113; runs at make_scene time like scene.cpp:70).
    Stays in numpy end to end — no device round-trips.  ``rpl`` (rows
    per leaf, 8-row DMA granularity) sets the cluster size PACK*rpl —
    bigger leaves shrink the serial node walk at the cost of more
    (vector-cheap) triangle tests."""
    from ...native import build_bvh_native

    tb = PACK * rpl
    out = build_bvh_native(verts_np, faces_np, tb)
    if out is None:
        from ..bvh import _build_bvh_median

        b = _build_bvh_median(verts_np, faces_np, tb)
        out = tuple(
            np.asarray(x)
            for x in (b.bbox_lo, b.bbox_hi, b.first, b.count, b.miss,
                      b.prims))
    lo, hi, first, count, miss, prims = out
    M = lo.shape[0]

    meta = np.zeros((M, 4), np.int32)
    perm = []
    n_leaves = 0
    ctr = (lo + hi) * 0.5
    for i in range(M):
        if count[i] > 0:
            meta[i, 0] = n_leaves * rpl
            meta[i, 1] = count[i]
            slot = prims[first[i]:first[i] + count[i]].astype(np.int32)
            perm.append(np.pad(slot, (0, tb - len(slot)),
                               constant_values=-1))
            n_leaves += 1
        else:
            meta[i, 0] = -1
            # ordered-traversal decode: in DFS layout the left child is
            # i+1 and its miss link is the right sibling; the near/far
            # order along the split axis is a sign compare of the child
            # box centers (kdtree.h traversal order; Embree's
            # front-to-back DFS).  slot 3 = right<<3 | flip<<2 | axis.
            left = i + 1
            right = int(miss[left])
            d = ctr[right] - ctr[left]
            axis = int(np.argmax(np.abs(d)))
            flip = int(d[axis] < 0.0)
            meta[i, 3] = (right << 3) | (flip << 2) | axis
        meta[i, 2] = miss[i]
    perm = (np.concatenate(perm) if perm
            else np.full((tb,), -1, np.int32))

    # refit metadata: per-slot vertex ids (padding -> vertex 0, masked)
    # + the bottom-up level sweep (refit_packet_bvh)
    leaf_nodes, levels = _refit_levels(count, miss)
    # the traversal kernels size their stacks for depth <= 96 (ordered
    # walk STACK, wave walk STACK_WAVE ~ WAVE * depth); SAH trees at the
    # MAX_NODES cap stay well under it — enforce rather than assume
    if len(levels) >= 95:
        raise ValueError(
            f"BVH depth {len(levels) + 1} exceeds the traversal stack "
            "bound (96); increase the leaf size (rpl)")
    slot_tri = np.where(perm < 0, 0, perm)
    vids = np.asarray(faces_np, np.int64)[slot_tri]      # (nl*tb, 3)
    valid = (perm >= 0)
    refit_meta = _StaticObj((leaf_nodes, levels,
                             vids.astype(np.int32), valid))

    # SMEM-friendly packing (512 B rows): 16 nodes per f32 box row
    # (32 per i32 row in box16 mode), 32 nodes per i32 meta row
    if box16:
        box = _pack_box16_np(lo, hi)
    else:
        box = np.zeros((M, 8), np.float32)
        box[:, 0:3] = lo
        box[:, 3:6] = hi
        rows16 = -(-M // 16)
        box = np.pad(box, ((0, rows16 * 16 - M), (0, 0))).reshape(
            rows16, 128)
    rows32 = -(-M // 32)
    meta = np.pad(meta, ((0, rows32 * 32 - M), (0, 0))).reshape(rows32, 128)
    return PacketAccel(
        node_box=jnp.asarray(box), node_meta=jnp.asarray(meta),
        perm=_StaticPerm(perm),
        n_nodes=M, n_leaves=max(n_leaves, 1), rpl=rpl, batch=batch,
        mxu=mxu, box16=box16, refit=refit_meta)


def refit_packet_bvh(layout: PacketAccel, verts) -> jnp.ndarray:
    """Recompute the packed SMEM node-box table from (possibly traced)
    vertex positions, topology fixed — the jit-compatible equivalent of
    the reference's parameters_changed accel rebuild (scene.cpp:481-509):
    leaf boxes from the static slot->vertex map, then a bottom-up
    level sweep of box unions.  Refit boxes are conservative by
    construction, so traversal results are exact for ANY deformation
    (the walk only uses boxes for culling); integrators call this once
    per trace so differentiable-geometry optimization (lens design,
    largesteps) stays correct on >1024-triangle scenes."""
    leaf_nodes, levels, vids, valid = layout.refit.v
    nl = layout.n_leaves
    tb = PACK * layout.rpl
    v = verts[vids.reshape(-1)].reshape(nl, tb * 3, 3)
    m = jnp.asarray(np.repeat(valid.reshape(nl, tb), 3, axis=1))[..., None]
    big = jnp.float32(3e37)
    leaf_lo = jnp.min(jnp.where(m, v, big), axis=1)
    leaf_hi = jnp.max(jnp.where(m, v, -big), axis=1)

    M = layout.n_nodes
    box_lo = jnp.full((M, 3), big).at[leaf_nodes].set(leaf_lo)
    box_hi = jnp.full((M, 3), -big).at[leaf_nodes].set(leaf_hi)
    for nodes, lefts, rights in levels:
        box_lo = box_lo.at[nodes].set(
            jnp.minimum(box_lo[lefts], box_lo[rights]))
        box_hi = box_hi.at[nodes].set(
            jnp.maximum(box_hi[lefts], box_hi[rights]))

    if layout.box16:
        def enc(x, up):
            b = jax.lax.bitcast_convert_type(x, jnp.uint32)
            r = b >> 16
            back = jax.lax.bitcast_convert_type(r << 16, jnp.float32)
            need = (back < x) if up else (back > x)
            pos = x >= 0.0
            step = jnp.where(pos == (not up), r - 1, r + 1)
            step = jnp.where((r == 0) & need & (not up),
                             jnp.uint32(0x8001), step)
            step = jnp.where((r == 0x8000) & need & up,
                             jnp.uint32(0x0001), step)
            return jnp.where(need, step, r) & jnp.uint32(0xFFFF)

        lo_q = enc(box_lo, up=False)
        hi_q = enc(box_hi, up=True)
        w = jnp.stack([
            (lo_q[:, 0] << 16) | lo_q[:, 1],
            (lo_q[:, 2] << 16) | hi_q[:, 0],
            (hi_q[:, 1] << 16) | hi_q[:, 2],
            jnp.zeros((M,), jnp.uint32),
        ], axis=1)
        rows32 = -(-M // 32)
        w = jnp.pad(w, ((0, rows32 * 32 - M), (0, 0)))
        return jax.lax.bitcast_convert_type(
            w.reshape(rows32, 128), jnp.int32)
    box = jnp.concatenate(
        [box_lo, box_hi, jnp.zeros((M, 2), jnp.float32)], axis=1)
    rows16 = -(-M // 16)
    box = jnp.pad(box, ((0, rows16 * 16 - M), (0, 0)))
    return box.reshape(rows16, 128)


def pack_leaf_rows(tri_cols: jnp.ndarray, layout: PacketAccel) -> jnp.ndarray:
    """Permute a per-face (F, 25) column matrix into the HBM leaf-row
    layout (n_leaves * RPL, 128).  Traceable (columns may be tracers);
    the permutation itself is static."""
    F = tri_cols.shape[0]
    assert tri_cols.shape[1] == N_COLS
    # padding slots read row 0 of a zero matrix (det = 0 -> never hit)
    safe = jnp.concatenate(
        [tri_cols, jnp.zeros((1, N_COLS), tri_cols.dtype)], axis=0)
    perm = layout.perm.a
    idx = np.where(perm < 0, F, perm)
    slots = safe[idx]                                   # (n_leaves*tb, 25)
    rows = slots.reshape(layout.n_leaves * layout.rpl, PACK * N_COLS)
    return jnp.pad(rows, ((0, 0), (0, 128 - PACK * N_COLS)))


def pack_mxu_rows(tri_cols: jnp.ndarray, layout: PacketAccel) -> jnp.ndarray:
    """Baldwin-Weber plane-coefficient leaf table for the MXU leaf stage
    (round 3; Baldwin & Weber, JCGT 2016 — precomputed affine functionals
    replace Moller-Trumbore so intersection becomes ONE dot_general).

    Per triangle, six 4-vectors applied to the homogeneous ray
    [o, 1, d, 0] (8 features):

      num = n.o - n.p0          den = n.d        (t = -num / den)
      u0  = s1.o - s1.p0        ud  = s1.d       (u = u0 + t*ud)
      v0  = s2.o - s2.p0        vd  = s2.d       (v = v0 + t*vd)

    with n = e1 x e2, s1 = (e2 x n)/|n|^2, s2 = (n x e1)/|n|^2, so (u, v)
    are exact barycentrics along (e1, e2).

    The six functionals split into an origin half (num/u0/v0, applied
    to [o, 1]) and a direction half (den/ud/vd, applied to [d, 0]), so
    the leaf block is (8, 3*TL): rows 0:4 = origin coeffs
    [vec, -vec.p0], rows 4:8 = direction coeffs [vec, 0]; columns
    grouped [num&den | u0&ud | v0&vd] x TL.  The kernel runs two K=4
    matmul stacks per group — vs one K=8 with structural zeros this
    halves both MAC work and DMA bytes (hardware A/B round 3: 0.541 vs
    0.527 Mray/s full-path).  Output: (n_leaves * 8, 3*TL).  Padding
    slots are all-zero -> den = 0 -> never hit.  Traceable like
    pack_leaf_rows; traversal runs on detached geometry either way.
    """
    F = tri_cols.shape[0]
    TL = PACK * layout.rpl
    perm = layout.perm.a
    idx = np.where(perm < 0, F, perm)
    safe = jnp.concatenate(
        [tri_cols[:, 0:9], jnp.zeros((1, 9), tri_cols.dtype)], axis=0)
    g = safe[idx]                               # (n_leaves*TL, 9)
    p0, e1, e2 = g[:, 0:3], g[:, 3:6], g[:, 6:9]
    nrm = jnp.cross(e1, e2)
    nn = jnp.sum(nrm * nrm, axis=-1, keepdims=True)
    inv = jnp.where(nn > 0.0, 1.0 / jnp.maximum(nn, 1e-30), 0.0)
    s1 = jnp.cross(e2, nrm) * inv
    s2 = jnp.cross(nrm, e1) * inv

    def feat(vec):     # 8 rows: [vec, -vec.p0] origin | [vec, 0] dir
        off = -jnp.sum(vec * p0, axis=-1, keepdims=True)
        zo = jnp.zeros_like(off)
        return jnp.concatenate([vec, off, vec, zo], axis=-1)

    blocks = jnp.stack([feat(nrm), feat(s1), feat(s2)],
                       axis=1)                  # (nl*TL, 3, 8)
    nl = layout.n_leaves
    blocks = blocks.reshape(nl, TL, 3, 8)
    blocks = jnp.transpose(blocks, (0, 3, 2, 1))  # (nl, 8, 3, TL)
    out = blocks.reshape(nl * 8, 3 * TL)
    # DMA slices must be lane-tile (128) aligned in dim 1
    return jnp.pad(out, ((0, 0), (0, mxu_width(layout.rpl) - 3 * TL)))


def mxu_width(rpl: int) -> int:
    """Lane-padded column count of the pack_mxu_rows table."""
    return -(-3 * PACK * rpl // 128) * 128


def res_width(rpl: int) -> int:
    """Lane-padded column count of the pack_resolve_rows table (the
    one-hot contraction length: triangle slots per leaf, padded)."""
    return -(-PACK * rpl // 128) * 128


def pack_resolve_rows(tri_cols: jnp.ndarray, layout: PacketAccel,
                      uv=None) -> jnp.ndarray:
    """Transposed per-leaf attribute table for the MXU one-hot resolve:
    (n_leaves * RES_COLS, res_width) where block [li*RES_COLS:(li+1)*
    RES_COLS] holds leaf li's N_COLS attr columns as ROWS and its
    triangle slots as COLUMNS, plus optional per-vertex uv rows
    (``uv`` is (F, 6) = uv0|uv1|uv2).  The deferred resolve then reads
    the winner's attrs with attrs = A @ onehot(winner_slot) — one
    (RES_COLS, TL) x (TL, 128) matmul per (distinct winning leaf,
    active group).  Traceable like pack_leaf_rows."""
    F = tri_cols.shape[0]
    TL = PACK * layout.rpl
    TLpad = res_width(layout.rpl)
    perm = layout.perm.a
    idx = np.where(perm < 0, F, perm)
    cols = tri_cols
    if uv is not None:
        assert uv.shape == (F, 6)
        cols = jnp.concatenate([cols, uv], axis=1)
    nc = cols.shape[1]
    safe = jnp.concatenate(
        [cols, jnp.zeros((1, nc), cols.dtype)], axis=0)
    slots = safe[idx]                                # (nl*TL, nc)
    blocks = slots.reshape(layout.n_leaves, TL, nc)
    blocks = jnp.transpose(blocks, (0, 2, 1))        # (nl, nc, TL)
    blocks = jnp.pad(blocks, ((0, 0), (0, RES_COLS - nc), (0, 0)))
    out = blocks.reshape(layout.n_leaves * RES_COLS, TL)
    return jnp.pad(out, ((0, 0), (0, TLpad - TL)))


def tri_columns(v, f, extra=None, normals=None):
    """Default (F, 32) geometry columns from concatenated verts/faces:
    p0 | e1 | e2 | zeros(shading 9:21) | face_id | n0 n1 n2 | pad.
    ``extra`` optionally overrides cols 9:21 with shading data (F, 12);
    ``normals`` optionally provides per-vertex shading normals
    (F, 9 = n0|n1|n2), defaulting to the face normal replicated."""
    p0 = v[f[:, 0]]
    e1 = v[f[:, 1]] - p0
    e2 = v[f[:, 2]] - p0
    F = f.shape[0]
    mid = (extra if extra is not None else jnp.zeros((F, 12)))
    if normals is None:
        ng = jnp.cross(e1, e2)
        ng = ng / jnp.sqrt(jnp.maximum(
            jnp.sum(ng * ng, -1, keepdims=True), 1e-30))
        normals = jnp.concatenate([ng, ng, ng], axis=1)
    fid = jnp.arange(F, dtype=jnp.float32)[:, None]
    return jnp.concatenate(
        [p0, e1, e2, mid, fid, normals, jnp.zeros((F, 1))], axis=1)


# ---------------------------------------------------------- kernel pieces

def _slab(lo, hi, ox, oy, oz, ix, iy, iz, t_hi):
    """Packet-vs-node AABB test; node bounds are SMEM scalars splat
    against the (8, 128) ray tile.  Returns f32 0/1 hit mask."""
    tx0 = (lo[0] - ox) * ix
    tx1 = (hi[0] - ox) * ix
    ty0 = (lo[1] - oy) * iy
    ty1 = (hi[1] - oy) * iy
    tz0 = (lo[2] - oz) * iz
    tz1 = (hi[2] - oz) * iz
    tn = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                 jnp.minimum(ty0, ty1)),
                     jnp.maximum(jnp.minimum(tz0, tz1), 0.0))
    tf = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                 jnp.maximum(ty0, ty1)),
                     jnp.minimum(jnp.maximum(tz0, tz1), t_hi))
    return (tn <= tf).astype(jnp.float32), tn


def _leaf_tri_test(c, ox, oy, oz, dx, dy, dz, maxt):
    """Moller-Trumbore, one SMEM-scalar triangle vs the ray tile
    (megakernel._tri_test with a leaf-buffer accessor)."""
    e1x, e1y, e1z = c(3), c(4), c(5)
    e2x, e2y, e2z = c(6), c(7), c(8)
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    ok = jnp.abs(det) > DET_EPS
    inv = 1.0 / jnp.where(ok, det, 1.0)
    tvx = ox - c(0)
    tvy = oy - c(1)
    tvz = oz - c(2)
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    vv = (dx * qvx + dy * qvy + dz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    hit = (ok & (u >= 0.0) & (vv >= 0.0) & (u + vv <= 1.0)
           & (t > 0.0) & (t <= maxt))
    return hit, t


def _node_box(node_box, nid):
    """Unpack node nid's bbox from the 16-nodes-per-row SMEM table."""
    r = nid // 16
    b = (nid % 16) * 8
    lo = (node_box[r, b], node_box[r, b + 1], node_box[r, b + 2])
    hi = (node_box[r, b + 3], node_box[r, b + 4], node_box[r, b + 5])
    return lo, hi


def _node_box16(node_box, nid):
    """Unpack a conservative-bf16 bbox (32 nodes per i32 row): each
    word holds two bf16 values (high half first).  Mosaic's tpu.bitcast
    needs VECTOR operands, so each SMEM word is splat to a (1, 1)
    vector first; the resulting (1, 1) f32 bounds broadcast in the
    slab test exactly like scalars."""
    r = nid // 32
    b = (nid % 32) * 4
    w0, w1, w2 = node_box[r, b], node_box[r, b + 1], node_box[r, b + 2]

    def pair(w):
        wv = jnp.full((1, 1), w, jnp.int32)
        first = pltpu.bitcast(wv & jnp.int32(-65536), jnp.float32)
        second = pltpu.bitcast(wv << 16, jnp.float32)
        return first, second

    lox, loy = pair(w0)
    loz, hix = pair(w1)
    hiy, hiz = pair(w2)
    return (lox, loy, loz), (hix, hiy, hiz)


def _box_decoder(box16: bool):
    return _node_box16 if box16 else _node_box


def _node_meta(node_meta, nid):
    """Unpack (row_start, count, miss_link) from the 32-per-row table."""
    r = nid // 32
    b = (nid % 32) * 4
    return node_meta[r, b], node_meta[r, b + 1], node_meta[r, b + 2]


def _node_meta4(node_meta, nid):
    """Like _node_meta plus the packed ordered-decode word (slot 3)."""
    r = nid // 32
    b = (nid % 32) * 4
    return (node_meta[r, b], node_meta[r, b + 1], node_meta[r, b + 2],
            node_meta[r, b + 3])


def _node_rs(node_meta, nid):
    """Only the row_start word (leaf test: rs >= 0) — one SMEM read."""
    return node_meta[nid // 32, (nid % 32) * 4]


QUEUE = 4      # leaf DMA queue depth (ring)

# ---- wave traversal (round 4) ----
# Instead of one node visit per serialized vector->scalar sync (~0.9 us
# each, ~119 per sorted bounce packet — PERF.md round-4 walk anatomy),
# pop up to WAVE stack entries per iteration, slab-test all their
# children and issue ALL per-node group-mask reduces back to back, so
# ONE sync retires up to WAVE node visits.  Hit leaf children enqueue
# into a leaf-batch ARENA at discovery (they never occupy a wave
# slot); full batches of K leaves are intersected with ONE MXU call
# set per active group while the next wave's reduces are in flight,
# which both hides the DMA latency and gives the reduces time to land
# before their scalar decode.
WAVE = int(_os.environ.get("MITSUBA_TPU_WAVE", "8"))
# stack pops per wave; the 2-bit hit encode is exact to 4^WAVE - 1,
# so WAVE <= 12 (2^24 - 1, the f32 integer limit).  Round-5 hardware
# sweep (PERF.md): WAVE=12 measured ~6% SLOWER than 8 on sorted bounce
# closest-hit — beyond ~8 the extra empty-slot slab work outweighs the
# sync amortization — so the round-4 default stands.
assert WAVE <= 12
# ---- leaf-batch arena (round 5) ----
# The round-4 leaf stage issued one 6-matmul set per (leaf, active
# group); at ~1.5 us per enqueue the stage was CALL-count bound, not
# MAC bound (PERF.md round-4 decomposition: ~50 of 109 ms closest-hit).
# Discovered leaves now accumulate in an ARENA-slot ring whose VMEM
# blocks are column-stacked — (ARENA/K, 8, K*W) — so K leaves are
# tested by ONE bf16x3 call set per group: ~K x fewer MXU calls for
# K x more (nearly free) MACs.  K scales down with leaf size so the
# batched key space K*TL stays <= 512 slots (9 low mantissa bits of t
# spent on the slot id) and the matmul outputs stay ~1 MB.
ARENA = 32         # leaf arena slots; >= leaf_batch(rpl) - 1 + 2*WAVE


def leaf_batch(rpl: int) -> int:
    """Leaves per batched MXU call set (power of two).  The batch runs
    on the UNION of the per-leaf group masks, so larger K trades
    per-call overhead against wasted streamed output rows on (leaf,
    group) pairs a per-leaf stage would skip.  Round-5 hardware sweep
    (PERF.md): K=1 101.9 ms, K=2 109.9, K=8 398.5 per 1M sorted bounce
    rays — the MXU leaf stage is output-streaming bound, not call
    bound, so batching LOSES and the per-leaf default stands.
    MITSUBA_TPU_LEAF_BATCH overrides for A/B sweeps."""
    import os

    env = os.environ.get("MITSUBA_TPU_LEAF_BATCH")
    cap = int(env) if env else 1
    return max(1, min(cap, 512 // (PACK * rpl)))


def mxu_scratch_shapes(rpl: int, wave: bool):
    """Scratch (leaf-block VMEM buffer + DMA semaphores) for the MXU
    leaf stage, shared by every kernel that embeds the traversal: the
    wave walk uses the column-stacked arena layout, the ordered walk a
    QUEUE-deep row-stacked ring."""
    if wave:
        K = leaf_batch(rpl)
        return [pltpu.VMEM((ARENA // K, 8, K * mxu_width(rpl)),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((ARENA,))]
    return [pltpu.VMEM((QUEUE * 8, mxu_width(rpl)), jnp.float32),
            pltpu.SemaphoreType.DMA((QUEUE,))]


# default: wave traversal on whenever the MXU leaf stage is active
USE_WAVE = True

# profiling affordance (examples/profile_r4.py): when True,
# packet_closest_hit returns (walk iterations, leaf enqueues) per packet
# instead of (t, prim) — set BEFORE the first jit of the kernel
DEBUG_COUNTERS = False
# profiling affordance: when True, leaf visits pay their DMA wait but
# skip the intersection work — isolates node-walk + ring cost
DEBUG_NOLEAF = False


def _ring_get(vals, idx):
    """4-way scalar select: vals[idx & 3] for a traced idx."""
    sel = idx & (QUEUE - 1)
    out = vals[0]
    for k in range(1, QUEUE):
        out = jnp.where(sel == k, vals[k], out)
    return out


# ------------------------------------------------- shared MXU leaf stage

def _bsplit(x):
    """f32 -> (bf16 hi, bf16 lo) split for the manual bf16x3 product."""
    h = x.astype(jnp.bfloat16)
    return h, (x - h.astype(jnp.float32)).astype(jnp.bfloat16)


def _mm3(ah, al, rh, rl):
    """bf16x3 matmul (hi*hi + hi*lo + lo*hi, f32 accumulation) over
    contraction dim 0 — ~2^-16 relative error, 3 single-pass MXU calls
    (PERF.md round-3: Precision.HIGHEST's 6-pass emulation erases the
    MXU win; one bf16 pass punches holes at triangle edges)."""
    dn = (((0,), (0,)), ((), ()))
    kw = dict(dimension_numbers=dn, preferred_element_type=jnp.float32)
    return (jax.lax.dot_general(ah, rh, **kw)
            + jax.lax.dot_general(ah, rl, **kw)
            + jax.lax.dot_general(al, rh, **kw))


def _ray_features_bf16(ox, oy, oz, dx, dy, dz):
    """Per-sublane-group (4, 128) bf16 hi/lo homogeneous ray features
    for the MXU leaf stage: origin half [o, 1], direction half [d, 0],
    matching the pack_mxu_rows feature order.  Built from (1, 128)
    sublane slices and returned as PYTHON lists — the earlier
    (8, 128) -> (1, 1024) lane-flattening reshapes each cost a full
    cross-lane relayout and dominated the per-packet fixed cost."""
    one_r = jnp.ones((1, LANES), jnp.float32)
    zero_r = jnp.zeros((1, LANES), jnp.float32)
    ray_oh, ray_ol, ray_dh, ray_dl = [], [], [], []
    for _s in range(SUB):
        og = jnp.concatenate(
            [ox[_s:_s + 1, :], oy[_s:_s + 1, :], oz[_s:_s + 1, :],
             one_r], axis=0)
        dg = jnp.concatenate(
            [dx[_s:_s + 1, :], dy[_s:_s + 1, :], dz[_s:_s + 1, :],
             zero_r], axis=0)
        h, l = _bsplit(og)
        ray_oh.append(h)
        ray_ol.append(l)
        h, l = _bsplit(dg)
        ray_dh.append(h)
        ray_dl.append(l)
    return ray_oh, ray_ol, ray_dh, ray_dl


def _make_mxu_dma(mxu_hbm, mqbuf, msems, rpl):
    """Leaf-block DMA helper: HBM Baldwin-Weber rows -> VMEM slot."""
    rpl_sh = int(np.log2(rpl))

    def mxu_dma(row_start, slot):
        mrow = pl.multiple_of((row_start >> rpl_sh) * 8, 8)
        return pltpu.make_async_copy(
            mxu_hbm.at[pl.ds(mrow, 8)],
            mqbuf.at[pl.ds(slot * 8, 8)], msems.at[slot])

    return mxu_dma


def _make_mxu_closest(mxu_ctx, rpl, feats, act, shape):
    """Build (mxu_dma, process_mxu) for closest-hit: per sublane group
    the whole leaf is tested with two bf16x3 K=4 matmul stacks
    (origin/direction functional halves) — 6 single-pass MXU calls per
    ACTIVE group; groups whose rays all missed the leaf's bbox at
    enqueue time skip entirely (gmask).  Winner selection packs
    (t bits | tri slot) into one int key and min-reduces: positive-f32
    bit order equals float order, costing t its log2(TL) low mantissa
    bits (SI is re-derived from the prim id downstream)."""
    mxu_hbm, mqbuf, msems = mxu_ctx
    TL = PACK * rpl
    JM = TL - 1
    BIGKEY = jnp.int32(0x7F000000)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (TL, LANES), 0)
    subsel = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    ray_oh, ray_ol, ray_dh, ray_dl = feats
    mxu_dma = _make_mxu_dma(mxu_hbm, mqbuf, msems, rpl)

    def process_mxu(row_start, gmask, slot,
                    found, best_t, best_row, best_j):
        mxu_dma(row_start, slot).wait()
        if DEBUG_NOLEAF:
            return found, best_t, best_row, best_j
        block = mqbuf[pl.ds(slot * 8, 8), :]            # (8, W)
        bh, bl = _bsplit(block)
        rsf = row_start.astype(jnp.float32)

        def group(s, carry):
            def run(c):
                f, bt, br, bj = c
                out_o = _mm3(bh[0:4], bl[0:4], ray_oh[s], ray_ol[s])
                out_d = _mm3(bh[4:8], bl[4:8], ray_dh[s], ray_dl[s])
                num = out_o[0 * TL:1 * TL]              # (TL, 128)
                den = out_d[0 * TL:1 * TL]
                okd = jnp.abs(den) > DET_EPS
                t = -num * pl.reciprocal(jnp.where(okd, den, 1.0),
                                         approx=False)
                u = out_o[1 * TL:2 * TL] + t * out_d[1 * TL:2 * TL]
                v = out_o[2 * TL:3 * TL] + t * out_d[2 * TL:3 * TL]
                bt_s = bt[s:s + 1, :]                   # (1, 128)
                hit = (okd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > 0.0) & (t < bt_s))
                key = jnp.where(
                    hit,
                    (pltpu.bitcast(t, jnp.int32) & jnp.int32(~JM))
                    | sub_iota,
                    BIGKEY)
                kmin = jnp.min(key, axis=0, keepdims=True)  # (1, 128)
                t_leaf = pltpu.bitcast(kmin & jnp.int32(~JM), jnp.float32)
                j_leaf = (kmin & JM).astype(jnp.float32)
                imp = (subsel == s) & (kmin < BIGKEY) & act
                bt = jnp.where(imp, jnp.broadcast_to(t_leaf, shape), bt)
                bj = jnp.where(imp, jnp.broadcast_to(j_leaf, shape), bj)
                br = jnp.where(imp, rsf, br)
                f = jnp.maximum(f, imp.astype(jnp.float32))
                return f, bt, br, bj

            return jax.lax.cond(((gmask >> s) & 1) != 0, run,
                                lambda c: c, carry)

        carry = (found, best_t, best_row, best_j)
        for s in range(SUB):
            carry = group(s, carry)
        return carry

    return mxu_dma, process_mxu


def _make_mxu_any(mxu_ctx, rpl, feats, maxt, shape):
    """Build (mxu_dma, process_mxu_any) for shadow rays: per-group
    masked bf16x3 leaf test, any-hit accumulation into occ."""
    mxu_hbm, mqbuf, msems = mxu_ctx
    TL = PACK * rpl
    subsel = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    ray_oh, ray_ol, ray_dh, ray_dl = feats
    mxu_dma = _make_mxu_dma(mxu_hbm, mqbuf, msems, rpl)

    def process_any(row_start, gmask, slot, occ):
        mxu_dma(row_start, slot).wait()
        if DEBUG_NOLEAF:
            return occ
        block = mqbuf[pl.ds(slot * 8, 8), :]            # (8, W)
        bh, bl = _bsplit(block)

        def group(s, occ):
            def run(occ):
                out_o = _mm3(bh[0:4], bl[0:4], ray_oh[s], ray_ol[s])
                out_d = _mm3(bh[4:8], bl[4:8], ray_dh[s], ray_dl[s])
                num = out_o[0 * TL:1 * TL]
                den = out_d[0 * TL:1 * TL]
                okd = jnp.abs(den) > DET_EPS
                t = -num * pl.reciprocal(jnp.where(okd, den, 1.0),
                                         approx=False)
                u = out_o[1 * TL:2 * TL] + t * out_d[1 * TL:2 * TL]
                v = out_o[2 * TL:3 * TL] + t * out_d[2 * TL:3 * TL]
                mt_s = maxt[s:s + 1, :]
                hit = (okd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > 0.0) & (t <= mt_s))
                anyh = jnp.max(hit.astype(jnp.float32), axis=0,
                               keepdims=True)           # (1, 128)
                return jnp.where(subsel == s,
                                 jnp.maximum(occ, jnp.broadcast_to(
                                     anyh, shape)), occ)

            return jax.lax.cond(((gmask >> s) & 1) != 0, run,
                                lambda o: o, occ)

        for s in range(SUB):
            occ = group(s, occ)
        return occ

    return mxu_dma, process_any


def _make_mxu_dma_arena(mxu_hbm, mqbuf, msems, rpl, K):
    """Leaf-block DMA into the column-stacked arena: slot s lands in
    batch b = s // K at lane columns [(s % K) * W, (s % K + 1) * W), so
    a whole K-leaf batch is one contiguous (8, K*W) VMEM block the
    batched leaf stage can feed to the MXU in a single call set."""
    rpl_sh = int(np.log2(rpl))
    k_sh = int(np.log2(K))
    W = mxu_width(rpl)

    def mxu_dma(row_start, slot):
        mrow = pl.multiple_of((row_start >> rpl_sh) * 8, 8)
        b = slot >> k_sh
        j = slot - (b << k_sh)
        return pltpu.make_async_copy(
            mxu_hbm.at[pl.ds(mrow, 8)],
            mqbuf.at[b, :, pl.ds(j * W, W)], msems.at[slot])

    return mxu_dma


def _arena_batch_common(mqbuf, mxu_dma, lrow, lgm, rpl, K, head, nvalid):
    """Shared head of a batched leaf-stage step: wait the batch's DMA
    semaphores, OR the per-leaf group masks, read the (8, K*W) block
    and its bf16 split, and fetch the per-leaf row_start scalars."""
    A = ARENA
    k_sh = int(np.log2(K))
    base = head & (A - 1)            # K-aligned (head advances by K)

    def wbody(i, gm_u):
        slot = base + i
        mxu_dma(lrow[slot], slot).wait()
        return gm_u | lgm[slot]

    gm_u = jax.lax.fori_loop(0, nvalid, wbody, jnp.int32(0))
    block = mqbuf[base >> k_sh]      # (8, K*W)
    bh, bl = _bsplit(block)
    rows_f = [lrow[base + k].astype(jnp.float32) for k in range(K)]
    return gm_u, bh, bl, rows_f


def _make_mxu_closest_arena(mxu_ctx, rpl, K, feats, act, shape):
    """Batched closest-hit leaf stage (round 5): ONE bf16x3 matmul set
    per (K-leaf batch, active group) instead of per (leaf, group).  The
    winner key packs (t bits | batch slot k*TL + j) and one min-reduce
    selects across the whole batch; the winning leaf's row_start is
    recovered with K cheap vector selects.  Leaves whose group-mask bit
    is 0 for a group are tested anyway — harmless (a triangle hit
    implies its leaf bbox was hit; extra tests cannot create winners) —
    because the batch runs on the UNION mask."""
    mxu_hbm, mqbuf, msems = mxu_ctx
    TL = PACK * rpl
    W = mxu_width(rpl)
    JM = TL - 1
    BIGKEY = jnp.int32(0x7F000000)
    # per-leaf slot iota: key truncation stays log2(TL) bits (identical
    # to the per-leaf stage); the cross-leaf winner is selected by a
    # separate vector argmin so batching costs t NO extra precision
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (K, TL, LANES), 1)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (K, LANES), 0)
    k_valid = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    subsel = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    ray_oh, ray_ol, ray_dh, ray_dl = feats
    mxu_dma = _make_mxu_dma_arena(mxu_hbm, mqbuf, msems, rpl, K)

    def process_batch(head, nvalid, lrow, lgm,
                      found, best_t, best_row, best_j):
        gm_u, bh, bl, rows_f = _arena_batch_common(
            mqbuf, mxu_dma, lrow, lgm, rpl, K, head, nvalid)
        if DEBUG_NOLEAF:
            return found, best_t, best_row, best_j
        vmask = k_valid < nvalid

        def group(s, carry):
            def run(c):
                f, bt, br, bj = c
                out_o = _mm3(bh[0:4], bl[0:4], ray_oh[s], ray_ol[s])
                out_d = _mm3(bh[4:8], bl[4:8], ray_dh[s], ray_dl[s])
                oo = out_o.reshape(K, W, LANES)
                od = out_d.reshape(K, W, LANES)
                num, u0, v0 = (oo[:, 0:TL], oo[:, TL:2 * TL],
                               oo[:, 2 * TL:3 * TL])
                den, ud, vd = (od[:, 0:TL], od[:, TL:2 * TL],
                               od[:, 2 * TL:3 * TL])
                okd = jnp.abs(den) > DET_EPS
                t = -num * pl.reciprocal(jnp.where(okd, den, 1.0),
                                         approx=False)
                u = u0 + t * ud
                v = v0 + t * vd
                bt_s = bt[s:s + 1, :][None]          # (1, 1, 128)
                hit = (okd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > 0.0) & (t < bt_s) & vmask)
                key = jnp.where(
                    hit,
                    (pltpu.bitcast(t, jnp.int32) & jnp.int32(~JM))
                    | j_iota,
                    BIGKEY)
                key1 = jnp.min(key, axis=1)          # (K, 128)
                kmin = jnp.min(key1, axis=0, keepdims=True)  # (1, 128)
                # first leaf in enqueue order wins key ties — matches
                # the sequential per-leaf stage's strict-< update
                kidx = jnp.min(jnp.where(key1 == kmin, k_iota, K),
                               axis=0, keepdims=True)
                t_leaf = pltpu.bitcast(kmin & jnp.int32(~JM),
                                       jnp.float32)
                j_leaf = (kmin & JM).astype(jnp.float32)
                rowv = jnp.zeros_like(t_leaf)
                for k in range(K):
                    rowv = jnp.where(kidx == k, rows_f[k], rowv)
                imp = (subsel == s) & (kmin < BIGKEY) & act
                bt = jnp.where(imp, jnp.broadcast_to(t_leaf, shape), bt)
                bj = jnp.where(imp, jnp.broadcast_to(j_leaf, shape), bj)
                br = jnp.where(imp, jnp.broadcast_to(rowv, shape), br)
                f = jnp.maximum(f, imp.astype(jnp.float32))
                return f, bt, br, bj

            return jax.lax.cond(((gm_u >> s) & 1) != 0, run,
                                lambda c: c, carry)

        carry = (found, best_t, best_row, best_j)
        for s in range(SUB):
            carry = group(s, carry)
        return carry

    return mxu_dma, process_batch


def _make_mxu_any_arena(mxu_ctx, rpl, K, feats, maxt, shape):
    """Batched any-hit leaf stage: one bf16x3 call set per (K-leaf
    batch, active group), any-hit accumulation into occ."""
    mxu_hbm, mqbuf, msems = mxu_ctx
    TL = PACK * rpl
    W = mxu_width(rpl)
    k_valid = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    subsel = jax.lax.broadcasted_iota(jnp.int32, (SUB, LANES), 0)
    ray_oh, ray_ol, ray_dh, ray_dl = feats
    mxu_dma = _make_mxu_dma_arena(mxu_hbm, mqbuf, msems, rpl, K)

    def process_batch(head, nvalid, lrow, lgm, occ):
        gm_u, bh, bl, _ = _arena_batch_common(
            mqbuf, mxu_dma, lrow, lgm, rpl, K, head, nvalid)
        if DEBUG_NOLEAF:
            return occ
        vmask = k_valid < nvalid

        def group(s, occ):
            def run(occ):
                out_o = _mm3(bh[0:4], bl[0:4], ray_oh[s], ray_ol[s])
                out_d = _mm3(bh[4:8], bl[4:8], ray_dh[s], ray_dl[s])
                oo = out_o.reshape(K, W, LANES)
                od = out_d.reshape(K, W, LANES)
                num, u0, v0 = (oo[:, 0:TL], oo[:, TL:2 * TL],
                               oo[:, 2 * TL:3 * TL])
                den, ud, vd = (od[:, 0:TL], od[:, TL:2 * TL],
                               od[:, 2 * TL:3 * TL])
                okd = jnp.abs(den) > DET_EPS
                t = -num * pl.reciprocal(jnp.where(okd, den, 1.0),
                                         approx=False)
                u = u0 + t * ud
                v = v0 + t * vd
                mt_s = maxt[s:s + 1, :][None]
                hit = (okd & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > 0.0) & (t <= mt_s) & vmask)
                anyh = jnp.max(jnp.max(hit.astype(jnp.float32), axis=0),
                               axis=0, keepdims=True)    # (1, 128)
                return jnp.where(subsel == s,
                                 jnp.maximum(occ, jnp.broadcast_to(
                                     anyh, shape)), occ)

            return jax.lax.cond(((gm_u >> s) & 1) != 0, run,
                                lambda o: o, occ)

        for s in range(SUB):
            occ = group(s, occ)
        return occ

    return mxu_dma, process_batch


def _gm_encode2(aL, aR, w2):
    """Per-child group-mask scalars from (SUB, 1) any-flags.  At
    SUB <= 8 the 8+8 packed single-reduce encode is exact in f32
    (< 2^16); at SUB = 16 the pack would exceed 2^24, so two reduces."""
    if SUB <= 8:
        b = jnp.sum((aL + 256.0 * aR) * w2).astype(jnp.int32)
        return b & 255, (b >> 8) & 255
    bL = jnp.sum(aL * w2).astype(jnp.int32)
    bR = jnp.sum(aR * w2).astype(jnp.int32)
    return bL, bR


def _inv_dir(dx, dy, dz):
    eps = jnp.float32(1e-30)
    ix = 1.0 / jnp.where(jnp.abs(dx) > eps, dx,
                         jnp.where(dx >= 0, eps, -eps))
    iy = 1.0 / jnp.where(jnp.abs(dy) > eps, dy,
                         jnp.where(dy >= 0, eps, -eps))
    iz = 1.0 / jnp.where(jnp.abs(dz) > eps, dz,
                         jnp.where(dz >= 0, eps, -eps))
    return ix, iy, iz


def traverse_closest(node_box, node_meta, rows_hbm, qbuf, sems,
                     n_nodes, ox, oy, oz, dx, dy, dz, maxt, act,
                     resolve_cols=(COL_FACE_ID,), rpl=RPL, batch=BATCH,
                     mxu_ctx=None, res_ctx=None, box16=False):
    """Packet closest-hit traversal subroutine (kernel-internal).

    node_box/node_meta are packed SMEM refs (see PacketAccel); rows_hbm
    an ANY/HBM ref; qbuf an SMEM (QUEUE, rpl, 128) scratch; sems a DMA
    semaphore vector.  Discovered leaves enter a QUEUE-deep DMA ring and
    are intersected only when the ring fills (or at drain), so HBM copy
    latency overlaps both the node walk and earlier leaf processing.
    Returns (found, best_t, attrs) where ``found`` is an f32 0/1 tile,
    plus one (8, 128) f32 tile per requested resolve column; lanes with
    no hit keep best_t at its maxt init and attrs = -1 for COL_FACE_ID,
    0 otherwise.

    Each iteration speculatively tests ``batch`` consecutive DFS nodes:
    in DFS order with threaded miss links, a hit interior node's
    successor is exactly the next node, so the scalar decode walks the
    prefix of consecutive interior hits and exits on the first miss or
    leaf.  The per-node vector->scalar sync (the ~100 ns serial floor of
    the walk, PERF.md) is paid once per batch — the ``batch``
    reductions are independent and pipeline.

    ``mxu_ctx`` = (mxu_hbm, mxu_qbuf, mxu_sems) enables the round-3 MXU
    leaf stage: leaf triangles arrive as Baldwin-Weber plane
    coefficients (pack_mxu_rows) and each leaf visit is ONE dot_general
    per 128-ray sublane group — (8, 6*TL) x (8, 128) -> (6*TL, 128) —
    instead of a per-triangle scalar-splat loop.  The enqueue-time slab
    mask doubles as a GROUP mask, so groups whose rays all miss the
    leaf's bbox skip their matmul entirely (hardware: ~2.4x leaf-stage
    win before masking, examples/ubench_mxu_leaf.py).  ``rows_hbm``
    (attr slots) is then only used by the deferred attribute resolve.

    ``res_ctx`` = (res_hbm, res_buf, res_sems) switches the deferred
    resolve to the round-4 MXU one-hot form: per distinct winning leaf
    the transposed attr block (pack_resolve_rows) is DMA'd (double
    buffered) and each active group reads ALL its winner attrs with
    one bit-exact 3-term bf16 one-hot matmul — replacing the
    tb-iteration scalar-select loop whose cost dominated the resolve
    (round-4 profile: ~130 ms of a 343 ms bounce launch was resolve).
    ``resolve_cols`` may then include the uv rows (COL_UV..COL_UV+5).
    """
    shape = ox.shape
    ix, iy, iz = _inv_dir(dx, dy, dz)
    nbox = _box_decoder(box16)
    actf = act.astype(jnp.float32)

    n_res = len(resolve_cols)
    mxu = mxu_ctx is not None
    if mxu:
        w2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
            jnp.int32, (SUB, 1), 0).astype(jnp.float32)
        feats = _ray_features_bf16(ox, oy, oz, dx, dy, dz)
        mxu_dma, process_mxu = _make_mxu_closest(
            mxu_ctx, rpl, feats, act, shape)

    def process(row_start, cnt, slot, found, best_t, best_row, best_j):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row_start, rpl)],
            qbuf.at[slot], sems.at[slot],
        ).wait()

        # strength-reduced slot addressing: (r, cb) ride the carry so the
        # hot loop pays two scalar selects instead of an integer div/mod
        def tri_body(j, carry):
            lt, lj, r, cb = carry
            c = lambda k: qbuf[slot, r, cb + k]
            hit, t = _leaf_tri_test(c, ox, oy, oz, dx, dy, dz, lt)
            win = hit & (t < lt)
            lt = jnp.where(win, t, lt)
            lj = jnp.where(win, j.astype(jnp.float32), lj)
            wrap = cb + STRIDE >= PACK * STRIDE
            r = jnp.where(wrap, r + 1, r)
            cb = jnp.where(wrap, 0, cb + STRIDE)
            return lt, lj, r, cb

        lt, lj, _, _ = jax.lax.fori_loop(
            0, cnt, tri_body,
            (best_t, jnp.full(shape, -1.0), jnp.int32(0), jnp.int32(0)))
        improved = (lj >= 0.0) & act
        rsf = row_start.astype(jnp.float32)
        best_row = jnp.where(improved, rsf, best_row)
        best_j = jnp.where(improved, lj, best_j)
        best_t = jnp.where(improved, lt, best_t)
        found = jnp.maximum(found, improved.astype(jnp.float32))
        return found, best_t, best_row, best_j

    # ring scalars: rows + cnts (+ per-leaf group masks in MXU mode)
    NQ = (3 if mxu else 2) * QUEUE

    # Ordered (front-to-back) traversal with a scalar SMEM stack — the
    # DFS miss-link walk visited subtrees in static layout order, so for
    # rays pointing against a split axis the FAR subtree ran first and
    # best_t stayed large through most of the walk.  Here each interior
    # visit slab-tests both children (per-lane best_t culling), descends
    # the near one by the packet's direction sign, and pushes the far one
    # with its packet-min entry t; a popped entry is discarded when no
    # active lane's best_t can still improve on it (Embree's ordered DFS,
    # kdtree.h near/far traversal).
    STACK = 96   # >= max SAH tree depth at the MAX_NODES cap

    # per-packet near-child signs (one vector reduce per axis, once per
    # traversal).  Upstream sorts bounce packets by direction octant, so
    # the majority sign is exact for coherent packets and a heuristic
    # (never a correctness issue) for mixed ones.
    sg = (jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0)
    neg_inf = jnp.float32(-jnp.inf)

    def walk(stack, tstack, mstack):
        def cond(s):
            cursor, head, tail = s[0], s[1], s[2]
            return (cursor >= 0) | (tail > head)

        def body(s):
            cursor, head, tail, sp, pmask = (s[0], s[1], s[2], s[3], s[4])
            ring = s[5:5 + NQ]
            rows_ring, cnts_ring = ring[:QUEUE], ring[QUEUE:2 * QUEUE]
            masks_ring = ring[2 * QUEUE:]
            found, best_t = s[5 + NQ], s[6 + NQ]
            best_row, best_j = s[7 + NQ], s[8 + NQ]
            max_best = s[9 + NQ]
            n_it, n_enq = s[10 + NQ], s[11 + NQ]

            nid = jnp.maximum(cursor, 0)
            is_node = cursor >= 0
            rs, ct, _, r3 = _node_meta4(node_meta, nid)
            is_leaf = rs >= 0

            left = jnp.minimum(nid + 1, n_nodes - 1)
            right = jnp.minimum(r3 >> 3, n_nodes - 1)
            axis = r3 & 3
            flip = (r3 >> 2) & 1
            # child leaf metadata (scalar SMEM reads, cheap)
            rsL, ctL, _, _ = _node_meta4(node_meta, left)
            rsR, ctR, _, _ = _node_meta4(node_meta, right)
            loL, hiL = nbox(node_box, left)
            loR, hiR = nbox(node_box, right)
            hmL, tnL = _slab(loL, hiL, ox, oy, oz, ix, iy, iz, best_t)
            hmL = hmL * actf
            hmR, tnR = _slab(loR, hiR, ox, oy, oz, ix, iy, iz, best_t)
            hmR = hmR * actf

            sga = jnp.where(axis == 0, sg[0],
                            jnp.where(axis == 1, sg[1], sg[2]))
            near_is_left = jnp.logical_xor(sga, flip == 1)
            # packet-min entry t of BOTH children, computed up front so
            # these reduces issue back-to-back with the hit-bits reduce
            # below and their vector->scalar sync latencies overlap
            # (previously the far child's min ran inside the push
            # branch, serialized AFTER the bits decode)
            tnL_min = jnp.min(jnp.where(hmL > 0.0, tnL, jnp.inf))
            tnR_min = jnp.min(jnp.where(hmR > 0.0, tnR, jnp.inf))
            if mxu:
                # ONE reduction decodes both children AND yields the
                # per-sublane-group masks the MXU leaf stage skips by:
                # anyL/anyR are 0/1 per group, so the base-2 weighted sum
                # (groups 0..7 for L, scaled 256 for R) stays < 2^16 —
                # exact in f32
                anyL = jnp.max(hmL, axis=1, keepdims=True)
                anyR = jnp.max(hmR, axis=1, keepdims=True)
                gmL, gmR = _gm_encode2(anyL, anyR, w2)
                hitL = gmL > 0
                hitR = gmR > 0
                gm_n = jnp.where(near_is_left, gmL, gmR)
                gm_f = jnp.where(near_is_left, gmR, gmL)
            else:
                # ONE vector->scalar reduction decodes both child hits:
                # lane sums stay < 1024 so s = nL + 4096*nR splits
                # exactly in f32
                s = jnp.sum(hmL + 4096.0 * hmR)
                hitR = s >= 4096.0
                hitL = (s - jnp.floor(s * (1.0 / 4096.0)) * 4096.0) > 0.0
            hn = jnp.where(near_is_left, hitL, hitR)
            hf = jnp.where(near_is_left, hitR, hitL)
            near = jnp.where(near_is_left, left, right)
            far = jnp.where(near_is_left, right, left)
            rs_n = jnp.where(near_is_left, rsL, rsR)
            ct_n = jnp.where(near_is_left, ctL, ctR)
            rs_f = jnp.where(near_is_left, rsR, rsL)
            ct_f = jnp.where(near_is_left, ctR, ctL)
            nearleaf = rs_n >= 0
            farleaf = rs_f >= 0

            interior = is_node & ~is_leaf
            # near-leaf fast path: enqueue it this iteration and descend
            # the far child directly when it is a hit interior — a leaf
            # visit costs no extra traversal iteration
            desc_near = interior & hn & ~nearleaf
            desc_far = interior & hf & ~farleaf & ~desc_near
            # far goes on the stack only when the near side is consumed
            # this iteration (descend or enqueue) and far isn't descended
            push = interior & hf & hn & ~desc_far

            @pl.when(push)
            def _():
                # far child's packet-min entry t (prune key) — a scalar
                # select of the precomputed overlapped reduces
                stack[sp] = far
                tstack[sp] = jnp.where(near_is_left, tnR_min, tnL_min)
                if mxu:
                    # far may be a leaf: its group mask rides the stack
                    mstack[sp] = gm_f

            sp = sp + push.astype(jnp.int32)
            nxt = jnp.where(desc_near, near,
                            jnp.where(desc_far, far, jnp.int32(-1)))

            # one leaf DMA per iteration: a hit near-leaf, else a hit
            # far-leaf not pushed (its sibling missed or was a leaf too
            # -- in the both-leaves case far rides the stack)
            enq_near = interior & hn & nearleaf
            enq_far = (interior & hf & farleaf & ~enq_near
                       & ~(hn & nearleaf))
            enqueue = enq_near | enq_far | (is_node & is_leaf)
            rs = jnp.where(enq_near, rs_n, jnp.where(enq_far, rs_f, rs))
            ct = jnp.where(enq_near, ct_n, jnp.where(enq_far, ct_f, ct))
            if mxu:
                # popped leaves (is_node & is_leaf) carry pmask from the
                # stack; direct near/far enqueues use this visit's masks
                gm = jnp.where(enq_near, gm_n,
                               jnp.where(enq_far, gm_f, pmask))

            # pop the oldest leaf when the ring is full (its DMA has had
            # QUEUE-1 enqueues worth of latency cover) or when draining
            full = (tail - head) >= QUEUE
            do_process = (enqueue & full) | (~is_node & (tail > head))
            p_row = _ring_get(rows_ring, head)
            p_cnt = _ring_get(cnts_ring, head)
            if mxu:
                p_cnt = _ring_get(masks_ring, head)
            p_slot = head & (QUEUE - 1)

            def do_p(fd, bt, br, bj, mb):
                proc = process_mxu if mxu else process
                fd, bt, br, bj = proc(p_row, p_cnt, p_slot, fd, bt, br,
                                      bj)
                return fd, bt, br, bj, jnp.max(
                    jnp.where(act, bt, neg_inf))

            found, best_t, best_row, best_j, max_best = jax.lax.cond(
                do_process, do_p,
                lambda fd, bt, br, bj, mb: (fd, bt, br, bj, mb),
                found, best_t, best_row, best_j, max_best)
            head = head + do_process.astype(jnp.int32)

            new_slot = tail & (QUEUE - 1)

            @pl.when(enqueue)
            def _():
                if mxu:
                    mxu_dma(rs, new_slot).start()
                else:
                    pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(rs, rpl)],
                        qbuf.at[new_slot], sems.at[new_slot],
                    ).start()

            rows_ring = tuple(
                jnp.where(enqueue & (new_slot == k), rs, v)
                for k, v in enumerate(rows_ring))
            cnts_ring = tuple(
                jnp.where(enqueue & (new_slot == k), ct, v)
                for k, v in enumerate(cnts_ring))
            if mxu:
                masks_ring = tuple(
                    jnp.where(enqueue & (new_slot == k), gm, v)
                    for k, v in enumerate(masks_ring))
            tail = tail + enqueue.astype(jnp.int32)

            # out of nodes: pop stack entries, discarding any whose
            # packet-min entry t can no longer beat any lane's best_t
            def pcond(c):
                return (c[0] < 0) & (c[1] > 0)

            def pbody(c):
                _, spc, pm = c
                spc = spc - 1
                keep = tstack[spc] < max_best
                if mxu:
                    pm = jnp.where(keep, mstack[spc], pm)
                return (jnp.where(keep, stack[spc], jnp.int32(-1)), spc,
                        pm)

            nxt, sp, pmask = jax.lax.while_loop(
                pcond, pbody, (nxt, sp, pmask))
            return (nxt, head, tail, sp, pmask) + rows_ring + cnts_ring \
                + (masks_ring if mxu else ()) + (
                found, best_t, best_row, best_j, max_best,
                n_it + 1, n_enq + enqueue.astype(jnp.int32))

        z = jnp.int32(0)
        init = (z, z, z, z, jnp.int32(255)) + (z,) * NQ + (
            jnp.zeros(shape), maxt, jnp.full(shape, -1.0),
            jnp.full(shape, -1.0), jnp.max(jnp.where(act, maxt, neg_inf)),
            z, z)
        out = jax.lax.while_loop(cond, body, init)
        if DEBUG_COUNTERS:
            cnt = (out[10 + NQ].astype(jnp.float32)
                   + jnp.zeros(shape))
            enqf = (out[11 + NQ].astype(jnp.float32)
                    + jnp.zeros(shape))
            return out[5 + NQ], cnt, out[7 + NQ], enqf
        return out[5 + NQ], out[6 + NQ], out[7 + NQ], out[8 + NQ]

    found, best_t, best_row, best_j = pl.run_scoped(
        walk,
        pltpu.SMEM((STACK,), jnp.int32),
        pltpu.SMEM((STACK,), jnp.float32),
        pltpu.SMEM((STACK,), jnp.int32))

    if DEBUG_COUNTERS:
        # debug: best_t carries walk iterations, best_j leaf enqueues;
        # skip the resolve so the counters time the walk alone
        return found, best_t, tuple(best_j for _ in resolve_cols)

    attrs = _resolve_deferred(found, best_t, best_row, best_j,
                              resolve_cols, rows_hbm, qbuf, sems,
                              res_ctx, rpl, shape)
    return found, best_t, attrs


def _resolve_deferred(found, best_t, best_row, best_j, resolve_cols,
                      rows_hbm, qbuf, sems, res_ctx, rpl, shape):
    """Deferred attribute resolve over DISTINCT winning leaves.

    The walk carries only the winner's identity (row_start, j); shading
    attributes are fetched afterwards, once per distinct winning leaf
    (typically ~10 for a coherent packet) instead of per visited leaf
    (~100) — the per-leaf masked-select resolve was a dominant cost
    (PERF.md round-2 profile).  With ``res_ctx`` (round 4) each distinct
    leaf costs ONE bit-exact 3-term bf16 one-hot matmul per active
    group instead of a tb-iteration scalar-select loop."""
    n_res = len(resolve_cols)
    init_attrs = tuple(
        jnp.full(shape, -1.0) if col == COL_FACE_ID else jnp.zeros(shape)
        for col in resolve_cols)
    if n_res == 0:
        return ()
    tb = PACK * rpl

    if res_ctx is not None:
        # ---- MXU one-hot resolve (round 4) ----
        res_hbm, rbuf, rsems = res_ctx
        TLpad = -(-tb // 128) * 128
        rpl_sh2 = int(np.log2(rpl))
        # integer iota (tpu.iota only produces int vectors on hardware)
        kiota = jax.lax.broadcasted_iota(jnp.int32, (TLpad, LANES), 0)
        subsel_r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        w2r = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
            jnp.int32, (SUB, 1), 0).astype(jnp.float32)
        BIG = jnp.float32(3e38)
        dn_r = (((1,), (0,)), ((), ()))
        mm_kw = dict(dimension_numbers=dn_r,
                     preferred_element_type=jnp.float32)
        TOPMASK = jnp.int32(-65536)          # 0xFFFF0000

        def rdma(r0f, slot):
            li = pl.multiple_of(
                (r0f.astype(jnp.int32) >> rpl_sh2) * RES_COLS, 8)
            off = pl.multiple_of(slot * RES_COLS, 8)
            return pltpu.make_async_copy(
                res_hbm.at[pl.ds(li, RES_COLS)],
                rbuf.at[pl.ds(off, RES_COLS)], rsems.at[slot])

        def next_r0(un):
            return jnp.min(jnp.where(un > 0.0, best_row, BIG))

        r0f0 = next_r0(found)

        @pl.when(r0f0 < BIG)
        def _():
            rdma(r0f0, 0).start()

        def rcond2(s):
            return s[0] < BIG

        def rbody2(s):
            r0f, un, it = s[0], s[1], s[2]
            attrs = s[3:]
            m = (un > 0.0) & (best_row == r0f)
            mf = m.astype(jnp.float32)
            un = un * (1.0 - mf)
            # prefetch the NEXT distinct leaf before processing this
            # one: the reduce + DMA ride under the matmul work below
            r0f_next = next_r0(un)
            slot = it & 1

            @pl.when(r0f_next < BIG)
            def _():
                rdma(r0f_next, 1 - slot).start()

            rdma(r0f, slot).wait()
            off = pl.multiple_of(slot * RES_COLS, 8)
            A = rbuf[pl.ds(off, RES_COLS), :]        # (RES_COLS, TLpad)
            # EXACT 3-way bf16 split by mantissa truncation: hi keeps
            # the top 8 significant bits (= f32's top 16 raw bits =
            # bf16 layout), the residual has <=16 significant bits and
            # splits exactly into two more bf16 terms
            hi_f = pltpu.bitcast(
                pltpu.bitcast(A, jnp.int32) & TOPMASK, jnp.float32)
            r1 = A - hi_f
            mid_f = pltpu.bitcast(
                pltpu.bitcast(r1, jnp.int32) & TOPMASK, jnp.float32)
            lo_f = r1 - mid_f
            ah = hi_f.astype(jnp.bfloat16)
            am = mid_f.astype(jnp.bfloat16)
            al = lo_f.astype(jnp.bfloat16)
            bits = jnp.sum(jnp.max(mf, axis=1, keepdims=True)
                           * w2r).astype(jnp.int32)

            def grp(g, attrs):
                def run(attrs):
                    # winner slot ids are small ints riding f32; the
                    # cast is exact and lets the compare stay integer
                    jb = jnp.broadcast_to(
                        best_j[g:g + 1, :].astype(jnp.int32),
                        (TLpad, LANES))
                    mb = jnp.broadcast_to(mf[g:g + 1, :],
                                          (TLpad, LANES))
                    oh = ((kiota == jb) & (mb > 0.0)).astype(
                        jnp.bfloat16)
                    out = (jax.lax.dot_general(ah, oh, **mm_kw)
                           + jax.lax.dot_general(am, oh, **mm_kw)
                           + jax.lax.dot_general(al, oh, **mm_kw))
                    return tuple(
                        a + jnp.where(
                            subsel_r == g,
                            jnp.broadcast_to(out[c:c + 1, :], shape),
                            0.0)
                        for c, a in zip(resolve_cols, attrs))

                return jax.lax.cond(((bits >> g) & 1) != 0, run,
                                    lambda a: a, attrs)

            for g in range(SUB):
                attrs = grp(g, attrs)
            return (r0f_next, un, it + 1) + attrs

        # attrs accumulate from zero (each winning lane matches exactly
        # one leaf); the face column's no-hit sentinel is applied after
        zero_attrs = tuple(jnp.zeros(shape) for _ in resolve_cols)
        out_r = jax.lax.while_loop(
            rcond2, rbody2, (r0f0, found, jnp.int32(0)) + zero_attrs)
        attrs = tuple(
            jnp.where(found > 0.0, a, -1.0) if col == COL_FACE_ID else a
            for col, a in zip(resolve_cols, out_r[3:]))
        return attrs

    def rcond(s):
        return jnp.max(s[0]) > 0.0

    def rbody(s):
        un = s[0]
        attrs = s[1:]
        r0f = jnp.min(jnp.where(un > 0.0, best_row, jnp.inf))
        r0 = r0f.astype(jnp.int32)
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(r0, rpl)], qbuf.at[0], sems.at[0],
        ).start()
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(r0, rpl)], qbuf.at[0], sems.at[0],
        ).wait()
        m = (un > 0.0) & (best_row == r0f)

        def res_body(j, carry):
            r, cb = carry[0], carry[1]
            acc = carry[2:]
            mm = m & (best_j == j.astype(jnp.float32))
            acc = tuple(
                jnp.where(mm, qbuf[0, r, cb + col], a)
                for col, a in zip(resolve_cols, acc))
            wrap = cb + STRIDE >= PACK * STRIDE
            r = jnp.where(wrap, r + 1, r)
            cb = jnp.where(wrap, 0, cb + STRIDE)
            return (r, cb) + acc

        out_r = jax.lax.fori_loop(
            0, tb, res_body, (jnp.int32(0), jnp.int32(0)) + attrs)
        attrs = out_r[2:]
        un = un * (1.0 - m.astype(jnp.float32))
        return (un,) + attrs

    res = jax.lax.while_loop(rcond, rbody, (found,) + init_attrs)
    return res[1:1 + n_res]


# ------------------------------------------------------- wave traversal

# wave stack bound: a wave pops WAVE entries and pushes at most 2*WAVE,
# so the not-yet-popped frontier grows by <= WAVE per wave and is
# bounded by ~WAVE * tree depth (96 at the MAX_NODES cap) plus slack
STACK_WAVE = 1024


def traverse_closest_wave(node_box, node_meta, rows_hbm, qbuf, sems,
                          n_nodes, ox, oy, oz, dx, dy, dz, maxt, act,
                          resolve_cols=(COL_FACE_ID,), rpl=RPL,
                          mxu_ctx=None, res_ctx=None, box16=False):
    """Wave-parallel packet closest-hit (round 4).

    The ordered scalar-cursor walk (traverse_closest) pays one
    vector->scalar sync per node visit — measured ~0.9 us/iteration and
    ~91% of closest-hit time (PERF.md round-4 walk anatomy).  This
    variant retires up to WAVE visits per sync:

    - pop up to WAVE stack entries (all interior nodes; leaves never
      ride the stack), slab-test all their children and issue ONE
      weighted group-mask reduce per node, back to back;
    - while those reduces land, process the PREVIOUS wave's leaf
      blocks (their DMAs have had a full wave of latency cover);
    - read the WAVE reduce scalars, push hit interior children
      (near-on-top, using the packet majority direction signs and the
      build's split-axis decode like the ordered walk), and enqueue
    hit leaf children into the other half of the double-buffered leaf
      table, starting their DMAs immediately.

    Front-to-back ordering is approximate (visits within a wave cannot
    cull each other), so a few extra nodes are visited vs the strict
    ordered walk, but each costs 1/WAVE-th of a sync.  Requires the
    MXU leaf stage; mqbuf must use the arena layout
    (mxu_scratch_shapes(rpl, wave=True)).
    Returns (found, best_t, attrs) like traverse_closest.
    """
    assert mxu_ctx is not None, "wave traversal requires the MXU leaf stage"
    shape = ox.shape
    ix, iy, iz = _inv_dir(dx, dy, dz)
    nbox = _box_decoder(box16)
    actf = act.astype(jnp.float32)
    w2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
        jnp.int32, (SUB, 1), 0).astype(jnp.float32)
    feats = _ray_features_bf16(ox, oy, oz, dx, dy, dz)
    K = leaf_batch(rpl)
    # batches processed per wave: enough to keep the arena backlog
    # bounded (<= K-1 after processing, + 2*WAVE discoveries <= ARENA)
    NPROC = 1 + (2 * WAVE - 1) // K
    mxu_dma, process_batch = _make_mxu_closest_arena(
        mxu_ctx, rpl, K, feats, act, shape)

    # packet-majority near-child signs (one reduce per axis, once per
    # traversal) — exact for octant-sorted packets, a heuristic (never
    # a correctness issue) for mixed ones
    sg = (jnp.sum(dx) >= 0.0, jnp.sum(dy) >= 0.0, jnp.sum(dz) >= 0.0)

    def walk(stack, lrow, lgm):
        rs0, _, _, _ = _node_meta4(node_meta, 0)
        root_leaf = rs0 >= 0

        @pl.when(root_leaf)
        def _():
            lrow[0] = rs0
            lgm[0] = jnp.int32(255)
            mxu_dma(rs0, 0).start()

        @pl.when(jnp.logical_not(root_leaf))
        def _():
            stack[0] = jnp.int32(0)

        z = jnp.int32(0)
        init = (jnp.where(root_leaf, 0, 1), z,
                jnp.where(root_leaf, 1, 0), z, z,
                jnp.zeros(shape), maxt, jnp.full(shape, -1.0),
                jnp.full(shape, -1.0))

        def cond(s):
            return (s[0] > 0) | (s[2] > s[1])

        def body(s):
            (sp, head, tail, n_it, n_enq,
             found, best_t, best_row, best_j) = s

            # ---- pop up to WAVE interior nodes (top of stack first)
            npop = jnp.minimum(sp, jnp.int32(WAVE))
            nodes = []
            for k in range(WAVE):
                idx = jnp.maximum(sp - 1 - k, 0)
                nodes.append(jnp.where(k < npop, stack[idx],
                                       jnp.int32(-1)))
            sp = sp - npop

            # ---- phase 1: decode children, slab-test, fold ALL
            # children's hit flags into ONE scalar.  Per-node reduces
            # do not pipeline their vector->scalar syncs (hardware:
            # 8 reduces/wave ~6.3 us/wave) and a (1, WAVE)-row
            # VMEM->SMEM DMA costs the same (small-copy latency), so
            # the hit decode is compressed to 2 bits/node: anyL/anyR
            # collapse to (1, 1) vector 0/1 flags (pure vector reduces,
            # no sync), weighted by 4^k across nodes, and ONE jnp.sum
            # pays the only unconditional sync of the wave.  Per-group
            # masks are fetched lazily in phase 3 for the ~2-3 nodes
            # per wave that discover a hit leaf child.
            infos = []
            hitbits = jnp.zeros((1, 1), jnp.float32)
            for k in range(WAVE):
                nid = jnp.maximum(nodes[k], 0)
                valid = nodes[k] >= 0
                _, _, _, r3 = _node_meta4(node_meta, nid)
                left = jnp.minimum(nid + 1, n_nodes - 1)
                right = jnp.minimum(r3 >> 3, n_nodes - 1)
                axis = r3 & 3
                flip = (r3 >> 2) & 1
                rsL = _node_rs(node_meta, left)
                rsR = _node_rs(node_meta, right)
                loL, hiL = nbox(node_box, left)
                loR, hiR = nbox(node_box, right)
                hmL, _ = _slab(loL, hiL, ox, oy, oz, ix, iy, iz, best_t)
                hmR, _ = _slab(loR, hiR, ox, oy, oz, ix, iy, iz, best_t)
                anyL = jnp.max(hmL * actf, axis=1, keepdims=True)
                anyR = jnp.max(hmR * actf, axis=1, keepdims=True)
                hL = jnp.max(anyL, axis=0, keepdims=True)    # (1,1) 0/1
                hR = jnp.max(anyR, axis=0, keepdims=True)
                # 2 bits per node: max sum_k 3*4^k (k<8) = 65535, exact
                hitbits = hitbits + (hL + 2.0 * hR) * float(4 ** k)
                infos.append((valid, left, right, axis, flip,
                              rsL, rsR, anyL, anyR))

            # ---- phase 2: intersect ready K-leaf batches while this
            # wave's reduces land (their DMAs started >= one wave ago).
            # Full batches ride ONE fori_loop (at K=1 this is exactly
            # the round-4 per-leaf loop); a partial batch runs only
            # when the node stack is empty, to keep the drain moving.
            nb = (tail - head) // K

            def bstep(i, c):
                return process_batch(head + i * K, jnp.int32(K),
                                     lrow, lgm, *c)

            found, best_t, best_row, best_j = jax.lax.fori_loop(
                0, nb, bstep, (found, best_t, best_row, best_j))
            head = head + nb * K
            rem = tail - head
            do = (npop == 0) & (rem > 0)

            def do_p(c, nv=rem, hd=head):
                return process_batch(hd, nv, lrow, lgm, *c)

            found, best_t, best_row, best_j = jax.lax.cond(
                do, do_p, lambda c: c,
                (found, best_t, best_row, best_j))
            head = head + jnp.where(do, rem, 0)

            # ---- phase 3: read hit bits, push interiors near-on-top,
            # enqueue leaves into the other buffer half (branchless
            # scalar stores; dump slot for non-events).  A node's
            # 16-bit (gmL | gmR << 8) group-mask encode is reduced
            # HERE, under lax.cond, only when one of its hit children
            # is a leaf.
            hb = jnp.sum(hitbits).astype(jnp.int32)
            n_new = jnp.int32(0)
            for k in reversed(range(WAVE)):
                (valid, left, right, axis, flip, rsL, rsR,
                 anyL, anyR) = infos[k]
                hitL = ((hb >> (2 * k)) & 1) != 0
                hitR = ((hb >> (2 * k + 1)) & 1) != 0
                need_gm = valid & (
                    (hitL & (rsL >= 0)) | (hitR & (rsR >= 0)))
                gmL, gmR = jax.lax.cond(
                    need_gm,
                    lambda aL=anyL, aR=anyR: _gm_encode2(aL, aR, w2),
                    lambda: (jnp.int32(0), jnp.int32(0)))
                # interior hit children push regardless of gm; gm>0 is
                # only consulted for leaves (where it equals hit)
                gmL = jnp.where(hitL, gmL | (rsL < 0).astype(jnp.int32),
                                0)
                gmR = jnp.where(hitR, gmR | (rsR < 0).astype(jnp.int32),
                                0)
                sga = jnp.where(axis == 0, sg[0],
                                jnp.where(axis == 1, sg[1], sg[2]))
                near_is_left = jnp.logical_xor(sga, flip == 1)
                for is_near in (False, True):     # far first, near on top
                    pick_left = (near_is_left if is_near
                                 else jnp.logical_not(near_is_left))
                    child = jnp.where(pick_left, left, right)
                    gm = jnp.where(pick_left, gmL, gmR)
                    rs_c = jnp.where(pick_left, rsL, rsR)
                    hit = valid & (gm > 0)
                    isleaf = rs_c >= 0
                    # overflow clamp: a degenerate tree violating the
                    # depth<=96 build invariant routes to the dump slot
                    # (bounded miss) instead of writing out of bounds
                    push = (hit & jnp.logical_not(isleaf)
                            & (sp < STACK_WAVE))
                    enq = hit & isleaf

                    stack[jnp.where(push, sp, STACK_WAVE)] = child
                    sp = sp + push.astype(jnp.int32)
                    lslot = jnp.where(enq, (tail + n_new) & (ARENA - 1),
                                      ARENA)
                    lrow[lslot] = rs_c
                    lgm[lslot] = gm
                    n_new = n_new + enq.astype(jnp.int32)

            def dstart(i, _):
                slot = (tail + i) & (ARENA - 1)
                mxu_dma(lrow[slot], slot).start()
                return 0

            jax.lax.fori_loop(0, n_new, dstart, 0)
            return (sp, head, tail + n_new, n_it + 1, n_enq + n_new,
                    found, best_t, best_row, best_j)

        out = jax.lax.while_loop(cond, body, init)
        if DEBUG_COUNTERS:
            return (out[5], out[3].astype(jnp.float32) + jnp.zeros(shape),
                    out[7], out[4].astype(jnp.float32) + jnp.zeros(shape))
        return out[5], out[6], out[7], out[8]

    found, best_t, best_row, best_j = pl.run_scoped(
        walk,
        pltpu.SMEM((STACK_WAVE + 1,), jnp.int32),   # +1: dump slot
        pltpu.SMEM((ARENA + 1,), jnp.int32),
        pltpu.SMEM((ARENA + 1,), jnp.int32))

    if DEBUG_COUNTERS:
        return found, best_t, tuple(best_j for _ in resolve_cols)

    attrs = _resolve_deferred(found, best_t, best_row, best_j,
                              resolve_cols, rows_hbm, qbuf, sems,
                              res_ctx, rpl, shape)
    return found, best_t, attrs


def traverse_any_wave(node_box, node_meta, rows_hbm, qbuf, sems,
                      n_nodes, ox, oy, oz, dx, dy, dz, maxt, act,
                      rpl=RPL, mxu_ctx=None, box16=False):
    """Wave-parallel packet any-hit (shadow) traversal — the
    traverse_closest_wave scheme without ordering concerns: pop up to
    WAVE nodes, one weighted group-mask reduce each, leaves into the
    K-batch arena, occluded lanes drop out of the live mask so later
    slab tests shrink; once EVERY active lane is occluded the walk
    drains and exits early (rtcOccluded semantics — a boolean query
    has nothing left to refine).  Requires the MXU leaf stage.
    Returns an f32 0/1 occluded tile."""
    assert mxu_ctx is not None, "wave traversal requires the MXU leaf stage"
    shape = ox.shape
    ix, iy, iz = _inv_dir(dx, dy, dz)
    nbox = _box_decoder(box16)
    actf = act.astype(jnp.float32)
    w2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
        jnp.int32, (SUB, 1), 0).astype(jnp.float32)
    feats = _ray_features_bf16(ox, oy, oz, dx, dy, dz)
    K = leaf_batch(rpl)
    NPROC = 1 + (2 * WAVE - 1) // K
    mxu_dma, process_batch = _make_mxu_any_arena(
        mxu_ctx, rpl, K, feats, maxt, shape)

    def walk(stack, lrow, lgm):
        rs0, _, _, _ = _node_meta4(node_meta, 0)
        root_leaf = rs0 >= 0

        @pl.when(root_leaf)
        def _():
            lrow[0] = rs0
            lgm[0] = jnp.int32(255)
            mxu_dma(rs0, 0).start()

        @pl.when(jnp.logical_not(root_leaf))
        def _():
            stack[0] = jnp.int32(0)

        z = jnp.int32(0)
        init = (jnp.where(root_leaf, 0, 1), z,
                jnp.where(root_leaf, 1, 0), jnp.zeros(shape))

        def cond(s):
            return (s[0] > 0) | (s[2] > s[1])

        def body(s):
            sp, head, tail, occ = s
            live = actf * (1.0 - occ)
            # all-occluded early exit: this (1,1) reduce issues with
            # the wave's hit-bits reduce below, so its scalar read in
            # phase 3 lands under the same latency cover
            lv = jnp.max(jnp.max(live, axis=1, keepdims=True),
                         axis=0, keepdims=True)

            npop = jnp.minimum(sp, jnp.int32(WAVE))
            nodes = []
            for k in range(WAVE):
                idx = jnp.maximum(sp - 1 - k, 0)
                nodes.append(jnp.where(k < npop, stack[idx],
                                       jnp.int32(-1)))
            sp = sp - npop

            # ONE packed hit-bits reduce for the whole wave + lazy
            # per-node group-mask reduces (see traverse_closest_wave)
            infos = []
            hitbits = jnp.zeros((1, 1), jnp.float32)
            for k in range(WAVE):
                nid = jnp.maximum(nodes[k], 0)
                valid = nodes[k] >= 0
                _, _, _, r3 = _node_meta4(node_meta, nid)
                left = jnp.minimum(nid + 1, n_nodes - 1)
                right = jnp.minimum(r3 >> 3, n_nodes - 1)
                rsL = _node_rs(node_meta, left)
                rsR = _node_rs(node_meta, right)
                loL, hiL = nbox(node_box, left)
                loR, hiR = nbox(node_box, right)
                hmL, _ = _slab(loL, hiL, ox, oy, oz, ix, iy, iz, maxt)
                hmR, _ = _slab(loR, hiR, ox, oy, oz, ix, iy, iz, maxt)
                anyL = jnp.max(hmL * live, axis=1, keepdims=True)
                anyR = jnp.max(hmR * live, axis=1, keepdims=True)
                hL = jnp.max(anyL, axis=0, keepdims=True)
                hR = jnp.max(anyR, axis=0, keepdims=True)
                hitbits = hitbits + (hL + 2.0 * hR) * float(4 ** k)
                infos.append((valid, left, right, rsL, rsR, anyL, anyR))

            # phase 2: batched leaf intersection (see closest walk)
            nb = (tail - head) // K

            def bstep(i, o):
                return process_batch(head + i * K, jnp.int32(K),
                                     lrow, lgm, o)

            occ = jax.lax.fori_loop(0, nb, bstep, occ)
            head = head + nb * K
            rem = tail - head
            do = (npop == 0) & (rem > 0)

            def do_p(o, nv=rem, hd=head):
                return process_batch(hd, nv, lrow, lgm, o)

            occ = jax.lax.cond(do, do_p, lambda o: o, occ)
            head = head + jnp.where(do, rem, 0)

            hb = jnp.sum(hitbits).astype(jnp.int32)
            alldead = jnp.sum(lv) == 0.0
            n_new = jnp.int32(0)
            for k in range(WAVE):
                valid, left, right, rsL, rsR, anyL, anyR = infos[k]
                hitL = ((hb >> (2 * k)) & 1) != 0
                hitR = ((hb >> (2 * k + 1)) & 1) != 0
                need_gm = valid & (
                    (hitL & (rsL >= 0)) | (hitR & (rsR >= 0)))
                bL, bR = jax.lax.cond(
                    need_gm,
                    lambda aL=anyL, aR=anyR: _gm_encode2(aL, aR, w2),
                    lambda: (jnp.int32(0), jnp.int32(0)))
                gmL = jnp.where(
                    hitL, bL | (rsL < 0).astype(jnp.int32), 0)
                gmR = jnp.where(
                    hitR, bR | (rsR < 0).astype(jnp.int32),
                    0)
                for child, gm, rs_c in ((left, gmL, rsL),
                                        (right, gmR, rsR)):
                    hit = valid & (gm > 0)
                    isleaf = rs_c >= 0
                    push = (hit & jnp.logical_not(isleaf)
                            & (sp < STACK_WAVE))
                    enq = hit & isleaf

                    # branchless routing (see traverse_closest_wave)
                    stack[jnp.where(push, sp, STACK_WAVE)] = child
                    sp = sp + push.astype(jnp.int32)
                    lslot = jnp.where(enq, (tail + n_new) & (ARENA - 1),
                                      ARENA)
                    lrow[lslot] = rs_c
                    lgm[lslot] = gm
                    n_new = n_new + enq.astype(jnp.int32)

            def dstart(i, _):
                slot = (tail + i) & (ARENA - 1)
                mxu_dma(lrow[slot], slot).start()
                return 0

            jax.lax.fori_loop(0, n_new, dstart, 0)
            tail = tail + n_new

            # every active lane occluded: abandon the node stack and
            # drain the pending leaf DMAs (their results are moot, but
            # the semaphores must be consumed before the kernel ends)
            def drain(_i, hd):
                slot = hd & (ARENA - 1)
                mxu_dma(lrow[slot], slot).wait()
                return hd + 1

            head = jax.lax.cond(
                alldead,
                lambda h: jax.lax.fori_loop(0, tail - h, drain, h),
                lambda h: h, head)
            sp = jnp.where(alldead, 0, sp)
            return sp, head, tail, occ

        return jax.lax.while_loop(cond, body, init)[3]

    occ = pl.run_scoped(
        walk,
        pltpu.SMEM((STACK_WAVE + 1,), jnp.int32),   # +1: dump slot
        pltpu.SMEM((ARENA + 1,), jnp.int32),
        pltpu.SMEM((ARENA + 1,), jnp.int32))
    return occ * actf


def traverse_any(node_box, node_meta, rows_hbm, qbuf, sems,
                 n_nodes, ox, oy, oz, dx, dy, dz, maxt, act,
                 rpl=RPL, batch=BATCH, mxu_ctx=None, box16=False):
    """Packet any-hit (shadow) traversal.  Returns f32 0/1 occluded tile.
    Occluded lanes drop out of the live mask, shrinking later node visits
    (scene.cpp:203 ray_test).  Node visits are batched like
    traverse_closest.  ``mxu_ctx`` switches the leaf stage to the
    group-masked dot_general form (see traverse_closest)."""
    shape = ox.shape
    ix, iy, iz = _inv_dir(dx, dy, dz)
    nbox = _box_decoder(box16)
    actf = act.astype(jnp.float32)

    mxu = mxu_ctx is not None
    if mxu:
        w2 = jnp.float32(2.0) ** jax.lax.broadcasted_iota(
            jnp.int32, (SUB, 1), 0).astype(jnp.float32)
        feats = _ray_features_bf16(ox, oy, oz, dx, dy, dz)
        mxu_dma, process_mxu = _make_mxu_any(
            mxu_ctx, rpl, feats, maxt, shape)

    def process(row_start, cnt, slot, occ):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(row_start, rpl)],
            qbuf.at[slot], sems.at[slot],
        ).wait()

        def tri_body(j, carry):
            occ, r, cb = carry
            c = lambda k: qbuf[slot, r, cb + k]
            hit, _ = _leaf_tri_test(c, ox, oy, oz, dx, dy, dz, maxt)
            occ = jnp.maximum(occ, hit.astype(jnp.float32))
            wrap = cb + STRIDE >= PACK * STRIDE
            r = jnp.where(wrap, r + 1, r)
            cb = jnp.where(wrap, 0, cb + STRIDE)
            return occ, r, cb

        return jax.lax.fori_loop(
            0, cnt, tri_body, (occ, jnp.int32(0), jnp.int32(0)))[0]

    NQ = (3 if mxu else 2) * QUEUE

    def cond(s):
        cursor, head, tail = s[0], s[1], s[2]
        return (cursor >= 0) | (tail > head)

    def body(s):
        cursor, head, tail = s[0], s[1], s[2]
        rows_ring = s[3:3 + QUEUE]
        cnts_ring = s[3 + QUEUE:3 + 2 * QUEUE]
        masks_ring = s[3 + 2 * QUEUE:3 + NQ]
        occ = s[3 + NQ]

        nid0 = jnp.maximum(cursor, 0)
        is_node = cursor >= 0
        live = actf * (1.0 - occ)
        hits, rows_b, cnts_b, miss_b, gm_b = [], [], [], [], []
        for k in range(batch):
            nid = nid0 if k == 0 else jnp.minimum(nid0 + k, n_nodes - 1)
            lo, hi = nbox(node_box, nid)
            hm = _slab(lo, hi, ox, oy, oz, ix, iy, iz, maxt)[0] * live
            if mxu:
                bits = jnp.sum(
                    jnp.max(hm, axis=1, keepdims=True) * w2).astype(
                    jnp.int32)
                hits.append(bits > 0)
                gm_b.append(bits)
            else:
                hits.append(jnp.max(hm) > 0.0)
            rs, ct, ms = _node_meta(node_meta, nid)
            rows_b.append(rs)
            cnts_b.append(ct)
            miss_b.append(ms)

        run = is_node
        nxt = cursor
        enqueue = is_node & (nid0 < 0)          # traced False
        row_start = jnp.int32(0)
        cnt = jnp.int32(0)
        gm = jnp.int32(0)
        for k in range(batch):
            leaf_k = rows_b[k] >= 0
            stop = run & (~hits[k] | leaf_k)
            enq_k = run & hits[k] & leaf_k
            enqueue = enqueue | enq_k
            row_start = jnp.where(enq_k, rows_b[k], row_start)
            cnt = jnp.where(enq_k, cnts_b[k], cnt)
            if mxu:
                gm = jnp.where(enq_k, gm_b[k], gm)
            nxt = jnp.where(stop, miss_b[k], nxt)
            run = run & hits[k] & ~leaf_k
        nxt = jnp.where(run, nid0 + batch, nxt)

        full = (tail - head) >= QUEUE
        do_process = (enqueue & full) | (~is_node & (tail > head))
        p_row = _ring_get(rows_ring, head)
        p_cnt = (_ring_get(masks_ring, head) if mxu
                 else _ring_get(cnts_ring, head))
        p_slot = head & (QUEUE - 1)
        proc = process_mxu if mxu else process
        occ = jax.lax.cond(
            do_process,
            lambda o: proc(p_row, p_cnt, p_slot, o),
            lambda o: o, occ)
        head = head + do_process.astype(jnp.int32)

        new_slot = tail & (QUEUE - 1)

        @pl.when(enqueue)
        def _():
            if mxu:
                mxu_dma(row_start, new_slot).start()
            else:
                pltpu.make_async_copy(
                    rows_hbm.at[pl.ds(row_start, rpl)],
                    qbuf.at[new_slot], sems.at[new_slot],
                ).start()

        rows_ring = tuple(
            jnp.where(enqueue & (new_slot == k), row_start, v)
            for k, v in enumerate(rows_ring))
        cnts_ring = tuple(
            jnp.where(enqueue & (new_slot == k), cnt, v)
            for k, v in enumerate(cnts_ring))
        if mxu:
            masks_ring = tuple(
                jnp.where(enqueue & (new_slot == k), gm, v)
                for k, v in enumerate(masks_ring))
        tail = tail + enqueue.astype(jnp.int32)
        return (nxt, head, tail) + rows_ring + cnts_ring \
            + (masks_ring if mxu else ()) + (occ,)

    z = jnp.int32(0)
    occ = jax.lax.while_loop(
        cond, body, (z, z, z) + (z,) * NQ + (jnp.zeros(shape),))[3 + NQ]
    return occ * actf


# ------------------------------------------------------ standalone calls

def _tile(x, n_pad, rows, fill=0.0):
    return jnp.pad(x, (0, n_pad - x.shape[0]),
                   constant_values=fill).reshape(rows, LANES)


@partial(jax.jit,
         static_argnames=("n_nodes", "interpret", "rpl", "batch",
                          "wave", "box16"))
def packet_closest_hit(node_box, node_meta, rows_hbm,
                       o, d, maxt, active, n_nodes: int,
                       interpret: bool = False,
                       rpl: int = RPL, batch: int = BATCH,
                       mxu_rows=None, res_rows=None,
                       wave: bool = None, box16: bool = False):
    """Standalone closest-hit wavefront query: (N,3) rays -> (t (N,),
    prim (N,) i32).  Misses return t = inf (scene.cpp:181).
    ``mxu_rows`` (pack_mxu_rows output) switches the leaf stage to the
    MXU dot_general form; ``res_rows`` (pack_resolve_rows output)
    switches the face-id resolve to the one-hot matmul form; ``wave``
    (default: USE_WAVE when the MXU stage is on) selects the
    wave-parallel walk (traverse_closest_wave)."""
    n = o.shape[0]
    n_pad = -(-n // R_TILE) * R_TILE
    rows = n_pad // LANES
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    maxt_t = jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), (n,))
    mxu = mxu_rows is not None
    res = res_rows is not None
    if wave is None:
        wave = USE_WAVE and mxu
    wave = wave and mxu

    def kernel(box_ref, meta_ref, rows_ref, *args):
        if mxu:
            mxu_ref = args[0]
            args = args[1:]
        if res:
            res_ref = args[0]
            args = args[1:]
        (ox, oy, oz, dx, dy, dz, mt, act, t_ref, fid_ref,
         qbuf, sems) = args[:12]
        args = args[12:]
        mctx = rctx = None
        if mxu:
            mctx = (mxu_ref, args[0], args[1])
            args = args[2:]
        if res:
            rctx = (res_ref, args[0], args[1])
        if wave:
            found, best_t, (fid,) = traverse_closest_wave(
                box_ref, meta_ref, rows_ref, qbuf, sems, n_nodes,
                ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], mt[:],
                act[:] > 0.5, rpl=rpl, mxu_ctx=mctx, res_ctx=rctx,
                box16=box16)
        else:
            found, best_t, (fid,) = traverse_closest(
                box_ref, meta_ref, rows_ref, qbuf, sems, n_nodes,
                ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], mt[:],
                act[:] > 0.5, rpl=rpl, batch=batch, mxu_ctx=mctx,
                res_ctx=rctx, box16=box16)
        if DEBUG_COUNTERS:
            t_ref[:] = best_t      # walk iterations (per-packet)
            fid_ref[:] = fid       # leaf enqueues (per-packet)
        else:
            t_ref[:] = jnp.where(found > 0.0, best_t, jnp.inf)
            fid_ref[:] = fid

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
    if mxu:
        scratch += mxu_scratch_shapes(rpl, wave)
        extra_in += [pl.BlockSpec(memory_space=pl.ANY)]
    if res:
        scratch += [pltpu.VMEM((2 * RES_COLS, res_width(rpl)),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
        extra_in += [pl.BlockSpec(memory_space=pl.ANY)]
    t, fid = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + extra_in + [ray_spec] * 8,
        out_specs=[ray_spec] * 2,
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.float32)] * 2,
        scratch_shapes=scratch,
        interpret=interpret,
    )(node_box, node_meta, rows_hbm,
      *([mxu_rows] if mxu else []),
      *([res_rows] if res else []),
      _tile(o[:, 0], n_pad, rows), _tile(o[:, 1], n_pad, rows),
      _tile(o[:, 2], n_pad, rows),
      _tile(d[:, 0], n_pad, rows), _tile(d[:, 1], n_pad, rows),
      _tile(d[:, 2], n_pad, rows, fill=1.0),
      _tile(maxt_t, n_pad, rows),
      _tile(active.astype(jnp.float32), n_pad, rows))
    flat = lambda x: x.reshape(n_pad)[:n]
    return flat(t), flat(fid).astype(jnp.int32)


@partial(jax.jit,
         static_argnames=("n_nodes", "interpret", "rpl", "batch",
                          "wave", "box16"))
def packet_any_hit(node_box, node_meta, rows_hbm,
                   o, d, maxt, active, n_nodes: int,
                   interpret: bool = False,
                   rpl: int = RPL, batch: int = BATCH,
                   mxu_rows=None, wave: bool = None,
                   box16: bool = False):
    """Standalone any-hit query -> occluded (N,) bool (scene.cpp:203)."""
    n = o.shape[0]
    n_pad = -(-n // R_TILE) * R_TILE
    rows = n_pad // LANES
    grid = (rows // SUB,)
    ray_spec = pl.BlockSpec((SUB, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    maxt_t = jnp.broadcast_to(jnp.asarray(maxt, jnp.float32), (n,))
    mxu = mxu_rows is not None
    if wave is None:
        wave = USE_WAVE and mxu
    wave = wave and mxu

    def kernel(box_ref, meta_ref, rows_ref, *args):
        if mxu:
            mxu_ref = args[0]
            args = args[1:]
        (ox, oy, oz, dx, dy, dz, mt, act, occ_ref,
         qbuf, sems) = args[:11]
        mctx = None
        if mxu:
            mctx = (mxu_ref, args[11], args[12])
        if wave:
            occ_ref[:] = traverse_any_wave(
                box_ref, meta_ref, rows_ref, qbuf, sems, n_nodes,
                ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], mt[:],
                act[:] > 0.5, rpl=rpl, mxu_ctx=mctx, box16=box16)
        else:
            occ_ref[:] = traverse_any(
                box_ref, meta_ref, rows_ref, qbuf, sems, n_nodes,
                ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], mt[:],
                act[:] > 0.5, rpl=rpl, batch=batch, mxu_ctx=mctx,
                box16=box16)

    # in MXU mode the any-hit leaf stage reads mqbuf only — the SMEM
    # leaf-row queue is dead code; shrink it so large-leaf configs
    # (rpl=64 for multi-million-triangle scenes) fit the SMEM budget
    qrpl = 1 if mxu else rpl
    scratch = [
        pltpu.SMEM((QUEUE, qrpl, 128), jnp.float32),
        pltpu.SemaphoreType.DMA((QUEUE,)),
    ]
    extra_in = []
    if mxu:
        scratch += mxu_scratch_shapes(rpl, wave)
        extra_in = [pl.BlockSpec(memory_space=pl.ANY)]
    occ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ] + extra_in + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(node_box, node_meta, rows_hbm,
      *([mxu_rows] if mxu else []),
      _tile(o[:, 0], n_pad, rows), _tile(o[:, 1], n_pad, rows),
      _tile(o[:, 2], n_pad, rows),
      _tile(d[:, 0], n_pad, rows), _tile(d[:, 1], n_pad, rows),
      _tile(d[:, 2], n_pad, rows, fill=1.0),
      _tile(maxt_t, n_pad, rows),
      _tile(active.astype(jnp.float32), n_pad, rows))
    return occ.reshape(n_pad)[:n] > 0.5

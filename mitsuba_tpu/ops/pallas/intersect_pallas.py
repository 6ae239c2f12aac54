"""Pallas TPU kernel: brute-force ray-triangle closest-hit.

The renderer's #1 hot op (SURVEY §7 'BVH traversal ... is the #1 hard
kernel').  The pure-JAX `ops.intersect.intersect_brute` materializes
(N, T)-shaped intermediates in HBM for every one of ~15 Moller-Trumbore
subexpressions; this kernel keeps the whole test in VMEM:

- grid over ray tiles of R_TILE rays (sublane axis, components as
  (R_TILE, 1) blocks);
- the packed triangle table (9, F_pad) lives fully in VMEM; an inner
  fori_loop sweeps 128-triangle lane-blocks, broadcasting (R_TILE, 1) ray
  components against (1, 128) triangle rows -> (R_TILE, 128) VPU tiles;
- per block, the running closest hit (t, prim, u, v) is reduced over the
  lane axis and carried as (R_TILE, 1) state;
- padded triangles have e1 = e2 = 0 -> det = 0 -> never hit, so the loop
  bound is the static padded count with no masking.

All intermediates stay in VMEM; HBM traffic is O(N + F) instead of the
unfused path's O(N*F) per subexpression.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_TILE = 256     # rays per grid step (sublane axis)
T_BLOCK = 128    # triangles per inner step (lane axis)
DET_EPS = 1e-9


def pack_triangles(vertices, faces):
    """(V,3), (F,3) -> (9, F_pad) packed rows [p0(3), e1(3), e2(3)]."""
    tri = vertices[faces]                    # (F, 3, 3)
    p0 = tri[:, 0]
    e1 = tri[:, 1] - p0
    e2 = tri[:, 2] - p0
    f = faces.shape[0]
    f_pad = -(-f // T_BLOCK) * T_BLOCK
    data = jnp.zeros((9, f_pad), jnp.float32)
    data = data.at[0:3, :f].set(p0.T)
    data = data.at[3:6, :f].set(e1.T)
    data = data.at[6:9, :f].set(e2.T)
    return data


def _kernel(tris_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
            mt_ref, t_ref, prim_ref, u_ref, v_ref, *, n_blocks):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]      # (R_TILE, 1)
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    maxt = mt_ref[:]
    inf = jnp.float32(jnp.inf)

    lane = jax.lax.broadcasted_iota(jnp.int32, (R_TILE, T_BLOCK), 1)

    def body(jb, carry):
        bt, bp, bu, bv = carry                        # each (R_TILE, 1)
        col = pl.multiple_of(jb * T_BLOCK, T_BLOCK)
        sl = pl.ds(col, T_BLOCK)
        p0x = tris_ref[0:1, sl]                       # (1, T_BLOCK)
        p0y = tris_ref[1:2, sl]
        p0z = tris_ref[2:3, sl]
        e1x = tris_ref[3:4, sl]
        e1y = tris_ref[4:5, sl]
        e1z = tris_ref[5:6, sl]
        e2x = tris_ref[6:7, sl]
        e2y = tris_ref[7:8, sl]
        e2z = tris_ref[8:9, sl]

        # Moller-Trumbore on the (R_TILE, T_BLOCK) tile
        pvx = dy * e2z - dz * e2y
        pvy = dz * e2x - dx * e2z
        pvz = dx * e2y - dy * e2x
        det = e1x * pvx + e1y * pvy + e1z * pvz
        ok_det = jnp.abs(det) > DET_EPS
        inv = 1.0 / jnp.where(ok_det, det, 1.0)
        tvx = ox - p0x
        tvy = oy - p0y
        tvz = oz - p0z
        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
        qvx = tvy * e1z - tvz * e1y
        qvy = tvz * e1x - tvx * e1z
        qvz = tvx * e1y - tvy * e1x
        v = (dx * qvx + dy * qvy + dz * qvz) * inv
        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
        hit = (
            ok_det & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t > 0.0) & (t <= maxt)
        )
        tf = jnp.where(hit, t, inf)
        tmin = jnp.min(tf, axis=1, keepdims=True)     # (R_TILE, 1)
        better = tmin < bt
        # winning lane: largest index among the min-t hits (deterministic)
        pick = hit & (tf == tmin)
        gidx = lane + col
        prim_new = jnp.max(jnp.where(pick, gidx, -1), axis=1, keepdims=True)
        win = pick & (gidx == prim_new)
        u_new = jnp.sum(jnp.where(win, u, 0.0), axis=1, keepdims=True)
        v_new = jnp.sum(jnp.where(win, v, 0.0), axis=1, keepdims=True)
        bt = jnp.where(better, tmin, bt)
        bp = jnp.where(better, prim_new, bp)
        bu = jnp.where(better, u_new, bu)
        bv = jnp.where(better, v_new, bv)
        return bt, bp, bu, bv

    shape = (R_TILE, 1)
    init = (
        jnp.full(shape, jnp.inf, jnp.float32),
        jnp.full(shape, -1, jnp.int32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    bt, bp, bu, bv = jax.lax.fori_loop(0, n_blocks, body, init)
    t_ref[:] = bt
    prim_ref[:] = bp
    u_ref[:] = bu
    v_ref[:] = bv


@partial(jax.jit, static_argnames=("interpret",))
def intersect_packed(tris, o, d, maxt, interpret: bool = False):
    """Closest-hit over packed triangles.

    tris: (9, F_pad) from pack_triangles; o, d: (N, 3); maxt: (N,).
    Returns (t, prim, u, v) with t = inf on miss; N padded internally.
    """
    n = o.shape[0]
    n_pad = -(-n // R_TILE) * R_TILE
    pad = n_pad - n

    def comp(x, fill=0.0):
        return jnp.pad(x, (0, pad), constant_values=fill)[:, None]

    args = [
        comp(o[:, 0]), comp(o[:, 1]), comp(o[:, 2]),
        comp(d[:, 0]), comp(d[:, 1]), comp(d[:, 2]),
        comp(maxt, fill=-1.0),  # padded lanes can never hit
    ]

    grid = (n_pad // R_TILE,)
    ray_spec = pl.BlockSpec((R_TILE, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
    ]
    f_pad = int(tris.shape[1])
    t, prim, u, v = pl.pallas_call(
        partial(_kernel, n_blocks=f_pad // T_BLOCK),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [ray_spec] * 7,
        out_specs=[ray_spec] * 4,
        out_shape=out_shape,
        interpret=interpret,
    )(tris, *args)

    flat = lambda x: x[:n, 0]
    return flat(t), flat(prim), flat(u), flat(v)

"""Refined microbenchmarks: isolate compute / DMA / node-fetch costs.

v2 of ubench_mxu_leaf: no integer modulo on the scalar core, a no-DMA
leaf-compute variant, a double-buffered DMA variant, and split node-walk
variants (fetch-only vs slab+sync-only).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TL = 64
CT = 6 * TL
N_ITERS = 1024


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def leaf_compute_only():
    """Matmul + epilogue + reduce, block resident in VMEM (no DMA)."""

    def kernel(block, raysT, out_ref):
        sub = jax.lax.broadcasted_iota(jnp.int32, (TL, 128), 0)

        def body(i, carry):
            best, bj = carry
            s = i & 7
            rays = raysT[pl.ds(s * 8, 8), :]
            out = jax.lax.dot_general(
                block[:], rays,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            num = out[0 * TL:1 * TL]
            den = out[1 * TL:2 * TL]
            u0 = out[2 * TL:3 * TL]
            ud = out[3 * TL:4 * TL]
            v0 = out[4 * TL:5 * TL]
            vd = out[5 * TL:6 * TL]
            ok = jnp.abs(den) > 1e-12
            t = -num * pl.reciprocal(jnp.where(ok, den, 1.0))
            u = u0 + t * ud
            v = v0 + t * vd
            hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-4)
            key = jnp.where(
                hit,
                (pltpu.bitcast(t, jnp.int32) & jnp.int32(~63)) | sub,
                jnp.int32(0x7F000000))
            kmin = jnp.min(key, axis=0, keepdims=True)
            sel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == s
            t_leaf = pltpu.bitcast(kmin & jnp.int32(~63), jnp.float32)
            j_leaf = (kmin & 63).astype(jnp.float32)
            imp = sel & (jnp.broadcast_to(t_leaf, (8, 128)) < best)
            best = jnp.where(imp, jnp.broadcast_to(t_leaf, (8, 128)), best)
            bj = jnp.where(imp, jnp.broadcast_to(j_leaf, (8, 128)), bj)
            return best, bj

        best, bj = jax.lax.fori_loop(
            0, N_ITERS, body,
            (jnp.full((8, 128), 1e30), jnp.zeros((8, 128))))
        out_ref[:] = best + bj * 1e-7

    rng = np.random.default_rng(0)
    block = jnp.asarray(rng.normal(size=(8, CT)).astype(np.float32))
    raysT = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )
    return jax.jit(lambda a, b: f(a, b)), block, raysT


def leaf_dma_ring():
    """Double-buffered leaf DMA + compute: start next copy before
    processing current (the real kernel's QUEUE pattern)."""

    def kernel(rows_hbm, raysT, out_ref, qbuf, sems):
        sub = jax.lax.broadcasted_iota(jnp.int32, (TL, 128), 0)
        n_blocks = rows_hbm.shape[0] // 8

        def dma(slot, i):
            row = pl.multiple_of(((i * 3) & (n_blocks - 1)) * 8, 8)
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(row, 8)], qbuf.at[slot], sems.at[slot])

        dma(0, 0).start()
        dma(1, 1).start()

        def body(i, carry):
            best, bj = carry
            slot = i & 1
            dma(slot, i).wait()
            s = i & 7
            rays = raysT[pl.ds(s * 8, 8), :]
            out = jax.lax.dot_general(
                qbuf[slot], rays,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            @pl.when(i + 2 < N_ITERS)
            def _():
                dma(slot, i + 2).start()

            num = out[0 * TL:1 * TL]
            den = out[1 * TL:2 * TL]
            u0 = out[2 * TL:3 * TL]
            ud = out[3 * TL:4 * TL]
            v0 = out[4 * TL:5 * TL]
            vd = out[5 * TL:6 * TL]
            ok = jnp.abs(den) > 1e-12
            t = -num * pl.reciprocal(jnp.where(ok, den, 1.0))
            u = u0 + t * ud
            v = v0 + t * vd
            hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-4)
            key = jnp.where(
                hit,
                (pltpu.bitcast(t, jnp.int32) & jnp.int32(~63)) | sub,
                jnp.int32(0x7F000000))
            kmin = jnp.min(key, axis=0, keepdims=True)
            sel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == s
            t_leaf = pltpu.bitcast(kmin & jnp.int32(~63), jnp.float32)
            j_leaf = (kmin & 63).astype(jnp.float32)
            imp = sel & (jnp.broadcast_to(t_leaf, (8, 128)) < best)
            best = jnp.where(imp, jnp.broadcast_to(t_leaf, (8, 128)), best)
            bj = jnp.where(imp, jnp.broadcast_to(j_leaf, (8, 128)), bj)
            return best, bj

        best, bj = jax.lax.fori_loop(
            0, N_ITERS, body,
            (jnp.full((8, 128), 1e30), jnp.zeros((8, 128))))
        out_ref[:] = best + bj * 1e-7

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(1024, CT)).astype(np.float32))
    raysT = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 8, CT), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return jax.jit(lambda a, b: f(a, b)), rows, raysT


def node_fetch_only():
    """8 dynamic VMEM row fetches into (8,8) scratch per iteration."""

    def kernel(node_vmem, out_ref, nb):
        def body(i, cur0):
            for s in range(8):
                nid = (cur0 + s * 37 + i * 13) & 4095
                nb[pl.ds(s, 1), :] = node_vmem[pl.ds(nid, 1), :]
            return cur0 + nb[0, 0].astype(jnp.int32) + 1

        cur = jax.lax.fori_loop(0, N_ITERS, body, jnp.int32(0))
        out_ref[:] = jnp.full((8, 128), cur.astype(jnp.float32))

    node_vmem = jnp.asarray(
        np.random.default_rng(2).normal(size=(4096, 8)).astype(np.float32))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 8), jnp.float32)],
    )
    return jax.jit(lambda nv: f(nv)), node_vmem


def node_slab_sync_only():
    """Slab tests + encoded sync + scalar decode; bounds from a static
    scratch (no dynamic fetch)."""

    def kernel(node_vmem, ox_r, oy_r, oz_r, out_ref, nb):
        ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
        w4 = jnp.float32(4.0) ** jax.lax.broadcasted_iota(
            jnp.int32, (8, 1), 0).astype(jnp.float32)
        nb[:, :] = node_vmem[0:8, :]

        def body(i, carry):
            acc, cur0 = carry
            b = nb[:] + acc * 1e-30
            tx0 = (b[:, 0:1] - ox) * oz
            tx1 = (b[:, 3:4] - ox) * oz
            ty0 = (b[:, 1:2] - oy) * oz
            ty1 = (b[:, 4:5] - oy) * oz
            tn = jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1))
            tf = jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1))
            hl = (tn <= tf).astype(jnp.float32)
            tz0 = (b[:, 2:3] - oz) * ox
            tn2 = jnp.maximum(tn, jnp.minimum(tz0, tx0))
            hr = (tn2 <= tf).astype(jnp.float32)
            anyl = jnp.max(hl, axis=1, keepdims=True)
            anyr = jnp.max(hr, axis=1, keepdims=True)
            bits = jnp.sum((anyl + 2.0 * anyr) * w4)
            bi = bits.astype(jnp.int32)
            nxt = jnp.int32(0)
            for s in range(8):
                c2 = (bi >> (2 * s)) & 3
                nxt = nxt + c2
            return acc + bits * 1e-9, cur0 + nxt + 1

        acc, cur = jax.lax.fori_loop(0, N_ITERS, body,
                                     (jnp.float32(0.0), jnp.int32(0)))
        out_ref[:] = jnp.full((8, 128), acc + cur.astype(jnp.float32))

    node_vmem = jnp.asarray(
        np.random.default_rng(2).normal(size=(4096, 8)).astype(np.float32))
    rng = np.random.default_rng(3)
    ox, oy, oz = (jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
                  for _ in range(3))
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 8), jnp.float32)],
    )
    return jax.jit(lambda nv, a, b, c: f(nv, a, b, c)), node_vmem, ox, oy, oz


def main():
    print("backend:", jax.default_backend(), " iters:", N_ITERS)

    fn, block, raysT = leaf_compute_only()
    dt, out = timed(fn, block, raysT)
    print(f"leaf compute only : {dt/N_ITERS*1e9:8.1f} ns/leaf "
          f"({TL*128*N_ITERS/dt/1e9:6.2f} Gpairs/s) chk={float(out[0,0]):.3g}")

    fn, rows, raysT = leaf_dma_ring()
    dt, out = timed(fn, rows, raysT)
    print(f"leaf DMA ring     : {dt/N_ITERS*1e9:8.1f} ns/leaf "
          f"({TL*128*N_ITERS/dt/1e9:6.2f} Gpairs/s) chk={float(out[0,0]):.3g}")

    fn, nv = node_fetch_only()
    dt, out = timed(fn, nv)
    print(f"node fetch only   : {dt/N_ITERS*1e9:8.1f} ns/iter (8 rows)")

    fn, nv, ox, oy, oz = node_slab_sync_only()
    dt, out = timed(fn, nv, ox, oy, oz)
    print(f"node slab+sync    : {dt/N_ITERS*1e9:8.1f} ns/iter (8 pkts x 2)")


if __name__ == "__main__":
    main()

"""Microbenchmarks for the subpacket-MXU traversal design (round 3).

Validates, on real hardware, each Mosaic primitive the planned kernel
needs, then times a mock leaf-process loop to estimate ns/leaf:

  a. dot_general contracting dim0 x dim0: (8,6T)x(8,128) -> (6T,128)
  b. dynamic-slice row fetch from a VMEM node table into (8,8) scratch
  c. epilogue ops on (T,128) + packed-key min reduce over sublanes
  d. bit-encoded vector->scalar sync (one reduce decodes 8 packet bits)
  e. dynamic slice raysT[pl.ds(s*8,8),:] for a traced packet id
  f. HBM->VMEM DMA of an (8, 6T) leaf block

Run: python examples/ubench_mxu_leaf.py
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

TL = 64          # triangles per leaf
CT = 6 * TL      # rhs columns (num, den, u0, ud, v0, vd)


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


# --------------------------------------------------------- a+c+f combined
def mock_leaf_loop(n_iters: int):
    """One kernel: n_iters leaf visits = DMA (8,CT) from HBM + matmul +
    epilogue + packed-key reduce + best update.  Measures ns/leaf."""

    def kernel(rows_hbm, raysT, out_ref, qbuf, sem):
        sub = jax.lax.broadcasted_iota(jnp.int32, (TL, 128), 0)

        def body(i, carry):
            best, bj = carry
            row = pl.multiple_of((i % (rows_hbm.shape[0] // 8)) * 8, 8)
            cp = pltpu.make_async_copy(
                rows_hbm.at[pl.ds(row, 8)], qbuf, sem)
            cp.start()
            cp.wait()
            s = i % 8
            rays = raysT[pl.ds(s * 8, 8), :]          # (8,128)
            out = jax.lax.dot_general(
                qbuf[:], rays,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (CT,128)
            num = out[0 * TL:1 * TL]
            den = out[1 * TL:2 * TL]
            u0 = out[2 * TL:3 * TL]
            ud = out[3 * TL:4 * TL]
            v0 = out[4 * TL:5 * TL]
            vd = out[5 * TL:6 * TL]
            ok = jnp.abs(den) > 1e-12
            t = -num * pl.reciprocal(jnp.where(ok, den, 1.0), approx=False)
            u = u0 + t * ud
            v = v0 + t * vd
            hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 1e-4)
            # packed key: t bits (monotonic for positive f32) | tri index
            key = jnp.where(
                hit,
                (pltpu.bitcast(t, jnp.int32) & jnp.int32(~63)) | sub,
                jnp.int32(0x7F000000))
            kmin = jnp.min(key, axis=0, keepdims=True)        # (1,128)
            # update best for packet s (sublane-masked)
            sel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) == s
            t_leaf = pltpu.bitcast(kmin & jnp.int32(~63), jnp.float32)
            j_leaf = (kmin & 63).astype(jnp.float32)
            imp = sel & (jnp.broadcast_to(t_leaf, (8, 128)) < best)
            best = jnp.where(imp, jnp.broadcast_to(t_leaf, (8, 128)), best)
            bj = jnp.where(imp, jnp.broadcast_to(j_leaf, (8, 128)), bj)
            return best, bj

        best, bj = jax.lax.fori_loop(
            0, n_iters, body,
            (jnp.full((8, 128), jnp.inf), jnp.zeros((8, 128))))
        out_ref[:] = best + bj * 1e-7

    rows = jnp.asarray(
        np.random.default_rng(0).normal(size=(1024, CT)).astype(np.float32))
    raysT = jnp.asarray(
        np.random.default_rng(1).normal(size=(64, 128)).astype(np.float32))

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, CT), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    return jax.jit(lambda a, b: f(a, b)), rows, raysT


# ----------------------------------------------------------- b+d combined
def mock_node_loop(n_iters: int):
    """Walk-iteration primitives: 8 dynamic-row fetches into (8,8)
    scratch, two slab tests on (8,128), one encoded sync + scalar
    decode of 16 bits.  Measures ns per walk iteration (8 packets)."""

    def kernel(node_vmem, ox_r, oy_r, oz_r, out_ref, nb):
        ox, oy, oz = ox_r[:], oy_r[:], oz_r[:]
        w4 = jnp.float32(4.0) ** jax.lax.broadcasted_iota(
            jnp.int32, (8, 1), 0).astype(jnp.float32)

        def body(i, carry):
            acc, cur0 = carry
            # 8 dynamic row fetches (simulating per-packet node ids)
            for s in range(8):
                nid = (cur0 + s * 37 + i * 13) % (node_vmem.shape[0] - 1)
                nb[pl.ds(s, 1), :] = node_vmem[pl.ds(nid, 1), :]
            b = nb[:]
            # two slab-ish tests against ray tiles, bounds as (8,1) cols
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
            anyl = jnp.max(hl, axis=1, keepdims=True)   # (8,1)
            anyr = jnp.max(hr, axis=1, keepdims=True)
            bits = jnp.sum((anyl + 2.0 * anyr) * w4)    # scalar, base-4
            bi = bits.astype(jnp.int32)
            # scalar decode of all 16 bits -> next cursor mix
            nxt = jnp.int32(0)
            for s in range(8):
                c2 = (bi >> (2 * s)) & 3
                nxt = nxt + c2
            return acc + bits * 1e-9, cur0 + nxt + 1

        acc, _ = jax.lax.fori_loop(0, n_iters, body,
                                   (jnp.float32(0.0), jnp.int32(0)))
        out_ref[:] = jnp.full((8, 128), acc)

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
    print("backend:", jax.default_backend())

    for n in (64, 512):
        fn, rows, raysT = mock_leaf_loop(n)
        dt, out = timed(fn, rows, raysT)
        print(f"leaf loop n={n}: {dt*1e6:9.1f} us total, "
              f"{dt/n*1e9:8.1f} ns/leaf ({TL}x128 pairs) "
              f"-> {TL*128*n/dt/1e9:6.2f} Gpairs/s  sum={float(out.sum()):.3f}")

    for n in (256, 2048):
        fn, nv, ox, oy, oz = mock_node_loop(n)
        dt, out = timed(fn, nv, ox, oy, oz)
        print(f"node loop n={n}: {dt*1e6:9.1f} us total, "
              f"{dt/n*1e9:8.1f} ns/iter (8 packets, 2 child tests)"
              f"  chk={float(out[0,0]):.6f}")


if __name__ == "__main__":
    main()

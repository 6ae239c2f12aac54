"""Microbenchmarks behind the round-3 MXU leaf-stage design
(ops/pallas/traverse.py process_mxu); findings recorded in PERF.md:

- matmul+epilogue for one (64 tri x 128 ray) group: ~120 ns compute-only
  (68 Gpairs/s) -> the MXU formulation beats the ~80 ns/tri scalar loop
  ~5x per pair;
- leaf HBM DMA must ride a >=4-deep ring or latency dominates (3.7 us/leaf
  at 2-deep);
- per-sublane dynamic node fetches (~240 ns/row) and encoded
  vector->scalar syncs (~1-2 us/iter) killed the independent-subpacket
  walk idea — the shipped design keeps ONE walk per 1024-ray tile;
- this file times the shipped shape: deep DMA ring + per-group masked
  bf16-input matmuls assembled from (8,128) ray tiles.
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


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def leaf_full(TL=64, QUEUE=8, N_ITERS=1024, groups=8):
    """Full mock leaf stage: QUEUE-deep DMA ring; per leaf, assemble
    rays_s for each of 8 sublane groups from (8,128) tiles and run the
    masked MXU test + best update."""
    CT = 6 * TL
    JMASK = TL - 1  # TL power of two

    def kernel(rows_hbm, ox_r, oy_r, oz_r, dx_r, dy_r, dz_r,
               out_ref, qbuf, sems):
        tiles = [r[:] for r in (ox_r, oy_r, oz_r, dx_r, dy_r, dz_r)]
        ones = jnp.ones((1, 128), jnp.float32)
        zeros1 = jnp.zeros((1, 128), jnp.float32)
        sub = jax.lax.broadcasted_iota(jnp.int32, (TL, 128), 0)
        subsel = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        n_blocks = rows_hbm.shape[0] // 8

        def dma(slot, i):
            row = pl.multiple_of(((i * 3) & (n_blocks - 1)) * 8, 8)
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(row, 8)], qbuf.at[slot], sems.at[slot])

        for q in range(QUEUE):
            dma(q, q).start()

        def body(i, carry):
            best, bj = carry
            slot = jax.lax.rem(i, QUEUE)
            # scalar ring select for wait/start
            for q in range(QUEUE):
                @pl.when(slot == q)
                def _(q=q):
                    dma(q, i).wait()

            block = qbuf[pl.ds(slot, 1)][0]          # hmm dynamic 1st dim

            for s in range(groups):
                rays_s = jnp.concatenate(
                    [t[s:s + 1, :] for t in tiles] + [ones, zeros1], axis=0)
                out = jax.lax.dot_general(
                    block, rays_s,
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
                hit = (ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                       & (t > 1e-4))
                key = jnp.where(
                    hit,
                    (pltpu.bitcast(t, jnp.int32) & jnp.int32(~JMASK)) | sub,
                    jnp.int32(0x7F000000))
                kmin = jnp.min(key, axis=0, keepdims=True)
                t_leaf = pltpu.bitcast(kmin & jnp.int32(~JMASK), jnp.float32)
                j_leaf = (kmin & JMASK).astype(jnp.float32)
                imp = (subsel == s) & (
                    jnp.broadcast_to(t_leaf, (8, 128)) < best)
                best = jnp.where(imp, jnp.broadcast_to(t_leaf, (8, 128)),
                                 best)
                bj = jnp.where(imp, jnp.broadcast_to(j_leaf, (8, 128)), bj)

            @pl.when(i + QUEUE < N_ITERS)
            def _():
                for q in range(QUEUE):
                    @pl.when(slot == q)
                    def _(q=q):
                        dma(q, i + QUEUE).start()

            return best, bj

        best, bj = jax.lax.fori_loop(
            0, N_ITERS, body,
            (jnp.full((8, 128), 1e30), jnp.zeros((8, 128))))
        out_ref[:] = best + bj * 1e-7

    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(1024, CT)).astype(np.float32))
    tiles = [jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))
             for _ in range(6)]
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((QUEUE, 8, CT), jnp.float32),
                        pltpu.SemaphoreType.DMA((QUEUE,))],
    )
    return jax.jit(lambda *a: f(*a)), rows, tiles


def main():
    print("backend:", jax.default_backend())
    for TL, Q, G, N in ((64, 8, 8, 1024), (64, 8, 8, 4096),
                        (64, 8, 8, 256), (64, 4, 8, 4096),
                        (64, 8, 2, 4096), (128, 8, 8, 4096)):
        fn, rows, tiles = leaf_full(TL, Q, N, G)
        dt, out = timed(fn, rows, *tiles, reps=10)
        pairs = TL * 128 * G * N
        print(f"TL={TL:3d} Q={Q} groups={G} N={N:5d}: "
              f"{dt*1e6:9.1f} us/call {dt/N*1e9:8.1f} ns/leaf "
              f"({pairs/dt/1e9:6.2f} Gpairs/s) chk={float(out.sum()):.6g}")


if __name__ == "__main__":
    main()

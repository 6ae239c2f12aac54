"""Round-3 profile: scalar vs MXU leaf stage in the standalone packet
traversal, on primary and synthetic-bounce ray distributions, plus the
full per-bounce pipeline.  Used to steer the leaf/walk optimization
split (PERF.md round 3).

Run: python examples/profile_mxu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from examples.bench_bvh import big_scene


def timeit(fn, *args, reps=3):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    res, spp = 256, 16
    scene = big_scene(res, res, 6)
    n = res * res * spp
    acc = scene.packet_accel
    print(f"accel: rpl={acc.rpl} nodes={acc.n_nodes} leaves={acc.n_leaves}"
          f" mxu={acc.mxu}")

    from mitsuba_tpu.models.integrators import sample_rays
    from mitsuba_tpu.models.integrators.megapath import _morton_perm
    from mitsuba_tpu.ops.pallas.megakernel import pack_scene_bvh
    from mitsuba_tpu.ops.pallas import traverse as tv

    rows, mxu_rows, res_rows, _tex, _env, light, n_lights = \
        pack_scene_bvh(scene, acc)
    seed = jnp.uint32(3)
    ray, _, _, lane = sample_rays(scene, seed, spp)
    active = jnp.ones((n,), bool)

    perm = _morton_perm(res, res, n)
    pj = jnp.asarray(perm)
    o_pri = jnp.take(ray.o, pj, axis=0)
    d_pri = jnp.take(ray.d, pj, axis=0)

    # synthetic sorted bounce rays: cosine hemisphere off the first hit
    t, fid = tv.packet_closest_hit(
        acc.node_box, acc.node_meta, rows, o_pri, d_pri,
        jnp.full((n,), jnp.inf), active,
        n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch,
        mxu_rows=mxu_rows)
    hitp = o_pri + jnp.where(jnp.isfinite(t), t, 0.0)[:, None] * d_pri
    k = jax.random.PRNGKey(0)
    d_bnc = jax.random.normal(k, (n, 3))
    d_bnc = d_bnc / jnp.linalg.norm(d_bnc, axis=1, keepdims=True)
    o_bnc = hitp - 1e-3 * d_bnc
    # sort by (octant, position cell) like the pipeline
    cell = jnp.floor((o_bnc - scene.scene_center) * 8.0).astype(jnp.int32)
    oct_ = ((d_bnc[:, 0] > 0).astype(jnp.int32) * 4
            + (d_bnc[:, 1] > 0).astype(jnp.int32) * 2
            + (d_bnc[:, 2] > 0).astype(jnp.int32))
    key = oct_ * (1 << 24) + (cell[:, 0] & 255) * 65536 + \
        (cell[:, 1] & 255) * 256 + (cell[:, 2] & 255)
    sp = jnp.argsort(key)
    o_bnc, d_bnc = o_bnc[sp], d_bnc[sp]

    for label, o, d in (("primary", o_pri, d_pri),
                        ("bounce-sorted", o_bnc, d_bnc)):
        for mode, mr in (("scalar", None), ("mxu", mxu_rows)):
            f = jax.jit(lambda o, d, mr=mr: tv.packet_closest_hit(
                acc.node_box, acc.node_meta, rows, o, d,
                jnp.full((n,), jnp.inf), active,
                n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch,
                mxu_rows=mr)[0])
            dt = timeit(f, o, d)
            print(f"closest {label:14s} {mode:7s}: {dt*1e3:8.1f} ms "
                  f"({n/dt/1e6:7.3f} Mray/s)")
        for mode, mr in (("scalar", None), ("mxu", mxu_rows)):
            f = jax.jit(lambda o, d, mr=mr: tv.packet_any_hit(
                acc.node_box, acc.node_meta, rows, o, d,
                10.0, active,
                n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch,
                mxu_rows=mr))
            dt = timeit(f, o, d)
            print(f"anyhit  {label:14s} {mode:7s}: {dt*1e3:8.1f} ms "
                  f"({n/dt/1e6:7.3f} Mray/s)")


if __name__ == "__main__":
    main()

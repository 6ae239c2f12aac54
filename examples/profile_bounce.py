"""Per-depth launch cost of the sorted per-bounce BVH pipeline.

Times pipeline prefixes (depth = 1..D) and diffs to get each bounce's
kernel cost; also compares batch/rpl tuning on the standalone kernels.
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
    res, spp, depth = 256, 16, 6
    scene = big_scene(res, res, 6)
    n = res * res * spp
    acc = scene.packet_accel

    from mitsuba_tpu.models.integrators import sample_rays
    from mitsuba_tpu.models.integrators.megapath import _bounce_sort_key
    from mitsuba_tpu.ops.pallas.megakernel import (megakernel_bounce_bvh,
                                                   pack_scene_bvh)

    rows, mxu_rows, res_rows, _tex, _env, light, n_lights = \
        pack_scene_bvh(scene, acc)
    seed = jnp.uint32(3)
    ray, _, _, lane = sample_rays(scene, seed, spp)
    active = jnp.ones((n,), bool)

    def pipeline(ray, lane, active, ndep):
        z = jnp.zeros((n,))
        o1 = jnp.ones((n,))
        st = (ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
              ray.d[:, 0], ray.d[:, 1], ray.d[:, 2],
              z, z, z, o1, o1, o1, o1, o1, o1,
              active.astype(jnp.float32))
        center = scene.scene_center
        inv_r = 1.0 / jnp.maximum(scene.scene_radius, 1e-6)
        lane_c = lane.astype(jnp.int32)
        for d in range(ndep):
            k = _bounce_sort_key(st, center, inv_r)
            perm = jnp.argsort(k)
            packed = jnp.stack(
                st + (lane_c.astype(jnp.float32),), axis=1)[perm]
            st = tuple(packed[:, i] for i in range(16))
            lane_c = packed[:, 16].astype(jnp.int32)
            st = megakernel_bounce_bvh(
                acc.node_box, acc.node_meta, rows, light, lane_c, seed,
                st, depth=d, max_depth=depth, rr_depth=5,
                n_nodes=acc.n_nodes, n_lights=n_lights, btypes=(0,),
                interpret=False, rpl=acc.rpl, batch=acc.batch,
                smooth=True)
        return st[6] + st[7] + st[8]

    prev = 0.0
    alive = None
    for ndep in range(1, depth + 1):
        f = jax.jit(lambda r, l, a, nd=ndep: pipeline(r, l, a, nd))
        t = timeit(f, ray, lane, active)
        print(f"prefix depth {ndep}: {t*1e3:8.1f} ms "
              f"(+{(t-prev)*1e3:7.1f} ms this bounce)")
        prev = t


if __name__ == "__main__":
    main()

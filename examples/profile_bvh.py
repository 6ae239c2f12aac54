"""Component profile of the sorted per-bounce BVH pipeline (PERF.md).

Times, on the real chip: (a) the argsort+gather sort stage alone,
(b) per-bounce kernel launches with an identity permutation (no sort),
(c) the full sorted pipeline, (d) single-launch megakernel.
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
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    res, spp, depth = 256, 16, 6
    scene = big_scene(res, res, 6)
    n = res * res * spp
    print(f"n={n} backend={jax.default_backend()}")

    # (a) sort stage alone: 16-array state gather by argsort of int32 keys
    key = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 28,
                             dtype=jnp.int32)
    state = tuple(jax.random.normal(jax.random.PRNGKey(i), (n,))
                  for i in range(16))

    @jax.jit
    def sort_stage(key, state):
        perm = jnp.argsort(key)
        return tuple(x[perm] for x in state)

    @jax.jit
    def argsort_only(key):
        return jnp.argsort(key)

    t_argsort = timeit(argsort_only, key)
    t_sort = timeit(sort_stage, key, state)
    print(f"argsort 1M i32      : {t_argsort*1e3:8.1f} ms")
    print(f"argsort+16 gathers  : {t_sort*1e3:8.1f} ms  (x{depth} bounces"
          f" = {t_sort*depth*1e3:.0f} ms)")

    # (b)/(c) per-bounce pipeline with and without real sorting
    from mitsuba_tpu.models.integrators import (MegakernelPathIntegrator,
                                                sample_rays)
    from mitsuba_tpu.ops.pallas.megakernel import (megakernel_bounce_bvh,
                                                   pack_scene_bvh)
    from mitsuba_tpu.models.integrators.megapath import _bounce_sort_key

    seed = jnp.uint32(3)
    ray, weight, film_pos, lane = sample_rays(scene, seed, spp)
    active = jnp.ones((n,), bool)
    acc = scene.packet_accel
    rows, mxu_rows, res_rows, _tex, _env, light, n_lights = \
        pack_scene_bvh(scene, acc)
    smooth = True
    btypes = (0,)

    def pipeline(ray, lane, active, mode):
        z = jnp.zeros((n,))
        o1 = jnp.ones((n,))
        st = (ray.o[:, 0], ray.o[:, 1], ray.o[:, 2],
              ray.d[:, 0], ray.d[:, 1], ray.d[:, 2],
              z, z, z, o1, o1, o1, o1, o1, o1,
              active.astype(jnp.float32))
        center = scene.scene_center
        inv_r = 1.0 / jnp.maximum(scene.scene_radius, 1e-6)
        lane_c = lane.astype(jnp.int32)
        for d in range(depth):
            if mode == "sorted":
                k = _bounce_sort_key(st, center, inv_r)
                perm = jnp.argsort(k)
                st = tuple(x[perm] for x in st)
                lane_c = lane_c[perm]
            st = megakernel_bounce_bvh(
                acc.node_box, acc.node_meta, rows, light, lane_c, seed,
                st, depth=d, max_depth=depth, rr_depth=5,
                n_nodes=acc.n_nodes, n_lights=n_lights, btypes=btypes,
                interpret=False, rpl=acc.rpl, batch=acc.batch,
                smooth=smooth)
        return st[6] + st[7] + st[8]

    for mode in ("identity", "sorted"):
        f = jax.jit(lambda r, l, a, mode=mode: pipeline(r, l, a, mode))
        t = timeit(f, ray, lane, active)
        print(f"per-bounce {mode:9s}: {t*1e3:8.1f} ms "
              f"({n/t/1e6:6.3f} Mray/s)")

    # (d) one-launch megakernel for reference
    integ = MegakernelPathIntegrator(max_depth=depth, rr_depth=5,
                                     strict=True)
    f = jax.jit(lambda r, l, a: integ.sample(scene, r, l, seed, a))
    t = timeit(f, ray, lane, active)
    print(f"single-launch mk    : {t*1e3:8.1f} ms ({n/t/1e6:6.3f} Mray/s)")


if __name__ == "__main__":
    main()

"""Focused A/B of the leaf-batch arena K (MITSUBA_TPU_LEAF_BATCH).

Measures only the two traversal-bound pieces of the bounce decomposition
(closest-hit sorted bounce + shadow-to-light any-hit) so a K sweep costs
one small compile per K instead of a full profile_r4 run.

Run: MITSUBA_TPU_LEAF_BATCH=K python examples/profile_arena.py
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
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    res, spp = 256, 16
    scene = big_scene(res, res, 6)
    n = res * res * spp
    acc = scene.packet_accel

    from mitsuba_tpu.models.integrators import sample_rays
    from mitsuba_tpu.models.integrators.megapath import _bounce_sort_key
    from mitsuba_tpu.ops.pallas.megakernel import pack_scene_bvh
    from mitsuba_tpu.ops.pallas.traverse import (leaf_batch,
                                                 packet_any_hit,
                                                 packet_closest_hit)

    print(f"K={leaf_batch(acc.rpl)} rpl={acc.rpl} "
          f"nodes={acc.n_nodes}")
    rows, mxu_rows, res_rows, _tex, _env, light, n_lights = \
        pack_scene_bvh(scene, acc)
    seed = jnp.uint32(3)
    ray, _, _, lane = sample_rays(scene, seed, spp)
    active = jnp.ones((n,), bool)

    f0 = jax.jit(lambda o, d: packet_closest_hit(
        acc.node_box, acc.node_meta, rows, o, d, jnp.full((n,), jnp.inf),
        active, n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch,
        mxu_rows=mxu_rows, res_rows=res_rows))
    t_hit, _ = f0(ray.o, ray.d)
    t_hit = jnp.where(jnp.isfinite(t_hit), t_hit, 0.0)
    p = ray.o + ray.d * (t_hit * 0.999)[:, None]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.uniform(k1, (n, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(0, 1 - u[:, 0]))], -1)
    sgn = jnp.where(jax.random.uniform(k2, (n,)) > 0.5, 1.0, -1.0)
    d2 = d2 * jnp.stack([jnp.ones(n), jnp.ones(n), sgn], -1)
    state = (p[:, 0], p[:, 1], p[:, 2], d2[:, 0], d2[:, 1], d2[:, 2]) + \
        (jnp.zeros(n),) * 9 + (jnp.ones(n),)
    key = _bounce_sort_key(state, scene.scene_center,
                           1.0 / scene.scene_radius)
    prm = jnp.argsort(key)
    ps, ds = p[prm], d2[prm]

    t = timeit(f0, ps, ds)
    print(f"closest bounce sorted : {t*1e3:8.1f} ms "
          f"({n/t/1e6:6.3f} Mray/s)")

    lt = jnp.asarray(scene.scene_center) + jnp.asarray([0.0, 0.0, 1.2])
    sd = lt[None, :] - ps
    sdist = jnp.sqrt(jnp.maximum(jnp.sum(sd * sd, -1), 1e-12))
    sd = sd / sdist[:, None]
    fa = jax.jit(lambda o, d, m: packet_any_hit(
        acc.node_box, acc.node_meta, rows, o, d, m, active,
        n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch,
        mxu_rows=mxu_rows))
    t = timeit(fa, ps, sd, sdist * (1 - 1e-3))
    print(f"anyhit shadow sorted  : {t*1e3:8.1f} ms "
          f"({n/t/1e6:6.3f} Mray/s)")


if __name__ == "__main__":
    main()

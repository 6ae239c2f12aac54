"""Isolate packet traversal cost by ray distribution (PERF.md).

Standalone packet_closest_hit on: (a) Morton-tiled primary rays,
(b) randomly shuffled primaries (worst-case packet incoherence),
(c) synthetic diffuse-bounce rays unsorted, (d) same sorted by the
pipeline's (octant, position-morton) key, (e) same sorted by
position-only morton.  Separates "does coherence matter" from "does the
sort key produce coherence".
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
    from mitsuba_tpu.models.integrators.megapath import (_bounce_sort_key,
                                                         _morton_perm,
                                                         _part1by2)
    from mitsuba_tpu.ops.pallas.megakernel import pack_scene_bvh
    from mitsuba_tpu.ops.pallas.traverse import packet_closest_hit

    rows, mxu_rows, res_rows, _tex, _env, light, n_lights = \
        pack_scene_bvh(scene, acc)
    seed = jnp.uint32(3)
    ray, _, _, lane = sample_rays(scene, seed, spp)
    active = jnp.ones((n,), bool)

    def run(o, d, label):
        f = jax.jit(lambda o, d: packet_closest_hit(
            acc.node_box, acc.node_meta, rows, o, d,
            jnp.full((n,), jnp.inf), active,
            n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch))
        t = timeit(f, o, d)
        print(f"{label:28s}: {t*1e3:8.1f} ms ({n/t/1e6:7.3f} Mray/s)")
        return t

    # (a) Morton-tiled primaries
    perm = _morton_perm(res, res, n)
    pm = jnp.asarray(perm)
    run(ray.o[pm], ray.d[pm], "primary morton-tiled")
    # (a2) primaries raw pixel-major
    run(ray.o, ray.d, "primary pixel-major")
    # (b) shuffled primaries
    sh = jax.random.permutation(jax.random.PRNGKey(0), n)
    run(ray.o[sh], ray.d[sh], "primary shuffled")

    # (c) synthetic diffuse bounce: first-hit points, cosine dirs
    t0f = jax.jit(lambda o, d: packet_closest_hit(
        acc.node_box, acc.node_meta, rows, o, d, jnp.full((n,), jnp.inf),
        active, n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch))
    t_hit, _ = t0f(ray.o, ray.d)
    t_hit = jnp.where(jnp.isfinite(t_hit), t_hit, 0.0)
    p = ray.o + ray.d * (t_hit * 0.999)[:, None]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.uniform(k1, (n, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    # hemisphere around +y-ish mixed frame: just use world-up cosine then
    # randomize sign on z to decorrelate — this approximates bounce chaos
    d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(0, 1 - u[:, 0]))], -1)
    sgn = jnp.where(jax.random.uniform(k2, (n,)) > 0.5, 1.0, -1.0)
    d2 = d2 * jnp.stack([jnp.ones(n), jnp.ones(n), sgn], -1)
    run(p, d2, "bounce unsorted (pix-major)")

    state = (p[:, 0], p[:, 1], p[:, 2], d2[:, 0], d2[:, 1], d2[:, 2]) + \
        (jnp.zeros(n),) * 9 + (jnp.ones(n),)
    key = _bounce_sort_key(state, scene.scene_center,
                           1.0 / scene.scene_radius)
    prm = jnp.argsort(key)
    run(p[prm], d2[prm], "bounce sorted octant+pos")

    # position-only morton key
    def q(v, c):
        t = (v - c) / scene.scene_radius * 0.5 + 0.5
        return jnp.clip(t * 1023.0, 0, 1023).astype(jnp.int32)

    mk = (_part1by2(q(p[:, 0], scene.scene_center[0]))
          | (_part1by2(q(p[:, 1], scene.scene_center[1])) << 1)
          | (_part1by2(q(p[:, 2], scene.scene_center[2])) << 2))
    prm2 = jnp.argsort(mk)
    run(p[prm2], d2[prm2], "bounce sorted pos-only")

    # pos-then-octant (octant low bits)
    oc = ((d2[:, 0] >= 0).astype(jnp.int32)
          + 2 * (d2[:, 1] >= 0).astype(jnp.int32)
          + 4 * (d2[:, 2] >= 0).astype(jnp.int32))
    prm3 = jnp.argsort((mk << 3) | oc)
    run(p[prm3], d2[prm3], "bounce sorted pos+octant")


if __name__ == "__main__":
    main()

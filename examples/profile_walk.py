"""Walk-vs-leaf decomposition of packet closest-hit (hardware).

Uses the traverse.py debug flags:
  --counters : report walk iterations + leaf enqueues per packet
  --noleaf   : time the walk with leaf intersection skipped
  (default)  : time the full closest-hit for reference

Run each mode in a FRESH process (the flags are baked at first jit).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counters", action="store_true")
    ap.add_argument("--noleaf", action="store_true")
    args = ap.parse_args()

    from mitsuba_tpu.ops.pallas import traverse

    traverse.DEBUG_COUNTERS = args.counters
    traverse.DEBUG_NOLEAF = args.noleaf

    from examples.bench_bvh import big_scene
    from mitsuba_tpu.models.integrators import sample_rays
    from mitsuba_tpu.models.integrators.megapath import _bounce_sort_key
    from mitsuba_tpu.ops.pallas.megakernel import pack_scene_bvh
    from mitsuba_tpu.ops.pallas.traverse import packet_closest_hit

    res, spp = 256, 16
    scene = big_scene(res, res, 6)
    n = res * res * spp
    acc = scene.packet_accel
    rows, mxu_rows, res_rows, _t, _e, light, n_lights = \
        pack_scene_bvh(scene, acc)
    seed = jnp.uint32(3)
    ray, _, _, lane = sample_rays(scene, seed, spp)
    active = jnp.ones((n,), bool)

    f0 = jax.jit(lambda o, d: packet_closest_hit(
        acc.node_box, acc.node_meta, rows, o, d, jnp.full((n,), jnp.inf),
        active, n_nodes=acc.n_nodes, rpl=acc.rpl, batch=acc.batch,
        mxu_rows=mxu_rows,
        res_rows=None if args.counters else res_rows))

    def bounce_rays():
        # use the REAL mxu path for first hits regardless of debug flags
        t_hit = jnp.asarray(np.load("/tmp/first_hit_t.npy")) \
            if os.path.exists("/tmp/first_hit_t.npy") else None
        if t_hit is None:
            import subprocess
            raise SystemExit("run 'python examples/profile_walk.py "
                             "--save-first' logic manually")
        p = ray.o + ray.d * (t_hit * 0.999)[:, None]
        return p

    # first hits: compute with whatever mode is active; for counters
    # mode t is bogus, so recompute geometrically via a plane clamp —
    # instead just cache from a prior default run
    cache = "/tmp/first_hit_t.npy"
    if not (args.counters or args.noleaf):
        t_hit, _ = f0(ray.o, ray.d)
        np.save(cache, np.where(np.isfinite(np.asarray(t_hit)),
                                np.asarray(t_hit), 0.0))
    t_hit = jnp.asarray(np.load(cache))
    p = ray.o + ray.d * (t_hit * 0.999)[:, None]
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.uniform(k1, (n, 2))
    r = jnp.sqrt(u[:, 0])
    phi = 2 * jnp.pi * u[:, 1]
    d2 = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi),
                    jnp.sqrt(jnp.maximum(0, 1 - u[:, 0]))], -1)
    sgn = jnp.where(jax.random.uniform(k2, (n,)) > 0.5, 1.0, -1.0)
    d2 = d2 * jnp.stack([jnp.ones(n), jnp.ones(n), sgn], -1)
    st = (p[:, 0], p[:, 1], p[:, 2], d2[:, 0], d2[:, 1], d2[:, 2]) + \
        (jnp.zeros(n),) * 9 + (jnp.ones(n),)
    key = _bounce_sort_key(st, scene.scene_center,
                           1.0 / scene.scene_radius)
    prm = jnp.argsort(key)
    ps, ds = p[prm], d2[prm]

    def timeit(fn, *a, reps=3):
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(reps):
            jax.block_until_ready(fn(*a))
        return (time.perf_counter() - t0) / reps

    for label, o, d in (("primary", ray.o, ray.d),
                        ("bounce sorted", ps, ds)):
        t, fid = f0(o, d)
        dt = timeit(f0, o, d)
        tag = ("counters" if args.counters
               else "noleaf" if args.noleaf else "full")
        if args.counters:
            # per packet (values replicated across the packet's lanes)
            iters = np.asarray(t).reshape(-1, 1024)[:, 0]
            enqs = np.asarray(fid, np.float32).reshape(-1, 1024)[:, 0]
            print(f"[{tag}] {label:14s}: iters/packet mean={iters.mean():7.1f} "
                  f"p95={np.percentile(iters, 95):7.1f} "
                  f"enq/packet mean={enqs.mean():7.1f} "
                  f"p95={np.percentile(enqs, 95):7.1f}  {dt*1e3:7.1f} ms")
        else:
            print(f"[{tag}] {label:14s}: {dt*1e3:8.1f} ms "
                  f"({n/dt/1e6:7.3f} Mray/s)")


if __name__ == "__main__":
    main()

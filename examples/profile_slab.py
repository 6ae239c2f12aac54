"""Split the per-bounce shading+state slab with the ablation flags
(round 5, VERDICT #4): one sorted bounce launch is measured with NEE,
BSDF sampling, and emitter-hit MIS successively removed; successive
differences attribute the ~38 ms/1M-ray slab (PERF.md round-4
decomposition) to its pieces.

jax.clear_caches() between configs: the flags are module globals, not
jit cache keys.

Run: python examples/profile_slab.py
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
    from mitsuba_tpu.ops.pallas import megakernel as mk
    from mitsuba_tpu.ops.pallas.megakernel import (megakernel_bounce_bvh,
                                                   pack_scene_bvh)
    from mitsuba_tpu.ops.pallas.traverse import packet_closest_hit

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
    st16 = (ps[:, 0], ps[:, 1], ps[:, 2], ds[:, 0], ds[:, 1], ds[:, 2],
            jnp.zeros(n), jnp.zeros(n), jnp.zeros(n),
            jnp.ones(n), jnp.ones(n), jnp.ones(n),
            jnp.ones(n), jnp.ones(n), jnp.ones(n), jnp.ones(n))

    def one_bounce(st):
        out = megakernel_bounce_bvh(
            acc.node_box, acc.node_meta, rows, light,
            lane.astype(jnp.int32), seed, st, depth=1, max_depth=6,
            rr_depth=5, n_nodes=acc.n_nodes, n_lights=n_lights,
            btypes=(0,), rpl=acc.rpl, batch=acc.batch, smooth=True,
            mxu_rows=mxu_rows, res_rows=res_rows)
        return out[6]

    configs = [
        ("full bounce", {}),
        ("- shadow trace (NEE math kept)",
         {"DEBUG_SKIP_NEE_TRACE": True}),
        ("- NEE (light sample + shadow anyhit)", {"DEBUG_SKIP_NEE": True}),
        ("- NEE - sampling", {"DEBUG_SKIP_NEE": True,
                              "DEBUG_SKIP_SAMPLING": True}),
        ("- NEE - sampling - emithit", {"DEBUG_SKIP_NEE": True,
                                        "DEBUG_SKIP_SAMPLING": True,
                                        "DEBUG_SKIP_EMITHIT": True}),
    ]
    results = []
    for label, flags in configs:
        for k in ("DEBUG_SKIP_NEE", "DEBUG_SKIP_NEE_TRACE",
                  "DEBUG_SKIP_SAMPLING", "DEBUG_SKIP_EMITHIT"):
            setattr(mk, k, flags.get(k, False))
        jax.clear_caches()
        t = timeit(jax.jit(one_bounce), st16)
        results.append((label, t))
        print(f"{label:40s}: {t*1e3:8.1f} ms")
    for k in ("DEBUG_SKIP_NEE", "DEBUG_SKIP_NEE_TRACE",
              "DEBUG_SKIP_SAMPLING", "DEBUG_SKIP_EMITHIT"):
        setattr(mk, k, False)
    print("\nattribution (successive differences):")
    for i in range(1, len(results)):
        d = (results[i - 1][1] - results[i][1]) * 1e3
        print(f"  {results[i][0][2:]:38s}: {d:6.1f} ms")
    print(f"  residual (closest+state I/O+launch)  : "
          f"{results[-1][1]*1e3:6.1f} ms")


if __name__ == "__main__":
    main()

"""Million-triangle packet-BVH validation + throughput (hardware).

Round-3 verdict missing #3: scenes beyond ~280k triangles silently fell
back to the pure-JAX miss-link traversal.  The fix is leaf-size
auto-scaling (scene.py: rpl 32 -> 64 -> 128 as the node table
approaches the SMEM cap; the MXU leaf stage keeps 256/512-triangle
leaves cheap).  This script proves the >=1M-triangle path end to end
on hardware (reference scalability bar: kdtree.h:1827 parallel binned
build; Embree HIGH-quality BVH):

  1. builds Cornell + subdiv-8 icosphere (~1.31M triangles) and
     asserts the packet accel built (no fallback) with its chosen rpl;
  2. closest-hit parity: packet_closest_hit vs the pure-JAX
     intersect_bvh reference on a random ray subset;
  3. full-path Mray/s through the sorted per-bounce pipeline.

Run: python examples/bench_large.py [--subdiv 8] [--rays 16384]
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
    ap.add_argument("--subdiv", type=int, default=8)
    ap.add_argument("--rays", type=int, default=16384)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--skip-path", action="store_true")
    args = ap.parse_args()

    from examples.bench_bvh import big_scene
    from mitsuba_tpu.core.records import Ray
    from mitsuba_tpu.ops.bvh import intersect_bvh
    from mitsuba_tpu.ops.pallas.megakernel import pack_scene_bvh
    from mitsuba_tpu.ops.pallas.traverse import packet_closest_hit

    t0 = time.time()
    scene = big_scene(args.res, args.res, args.subdiv)
    F = sum(int(m.faces.shape[0]) for m in scene.meshes)
    acc = scene.packet_accel
    assert acc is not None, (
        f"{F}-triangle scene fell back to the pure-JAX traversal")
    print(f"scene: {F} tris; accel nodes={acc.n_nodes} "
          f"leaves={acc.n_leaves} rpl={acc.rpl} "
          f"(build {time.time() - t0:.1f}s)")

    rows, mxu_rows, res_rows, _t, _e, _l, _nl = pack_scene_bvh(scene, acc)

    # ---- parity vs the pure-JAX reference traversal on random rays
    rng = np.random.default_rng(7)
    N = args.rays
    o = rng.random((N, 3), np.float32) * 1.6 - 0.8
    o[:, 2] = rng.random(N).astype(np.float32) * 1.6 + 0.1
    d = rng.standard_normal((N, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    act = jnp.ones((N,), bool)

    t, fid = packet_closest_hit(
        acc.node_box, acc.node_meta, rows, jnp.asarray(o),
        jnp.asarray(d), jnp.inf, act, n_nodes=acc.n_nodes,
        rpl=acc.rpl, mxu_rows=mxu_rows, res_rows=res_rows,
        box16=acc.box16)
    t = np.asarray(t)
    fid = np.asarray(fid)

    verts = jnp.concatenate([m.vertices for m in scene.meshes])
    offs = np.cumsum([0] + [int(m.vertices.shape[0])
                            for m in scene.meshes])
    faces = jnp.concatenate([
        m.faces + offs[i] for i, m in enumerate(scene.meshes)])
    pi = intersect_bvh(scene.accel, verts, faces,
                       Ray.make(jnp.asarray(o), jnp.asarray(d)), act)
    tr = np.asarray(pi.t)
    fr = np.asarray(pi.prim_index)
    mr = np.isfinite(tr)
    m_ok = (np.isfinite(t) == mr).mean()
    t_ok = np.isclose(t[mr & np.isfinite(t)],
                      tr[mr & np.isfinite(t)], rtol=1e-3,
                      atol=1e-4).mean()
    f_ok = (fid[mr & np.isfinite(t)] == fr[mr & np.isfinite(t)]).mean()
    print(f"parity vs intersect_bvh on {N} rays: hit-mask agree "
          f"{m_ok:.6f}, t close {t_ok:.6f}, prim match {f_ok:.6f}")
    assert m_ok == 1.0 and t_ok > 0.999, "parity failure"

    if args.skip_path:
        return

    # ---- full-path throughput (sorted per-bounce pipeline)
    from mitsuba_tpu.models.integrators import MegakernelPathIntegrator
    from mitsuba_tpu.models.integrators.common import _render_pass

    integ = MegakernelPathIntegrator(max_depth=args.depth,
                                     rr_depth=args.depth - 1)
    n = args.res * args.res * args.spp

    @jax.jit
    def one_pass(seed):
        return _render_pass(scene, integ, seed, args.spp, args.spp, 0)

    img = one_pass(jnp.uint32(0))
    img.block_until_ready()
    times = []
    for r in range(args.reps):
        s = time.perf_counter()
        one_pass(jnp.uint32(r + 1)).block_until_ready()
        times.append(time.perf_counter() - s)
    dt = sorted(times)[len(times) // 2]
    print(f"full path {F} tris, {args.res}x{args.res}x{args.spp}spp "
          f"depth {args.depth}: {dt * 1e3:.0f} ms "
          f"({n / dt / 1e6:.3f} Mray/s), image mean "
          f"{float(jnp.mean(img)):.5f}")


if __name__ == "__main__":
    main()

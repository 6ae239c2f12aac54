"""Large-scene BVH megakernel benchmark (hardware numbers for PERF.md).

Cornell box + subdivided icosphere (~82k tris), full path trace through
the packet-BVH megakernel.  Compares the single-launch megakernel vs the
sorted per-bounce pipeline (path-state compaction + coherence sort).

Run: python examples/bench_bvh.py [--spp 16] [--res 256] [--depth 6]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def big_scene(width, height, subdiv=6):
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.models.scene import make_scene
    from mitsuba_tpu.models.shapes import Mesh, sphere_mesh
    from mitsuba_tpu.utils.scenes import cornell_box

    base = cornell_box(width=width, height=height)
    v, f, n, uv = sphere_mesh(
        subdiv, np.asarray(tf.compose(tf.translate([0.3, 0.2, 0.2]),
                                      tf.scale(0.35))))
    ball = Mesh.make(v, f, normals=n, uvs=uv, bsdf_index=0, id="ball")
    meshes = list(base.meshes) + [ball]
    return make_scene(meshes, list(base.bsdfs), list(base.emitters),
                      base.sensor)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=6)
    ap.add_argument("--subdiv", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mode", default="both",
                    choices=["both", "sorted", "unsorted", "wavefront"])
    ap.add_argument("--sort-every", type=int, default=1)
    ap.add_argument("--rpl", type=int, default=0,
                    help="override leaf size (rows per leaf; 0 = default)")
    args = ap.parse_args()

    from mitsuba_tpu.models.integrators import MegakernelPathIntegrator
    from mitsuba_tpu.models.integrators.common import _render_pass
    from mitsuba_tpu.models.integrators.path import PathIntegrator

    scene = big_scene(args.res, args.res, args.subdiv)
    if args.rpl:
        import numpy as np

        from mitsuba_tpu.ops.pallas.traverse import build_packet_bvh

        offs = np.cumsum([0] + [int(m.vertices.shape[0])
                                for m in scene.meshes])
        fc = np.concatenate([
            np.asarray(jax.lax.stop_gradient(m.faces)) + offs[i]
            for i, m in enumerate(scene.meshes)])
        vc = np.concatenate([
            np.asarray(jax.lax.stop_gradient(m.vertices))
            for m in scene.meshes])
        scene = scene.replace(packet_accel=build_packet_bvh(
            vc, fc, rpl=args.rpl, mxu=True))
        print(f"rpl override: {args.rpl} "
              f"(nodes={scene.packet_accel.n_nodes})")
    n_tris = sum(int(m.faces.shape[0]) for m in scene.meshes)
    rays = args.res * args.res * args.spp
    print(f"tris={n_tris} rays={rays} depth={args.depth} "
          f"backend={jax.default_backend()}")

    results = {}
    modes = []
    if args.mode in ("both", "unsorted"):
        # single-launch megakernel (no per-bounce relaunch, no sort)
        modes.append(("unsorted", MegakernelPathIntegrator(
            max_depth=args.depth, rr_depth=5, strict=True,
            sort_bounces=False)))
    if args.mode in ("both", "sorted"):
        modes.append(("sorted", MegakernelPathIntegrator(
            max_depth=args.depth, rr_depth=5, strict=True,
            sort_bounces=True, sort_every=args.sort_every)))
    if args.mode == "wavefront":
        modes.append(("wavefront", PathIntegrator(
            max_depth=args.depth, rr_depth=5)))

    for name, integ in modes:
        @jax.jit
        def one_pass(seed, integ=integ):
            return _render_pass(scene, integ, seed, args.spp, args.spp, 0)

        t0 = time.perf_counter()
        img = one_pass(jnp.uint32(0))
        img.block_until_ready()
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for r in range(args.reps):
            one_pass(jnp.uint32(r + 1)).block_until_ready()
        dt = (time.perf_counter() - t0) / args.reps
        mray = rays / dt / 1e6
        results[name] = mray
        print(f"{name:10s}: {dt * 1e3:8.1f} ms/pass  {mray:7.3f} Mray/s "
              f"(compile {t_compile:.0f}s)  mean={float(img.mean()):.5f}")

    print(json.dumps({"tris": n_tris, **{k: round(v, 4)
                                         for k, v in results.items()}}))


if __name__ == "__main__":
    main()

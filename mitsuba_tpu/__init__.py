"""mitsuba_tpu — a TPU-native differentiable Monte-Carlo renderer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gitmon/mitsuba3-camera (Mitsuba 3 + differentiable realistic-lens camera):
wavefront path tracing, BSDF importance sampling with NEE/MIS,
path-replay-backpropagation adjoints, and a differentiable multi-element
lens camera + lens-design toolkit — sharded over TPU meshes via shard_map.

Layout (maps SURVEY.md section 2's inventory):
  core/      math, warps, stateless RNG, distributions, records, transforms
  ops/       hot kernels: ray-triangle/BVH intersection, film splatting
  models/    plugin registries: bsdfs, shapes, emitters, sensors, films,
             samplers, textures, integrators, scene
  parallel/  device-mesh sharding of the wavefront, psum film/grad reduction
  utils/     scene loading, parameter traversal, optimizers, chi2 harness
  lens/      [FORK] realistic lens camera + lens-design toolkit
"""

__version__ = "0.1.0"

from . import core  # noqa: F401

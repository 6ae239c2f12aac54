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

Top-level convenience API (the mi.* surface):
  load_dict, render, prb_render, traverse, SceneParameters, cornell_box
"""

__version__ = "0.1.0"

from . import core  # noqa: F401
from .models.integrators import (  # noqa: F401
    DepthIntegrator,
    DirectIntegrator,
    PathIntegrator,
    PRBIntegrator,
    prb_render,
    render,
)
from .models.denoiser import denoise, denoise_render  # noqa: F401
from .utils.config import set_variant, variant, variants  # noqa: F401
from .utils.interrupt import cancel, clear_cancel  # noqa: F401
from .utils.load import load_dict  # noqa: F401
from .utils.params import SceneParameters, traverse, update  # noqa: F401
from .utils.scenes import cornell_box, cornell_box_dict  # noqa: F401

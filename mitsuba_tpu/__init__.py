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

import os as _os

if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    # Make the persistent compile cache reliable: the env var alone is
    # not always honored (verified on the axon/TPU tunnel, where
    # megakernel compiles take minutes), so wire it through jax.config.
    # TPU-path processes ONLY — cache artifacts produced via the
    # tunnel's remote-compile service are stamped with the *server's*
    # CPU features, and loading one in a local CPU process SIGABRTs
    # ("machine type doesn't match", observed in the round-4 test run).
    # CPU processes must therefore opt in with their own cache dir
    # (tests/conftest.py uses /tmp/jax_cache_cpu).
    import jax as _jax

    _plats = (_jax.config.jax_platforms or
              _os.environ.get("JAX_PLATFORMS", ""))
    if any(p in _plats for p in ("tpu", "axon")):
        _jax.config.update("jax_compilation_cache_dir",
                           _os.environ["JAX_COMPILATION_CACHE_DIR"])
        _jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 5.0)

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

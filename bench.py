"""Headline benchmark: Cornell box path tracing rays/s on one TPU chip.

BASELINE.json metric: "rays/s/chip (Cornell box, path spp=64)" —
max_depth=6, independent sampler, 256x256 film.  Prints ONE JSON line.

rays/s counts *camera samples* per second (wavefront lanes retired per
wall-clock second, the reference's own throughput notion for its
render loop, integrator.cpp:247-330); each lane traces up to max_depth
segments, so segment throughput is ~2-3x higher.
"""
import json
import os
import time

# persistent XLA/Mosaic cache: the megakernel's cold AOT compile over the
# tunnel takes minutes; warm runs are seconds
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp


def main():
    from mitsuba_tpu.models.integrators import MegakernelPathIntegrator
    from mitsuba_tpu.models.integrators.common import _render_pass
    from mitsuba_tpu.utils.scenes import cornell_box

    width = height = 256
    spp = 64
    spp_pass = 64  # single pass: the Pallas megakernel holds the full
    #                bounce loop in VMEM, so bigger launches amortize best
    n_pass = spp // spp_pass
    scene = cornell_box(width=width, height=height)
    # estimator identical to PathIntegrator (same samples, same image);
    # the megakernel is the TPU fast path for this scene class, with
    # automatic fallback to the wavefront integrator out of scope
    integrator = MegakernelPathIntegrator(max_depth=6, rr_depth=5)

    @jax.jit
    def one_pass(seed, pass_index):
        return _render_pass(scene, integrator, seed, spp, spp_pass, pass_index)

    # compile + warmup
    img = one_pass(jnp.uint32(0), 0)
    img.block_until_ready()

    t0 = time.perf_counter()
    reps = 3
    for r in range(reps):
        acc = None
        for p in range(n_pass):
            img = one_pass(jnp.uint32(r), p)
            acc = img if acc is None else acc + img
        acc.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    rays = width * height * spp
    rays_per_s = rays / dt
    print(json.dumps({
        "metric": "rays/s/chip (Cornell box, path spp=64, max_depth=6)",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()

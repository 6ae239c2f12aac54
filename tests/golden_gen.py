"""Generate golden render statistics for the z-test harness
(tests/test_golden.py — the analogue of the reference's
test_renders.py:159-187 variance-aware golden-image tests).

The reference renders goldens with an independent renderer; that
renderer cannot be built in this environment (BASELINE.md), so the
goldens are SELF-parity anchors: high-spp renders of this renderer,
regenerated only deliberately.  They catch silent drift in MIS weights,
sampling conventions, and plugin behavior across refactors.

Run: python tests/golden_gen.py   (writes tests/golden/*.npz)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


def scene_configs():
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict

    cfgs = {}

    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "path", "max_depth": 5}
    cfgs["cornell_path"] = d

    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "path", "max_depth": 5}
    d["small-box"]["bsdf"] = {"type": "conductor"}
    d["large-box"]["bsdf"] = {"type": "dielectric"}
    cfgs["cornell_metal_glass"] = d

    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "direct"}
    cfgs["cornell_direct"] = d

    checker = (np.indices((16, 16)).sum(0) % 2 * 0.6 + 0.2)
    data = np.repeat(checker[:, :, None], 3, -1).astype(np.float32)
    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "path", "max_depth": 4}
    wall = [k for k in d if "white" in k or "back" in k][0]
    d[wall]["bsdf"] = {"type": "diffuse",
                       "reflectance": {"type": "bitmap", "data": data}}
    cfgs["cornell_textured"] = d

    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "volpath", "max_depth": 5}
    d["medium"] = {"type": "homogeneous",
                   "sigma_t": {"type": "rgb", "value": [0.4, 0.4, 0.4]},
                   "albedo": {"type": "rgb", "value": [0.8, 0.8, 0.8]},
                   "phase": {"type": "isotropic"}}
    cfgs["cornell_volpath"] = d

    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "volpathmis", "max_depth": 5}
    d["medium"] = {"type": "homogeneous",
                   "sigma_t": {"type": "rgb", "value": [0.15, 0.9, 2.5]},
                   "albedo": {"type": "rgb", "value": [0.8, 0.8, 0.8]},
                   "phase": {"type": "isotropic"}}
    cfgs["cornell_volpathmis"] = d

    d = cornell_box_dict(width=32, height=32, spp=8)
    d["integrator"] = {"type": "volpath", "max_depth": 5}
    d["medium"] = {"type": "homogeneous",
                   "sigma_t": {"type": "rgb", "value": [0.5, 0.5, 0.5]},
                   "albedo": {"type": "rgb", "value": [0.8, 0.8, 0.8]},
                   "phase": {"type": "sggx",
                             "S": [0.04, 0.04, 1.0, 0.0, 0.0, 0.0]}}
    cfgs["cornell_sggx"] = d
    return cfgs


def main(spp=1024):
    from mitsuba_tpu.models.integrators.aov import render_moments
    from mitsuba_tpu.utils.load import load_dict

    out_dir = os.path.join(os.path.dirname(__file__), "golden")
    os.makedirs(out_dir, exist_ok=True)
    force = "--force" in sys.argv
    for name, d in scene_configs().items():
        if not force and os.path.exists(
                os.path.join(out_dir, name + ".npz")):
            print(f"{name}: exists, skipping (--force to regenerate)")
            continue
        scene = load_dict(d)
        mean, m2 = render_moments(scene, scene.integrator, seed=1234,
                                  spp=spp)
        mean = np.asarray(mean)
        var = np.maximum(np.asarray(m2) - mean * mean, 0.0)
        np.savez_compressed(os.path.join(out_dir, name + ".npz"),
                            mean=mean, var=var, spp=spp)
        print(f"{name}: mean {mean.mean():.5f} var-mean {var.mean():.6f}")


if __name__ == "__main__":
    main()

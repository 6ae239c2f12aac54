"""AnimatedTransform + sensor motion blur (transform.h
AnimatedTransform; sensor.h shutter_open/shutter_open_time)."""
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.core.transform import AnimatedTransform


def test_animated_transform_interpolation():
    """Keyframe endpoints reproduced exactly; midpoint translation is
    the lerp; interpolated rotation stays orthonormal (slerp)."""
    m0 = np.asarray(tf.compose(tf.translate([0, 0, 0]),
                               tf.rotate([0, 0, 1], 0.0)), np.float32)
    m1 = np.asarray(tf.compose(tf.translate([2, 0, 0]),
                               tf.rotate([0, 0, 1], 90.0)), np.float32)
    at = AnimatedTransform.create([0.0, 1.0], [m0, m1])

    t = jnp.asarray([0.0, 0.5, 1.0])
    m = np.asarray(at.eval(t))
    assert np.allclose(m[0], m0, atol=1e-5)
    assert np.allclose(m[2], m1, atol=1e-5)
    assert np.allclose(m[1][:3, 3], [1.0, 0.0, 0.0], atol=1e-5)
    # slerp of a 90deg z-rotation at u=0.5 is the 45deg rotation
    r45 = np.asarray(tf.rotate([0, 0, 1], 45.0), np.float32)[:3, :3]
    assert np.allclose(m[1][:3, :3], r45, atol=1e-4)
    # orthonormality off the keyframes
    mm = np.asarray(at.eval(jnp.asarray([0.3])))[0][:3, :3]
    assert np.allclose(mm @ mm.T, np.eye(3), atol=1e-5)
    # clamping outside the time range
    mc = np.asarray(at.eval(jnp.asarray([-1.0, 7.0])))
    assert np.allclose(mc[0], m0, atol=1e-5)
    assert np.allclose(mc[1], m1, atol=1e-5)


def test_motion_blur_render():
    """A camera panning during the shutter interval smears the image
    along the pan axis; zero shutter time reproduces the static
    render exactly."""
    from mitsuba_tpu.utils.load import load_dict
    from mitsuba_tpu.utils.scenes import cornell_box_dict
    from mitsuba_tpu.models.integrators.common import render

    d0 = cornell_box_dict(width=24, height=24, spp=8)
    d0["integrator"] = {"type": "path", "max_depth": 3}
    sc_static = load_dict(d0)
    img_static = np.asarray(render(sc_static, sc_static.integrator,
                                   seed=0, spp=32))

    cam = d0["sensor"] if "sensor" in d0 else None
    # keyframes: the default cornell pose, panned slightly in x
    base_tw = np.asarray(sc_static.sensor.to_world, np.float32)
    tw1 = base_tw.copy()
    tw1[0, 3] += 0.25
    d = cornell_box_dict(width=24, height=24, spp=8)
    d["integrator"] = {"type": "path", "max_depth": 3}
    key = [k for k, v in d.items()
           if isinstance(v, dict) and v.get("type") == "perspective"]
    dcam = d[key[0]]
    dcam["animation"] = {"times": [0.0, 1.0],
                         "matrices": [base_tw, tw1]}
    dcam["shutter_open"] = 0.0
    dcam["shutter_open_time"] = 1.0
    sc_blur = load_dict(d)
    assert sc_blur.sensor.animation is not None
    img_blur = np.asarray(render(sc_blur, sc_blur.integrator,
                                 seed=0, spp=32))
    assert np.isfinite(img_blur).all()
    # blur preserves total flux approximately...
    assert abs(img_blur.mean() - img_static.mean()) \
        < 0.15 * img_static.mean()
    # ...but increases horizontal smear: gradient energy along x drops
    gx_s = np.abs(np.diff(img_static, axis=1)).mean()
    gx_b = np.abs(np.diff(img_blur, axis=1)).mean()
    assert gx_b < gx_s, (gx_b, gx_s)

    # zero shutter time with an animation pinned at t=0 == static
    dcam["shutter_open_time"] = 0.0
    sc0 = load_dict(d)
    img0 = np.asarray(render(sc0, sc0.integrator, seed=0, spp=32))
    assert np.allclose(img0, img_static, rtol=1e-5, atol=1e-6)

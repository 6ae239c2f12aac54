"""Tests for transforms and frames."""
import jax.numpy as jnp
import numpy as np

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.core.math import Frame, coordinate_system, normalize


def test_translate_scale_rotate():
    p = jnp.array([[1.0, 2.0, 3.0]])
    m = tf.translate([1.0, 0.0, -1.0])
    assert np.allclose(np.asarray(tf.apply_point(m, p)), [[2.0, 2.0, 2.0]])
    m = tf.scale([2.0, 3.0, 4.0])
    assert np.allclose(np.asarray(tf.apply_point(m, p)), [[2.0, 6.0, 12.0]])
    m = tf.rotate([0.0, 0.0, 1.0], 90.0)
    out = np.asarray(tf.apply_point(m, jnp.array([[1.0, 0.0, 0.0]])))
    assert np.allclose(out, [[0.0, 1.0, 0.0]], atol=1e-6)


def test_look_at():
    m = tf.look_at([0, 0, -5], [0, 0, 0], [0, 1, 0])
    # camera +z must point at target
    d = np.asarray(tf.apply_vector(m, jnp.array([[0.0, 0.0, 1.0]])))
    assert np.allclose(d, [[0, 0, 1]], atol=1e-6)
    o = np.asarray(tf.apply_point(m, jnp.array([[0.0, 0.0, 0.0]])))
    assert np.allclose(o, [[0, 0, -5]], atol=1e-6)


def test_normal_transform():
    # non-uniform scale: normals must use inverse transpose
    m = tf.scale([2.0, 1.0, 1.0])
    n = normalize(jnp.array([[1.0, 1.0, 0.0]]))
    t = jnp.array([[-1.0, 1.0, 0.0]])  # tangent to surface with that normal
    n2 = np.asarray(tf.apply_normal(m, n))
    t2 = np.asarray(tf.apply_vector(m, t))
    assert abs((n2 * t2).sum()) < 1e-6


def test_frame_roundtrip():
    n = normalize(jnp.array([[0.3, -0.4, 0.85], [0.0, 0.0, 1.0]]))
    f = Frame.from_normal(n)
    v = normalize(jnp.array([[0.5, 0.5, 0.7], [1.0, 0.0, 0.0]]))
    lv = Frame.to_local(f, v)
    wv = Frame.to_world(f, lv)
    assert np.allclose(np.asarray(wv), np.asarray(v), atol=1e-6)
    # orthonormality
    s, t, nn = f
    for a, b in [(s, t), (s, nn), (t, nn)]:
        assert np.allclose(np.asarray((a * b).sum(-1)), 0.0, atol=1e-6)


def test_perspective_projection():
    m = tf.perspective(90.0, 0.1, 100.0)
    inv = tf.inverse(m)
    # image-plane corner at z=near maps to x/y = +-1 for fov 90
    p = tf.apply_point(inv, jnp.array([[1.0, 1.0, 0.0]]))
    p = np.asarray(p)
    assert np.allclose(p[0, 2], 0.1, atol=1e-5)
    assert np.allclose(p[0, 0] / p[0, 2], 1.0, atol=1e-4)

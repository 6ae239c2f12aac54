"""SDF-grid shape: sphere tracing accuracy, rendering, and
differentiable level-set gradients."""
import numpy as np
import jax
import jax.numpy as jnp

from mitsuba_tpu.core import transform as tf
from mitsuba_tpu.models.sdf import SDFGrid, sphere_sdf_grid


def test_sphere_trace_accuracy():
    """Sphere-traced depth of a gridded sphere SDF matches the analytic
    sphere intersection to grid-resolution accuracy."""
    sdf = sphere_sdf_grid(radius=0.7, res=64, extent=1.2)
    n = 64
    # parallel rays along -z hitting the sphere at varying x
    x = jnp.linspace(-0.6, 0.6, n)
    o = jnp.stack([x, jnp.zeros(n), jnp.full((n,), 3.0)], -1)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    t, hit = sdf.ray_intersect(o, d, jnp.full((n,), 1e8),
                               jnp.ones((n,), bool))
    t_ref = 3.0 - jnp.sqrt(jnp.maximum(0.7 ** 2 - x ** 2, 0.0))
    h = np.asarray(hit)
    assert h.all()
    np.testing.assert_allclose(np.asarray(t)[h], np.asarray(t_ref)[h],
                               atol=5e-3)
    # normals point outward
    p = o + d * t[:, None]
    nrm = np.asarray(sdf.normal(p))
    ref = np.asarray(p / jnp.linalg.norm(p, axis=-1, keepdims=True))
    assert (np.abs(nrm - ref) < 0.03).all()


def test_sdf_misses():
    sdf = sphere_sdf_grid(radius=0.5, res=32, extent=1.0)
    o = jnp.asarray([[2.0, 2.0, 3.0]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    t, hit = sdf.ray_intersect(o, d, jnp.full((1,), 1e8),
                               jnp.ones((1,), bool))
    assert not bool(hit[0])


def _sdf_scene(offset=0.0):
    from mitsuba_tpu.utils.load import load_dict

    vals = np.asarray(sphere_sdf_grid(radius=0.6, res=32,
                                      extent=1.0).values) + offset
    return load_dict({
        "type": "scene",
        "blob": {"type": "sdfgrid", "data": vals,
                 "bbox_min": [-1, -1, -1], "bbox_max": [1, 1, 1],
                 "bsdf": {"type": "diffuse",
                          "reflectance": {"type": "rgb",
                                          "value": [0.7, 0.4, 0.2]}}},
        "light": {"type": "point", "position": [2, 3, 4],
                  "intensity": 30.0},
        "sensor": {
            "type": "perspective", "fov": 45,
            "to_world": np.asarray(
                tf.look_at([0, 0, 3], [0, 0, 0], [0, 1, 0]), np.float32),
            "film": {"width": 24, "height": 24,
                     "rfilter": {"type": "box"}},
            "sampler": {"type": "independent", "sample_count": 16},
        },
    })


def test_sdf_scene_renders():
    from mitsuba_tpu.models.integrators import DirectIntegrator, render

    img = np.asarray(render(_sdf_scene(), DirectIntegrator(), seed=0,
                            spp=16))
    assert np.isfinite(img).all()
    c = img[10:14, 10:14].mean()   # sphere center: lit
    corner = img[:3, :3].mean()    # off-sphere: black
    assert c > 10.0 * max(corner, 1e-6), (c, corner)


def test_sdf_level_set_gradient():
    """Adding a constant c to the SDF shrinks the sphere (radius - c);
    interior hit DEPTHS move accordingly.  The attach_point derivative
    must match finite differences on rays well inside the silhouette
    (for a unit-gradient sphere SDF and a frontal ray, d(depth)/dc =
    1/cos(theta) between ray and normal)."""
    from mitsuba_tpu.core.records import Ray

    base = _sdf_scene()
    n = 16
    x = jnp.linspace(-0.3, 0.3, n)   # well inside the r=0.6 silhouette
    o = jnp.stack([x, jnp.zeros(n), jnp.full((n,), 3.0)], -1)
    d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (n, 3))
    ray = Ray.make(o, d)

    def depth_of(c):
        sdf = base.scene_sdf.replace(values=base.scene_sdf.values + c)
        s = base.replace(scene_sdf=sdf)
        si = s.ray_intersect(ray, jnp.ones((n,), bool))
        return jnp.mean(si.t)

    g = float(jax.grad(depth_of)(jnp.asarray(0.0)))
    h = 0.005
    fd = (float(depth_of(jnp.asarray(h)))
          - float(depth_of(jnp.asarray(-h)))) / (2 * h)
    assert np.isfinite(g)
    assert abs(g - fd) < 0.08 * abs(fd) + 1e-3, (g, fd)
    # analytic: mean over rays of 1/cos(theta) ~ 1.03 for this bundle
    assert 0.9 < g < 1.25, g

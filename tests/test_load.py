"""Dict scene loader + mesh IO + bitmap IO tests (xml.cpp / obj.cpp /
ply.cpp / bitmap.cpp equivalents)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from mitsuba_tpu import load_dict, render, cornell_box, cornell_box_dict
from mitsuba_tpu.models.integrators import PathIntegrator
from mitsuba_tpu.utils.mesh_io import load_obj, load_ply
from mitsuba_tpu.utils.bitmap import read_image, write_image


def test_load_cornell_dict_matches_builder():
    """The dict-loaded Cornell box renders the same image as the direct
    builder (same geometry, materials, camera)."""
    scene_d = load_dict(cornell_box_dict(width=24, height=24, spp=8))
    scene_b = cornell_box(width=24, height=24)
    integ = PathIntegrator(max_depth=3, rr_depth=16)
    a = np.asarray(render(scene_d, integ, seed=0, spp=8))
    b = np.asarray(render(scene_b, integ, seed=0, spp=8))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_load_dict_integrator_and_spp_defaults():
    scene = load_dict(cornell_box_dict(width=8, height=8, spp=2))
    assert isinstance(scene.integrator, PathIntegrator)
    assert scene.integrator.max_depth == 8
    assert scene.sensor.sampler.sample_count == 2
    img = np.asarray(render(scene))  # defaults from the scene
    assert img.shape == (8, 8, 3) and np.isfinite(img).all()


def test_load_sphere_and_standalone_emitters():
    d = {
        "type": "scene",
        "integrator": {"type": "direct"},
        "sensor": {
            "type": "perspective",
            "fov": 40.0,
            "to_world": np.asarray(
                [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -4], [0, 0, 0, 1]],
                np.float32,
            ),
            "film": {"type": "hdrfilm", "width": 16, "height": 16,
                     "rfilter": {"type": "box"}},
        },
        "ball": {"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                 "bsdf": {"type": "diffuse"}},
        "sun": {"type": "constant", "radiance": 1.0},
    }
    scene = load_dict(d)
    img = np.asarray(render(scene, spp=16))
    assert np.isfinite(img).all() and img.max() > 0.1


def test_obj_roundtrip(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nvn 0 0 1\nvt 0 0\nvt 1 0\nvt 0 1\n"
        "f 1/1/1 2/2/1 3/3/1\n"
    )
    v, f, n, uv = load_obj(str(p))
    assert v.shape == (3, 3) and f.shape == (1, 3)
    assert n.shape == (3, 3) and uv.shape == (3, 2)
    np.testing.assert_allclose(n[0], [0, 0, 1])


def test_ply_ascii(tmp_path):
    p = tmp_path / "quad.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\n"
        "end_header\n0 0 0\n1 0 0\n1 1 0\n0 1 0\n4 0 1 2 3\n"
    )
    v, f, n, uv = load_ply(str(p))
    assert v.shape == (4, 3)
    assert f.shape == (2, 3)  # quad fan-triangulated


def test_png_roundtrip(tmp_path):
    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p = tmp_path / "t.png"
    write_image(str(p), img)
    back = read_image(str(p))
    np.testing.assert_allclose(back, img, atol=0.01)


def test_exr_roundtrip(tmp_path):
    try:
        import cv2  # noqa: F401
    except ImportError:
        pytest.skip("cv2 unavailable")
    os.environ["OPENCV_IO_ENABLE_OPENEXR"] = "1"
    img = np.random.default_rng(0).uniform(0, 4, (8, 8, 3)).astype(np.float32)
    p = tmp_path / "t.exr"
    try:
        write_image(str(p), img)
    except IOError:
        pytest.skip("cv2 built without EXR support")
    back = read_image(str(p))
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_serialized_roundtrip(tmp_path):
    """Mitsuba .serialized container: write -> load -> identical mesh."""
    import numpy as np
    from mitsuba_tpu.utils.mesh_io import load_serialized, write_serialized

    rng = np.random.default_rng(0)
    v = rng.random((10, 3)).astype(np.float32)
    f = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    n = rng.random((10, 3)).astype(np.float32)
    uv = rng.random((10, 2)).astype(np.float32)
    path = str(tmp_path / "test.serialized")
    write_serialized(path, [(v, f, n, uv), (v * 2.0, f, None, None)])

    v2, f2, n2, uv2 = load_serialized(path, 0)
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)
    np.testing.assert_allclose(n2, n)
    np.testing.assert_allclose(uv2, uv)
    v3, f3, n3, uv3 = load_serialized(path, 1)
    np.testing.assert_allclose(v3, v * 2.0)
    assert n3 is None and uv3 is None


def test_shapegroup_instance():
    import numpy as np
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.utils.load import load_dict

    scene = load_dict({
        "type": "scene",
        "grp": {"type": "shapegroup", "id": "grp",
                "box": {"type": "cube",
                        "to_world": np.asarray(tf.scale(0.2), np.float32),
                        "bsdf": {"type": "diffuse"}}},
        "i1": {"type": "instance", "shapegroup": {"type": "ref", "id": "grp"},
               "to_world": np.asarray(tf.translate([1, 0, 0]), np.float32)},
        "i2": {"type": "instance", "shapegroup": {"type": "ref", "id": "grp"},
               "to_world": np.asarray(tf.translate([-1, 0, 0]), np.float32)},
        "sensor": {"type": "perspective"},
    })
    # round 4 (true instancing): the 12-face cube is stored ONCE in an
    # InstancedGroup with two transforms — no flattened mesh copies
    # (ref instance.cpp / per-group Embree scenes)
    assert len(scene.instances) == 1
    g = scene.instances[0]
    assert g.n_inst == 2
    assert int(g.faces.shape[0]) == 12
    # group geometry is object-space; the transforms carry the offsets
    centers = np.asarray(g.to_world)[:, 0, 3]
    assert sorted(np.round(centers, 5).tolist()) == [-1.0, 1.0]
    # rays toward each instance hit the transformed cube surface
    import jax.numpy as jnp
    from mitsuba_tpu.core.records import Ray

    # off-center rays (an axis ray through y=z=0 grazes the cube
    # face's triangle-splitting diagonal — numerically degenerate)
    o = jnp.asarray([[0.0, 0.05, 0.03], [0.0, 0.05, 0.03]])
    d = jnp.asarray([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    si = scene.ray_intersect(Ray.make(o, d))
    np.testing.assert_allclose(np.asarray(si.t), [0.8, 0.8], atol=1e-5)
    assert np.asarray(si.inst_index).tolist() == [0, 1]
    np.testing.assert_allclose(np.asarray(si.n),
                               [[-1, 0, 0], [1, 0, 0]], atol=1e-5)
    # shadow query: the second maxt stops short of the cube
    hit = scene.ray_test(Ray.make(o, d, maxt=jnp.asarray([2.0, 0.5])))
    assert np.asarray(hit).tolist() == [True, False]


def test_emitter_sampling_weight():
    """Per-emitter sampling_weight drives the selection pmf
    (scene.cpp:100-115); defaults stay uniform."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.utils.load import load_dict

    base = {
        "type": "scene",
        "sensor": {"type": "perspective"},
        "l1": {"type": "point", "intensity": {"type": "rgb", "value": 1.0},
               "position": [0, 2, 0], "sampling_weight": 3.0},
        "l2": {"type": "point", "intensity": {"type": "rgb", "value": 1.0},
               "position": [2, 0, 0]},
        "floor": {"type": "rectangle", "bsdf": {"type": "diffuse"}},
    }
    sc = load_dict(base)
    pmf = np.asarray(sc.emitter_distr.eval_pmf_normalized(jnp.arange(2)))
    np.testing.assert_allclose(pmf.ravel()[:2], [0.75, 0.25], atol=1e-6)

    del base["l1"]["sampling_weight"]
    sc = load_dict(base)
    pmf = np.asarray(sc.emitter_distr.eval_pmf_normalized(jnp.arange(2)))
    np.testing.assert_allclose(pmf.ravel()[:2], [0.5, 0.5], atol=1e-6)


def test_vol_file_roundtrip_and_plugins(tmp_path, np_rng):
    """`.vol` container IO (volumegrid.cpp:99-183) + gridvolume loading
    into Volume3DTexture and GridMedium."""
    import numpy as np
    import jax.numpy as jnp
    from mitsuba_tpu.utils.volfile import read_vol, write_vol
    from mitsuba_tpu.utils.load import load_dict

    d = np_rng.uniform(0.0, 2.0, (6, 5, 4)).astype(np.float32)
    fn = str(tmp_path / "g.vol")
    write_vol(fn, d, bbox_min=[-1, -2, -3], bbox_max=[1, 2, 3])
    back, mn, mx = read_vol(fn)
    np.testing.assert_allclose(back[..., 0], d)
    np.testing.assert_allclose(mn, [-1, -2, -3])
    np.testing.assert_allclose(mx, [1, 2, 3])

    sc = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective"},
        "s": {"type": "rectangle",
              "bsdf": {"type": "diffuse",
                       "reflectance": {"type": "volume", "filename": fn}},
              "interior": {"type": "heterogeneous", "density": fn,
                           "phase": {"type": "isotropic"}}},
    })
    tex = sc.bsdfs[0].reflectance
    np.testing.assert_allclose(np.asarray(tex.data)[..., 0], d)
    np.testing.assert_allclose(np.asarray(tex.bbox_min), [-1, -2, -3])
    med = sc.scene_medium
    assert med is not None
    np.testing.assert_allclose(np.asarray(med.density), d)


def test_merge_shape_plugin():
    """merge.cpp analogue: same-material children fuse into one mesh."""
    import numpy as np
    from mitsuba_tpu.core import transform as tf
    from mitsuba_tpu.utils.load import load_dict

    sc = load_dict({
        "type": "scene",
        "sensor": {"type": "perspective"},
        "white": {"type": "diffuse", "id": "white"},
        "m": {"type": "merge",
              "a": {"type": "rectangle",
                    "to_world": np.asarray(tf.translate([1, 0, 0]),
                                           np.float32),
                    "bsdf": {"type": "ref", "id": "white"}},
              "b": {"type": "rectangle",
                    "to_world": np.asarray(tf.translate([-1, 0, 0]),
                                           np.float32),
                    "bsdf": {"type": "ref", "id": "white"}},
              "c": {"type": "cube",
                    "bsdf": {"type": "conductor"}}},
    })
    # two diffuse rectangles merged; the conductor cube stays separate
    sizes = sorted(int(m.faces.shape[0]) for m in sc.meshes)
    assert len(sc.meshes) == 2
    assert sizes == [4, 12]

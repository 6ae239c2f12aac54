"""Canonical test scenes.

``cornell_box()`` reproduces the reference's scene dictionary
(src/python/python/util.py:565 ``mi.cornell_box()``): same wall albedos,
light radiance, camera pose/fov, and box placement — built as triangle
meshes for the TPU scene layer.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core import transform as tf
from ..models.bsdfs import SmoothDiffuse, SmoothConductor, SmoothDielectric, CONDUCTOR_IOR
from ..models.emitters import AreaEmitter
from ..models.film import Film, ReconstructionFilter
from ..models.scene import make_scene
from ..models.sensors import PerspectiveCamera
from ..models.shapes import Mesh, cube, rectangle
from ..models.textures import ConstantTexture


def _np(m):
    return np.asarray(m, np.float32)


def cornell_box(width: int = 256, height: int = 256, rfilter=None,
                small_box_bsdf: int | None = None,
                large_box_bsdf: int | None = None,
                use_bvh=None):
    """Cornell box Scene (reference util.py:565 parameters).

    ``small_box_bsdf``/``large_box_bsdf`` optionally override the boxes'
    material index (e.g. to a conductor/dielectric for BASELINE config 2).
    """
    T = lambda *ms: _np(tf.compose(*ms))

    white = SmoothDiffuse(
        reflectance=ConstantTexture(jnp.asarray([0.885809, 0.698859, 0.666422]))
    )
    green = SmoothDiffuse(
        reflectance=ConstantTexture(jnp.asarray([0.105421, 0.37798, 0.076425]))
    )
    red = SmoothDiffuse(
        reflectance=ConstantTexture(jnp.asarray([0.570068, 0.0430135, 0.0443706]))
    )
    bsdfs = [white, green, red]
    W, G, R = 0, 1, 2
    if small_box_bsdf is None:
        small_box_bsdf = W
    if large_box_bsdf is None:
        large_box_bsdf = W

    light_emitter = AreaEmitter(
        radiance=ConstantTexture(jnp.asarray([18.387, 13.9873, 6.75357]))
    )

    def mesh(gen, to_world, bsdf, emitter=-1, id=""):
        v, f, n, uv = gen(to_world)
        # flat shading for the box geometry: drop vertex normals
        return Mesh.make(v, f, normals=None, uvs=uv, bsdf_index=bsdf,
                         emitter_index=emitter, id=id)

    meshes = [
        mesh(rectangle,
             T(tf.translate([0.0, 0.99, 0.01]), tf.rotate([1, 0, 0], 90),
               tf.scale([0.23, 0.19, 0.19])),
             W, emitter=0, id="light"),
        mesh(rectangle,
             T(tf.translate([0.0, -1.0, 0.0]), tf.rotate([1, 0, 0], -90)),
             W, id="floor"),
        mesh(rectangle,
             T(tf.translate([0.0, 1.0, 0.0]), tf.rotate([1, 0, 0], 90)),
             W, id="ceiling"),
        mesh(rectangle, T(tf.translate([0.0, 0.0, -1.0])), W, id="back"),
        mesh(rectangle,
             T(tf.translate([1.0, 0.0, 0.0]), tf.rotate([0, 1, 0], -90)),
             G, id="green-wall"),
        mesh(rectangle,
             T(tf.translate([-1.0, 0.0, 0.0]), tf.rotate([0, 1, 0], 90)),
             R, id="red-wall"),
        mesh(cube,
             T(tf.translate([0.335, -0.7, 0.38]), tf.rotate([0, 1, 0], -17),
               tf.scale(0.3)),
             small_box_bsdf, id="small-box"),
        mesh(cube,
             T(tf.translate([-0.33, -0.4, -0.28]), tf.rotate([0, 1, 0], 18.25),
               tf.scale([0.3, 0.61, 0.3])),
             large_box_bsdf, id="large-box"),
    ]

    film = Film(width=width, height=height,
                rfilter=rfilter or ReconstructionFilter.gaussian())
    sensor = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 3.90], [0, 0, 0], [0, 1, 0])),
        film=film,
        fov=39.3077,
        fov_axis="smaller",
        near_clip=0.001,
        far_clip=100.0,
    )

    return make_scene(meshes, bsdfs, [light_emitter], sensor, use_bvh=use_bvh)


def cornell_box_dict(width: int = 256, height: int = 256, spp: int = 64):
    """The reference's scene dictionary verbatim (util.py:565), consumable
    by load_dict — exercises the dict-loader path end to end."""
    _t = lambda *ms: np.asarray(tf.compose(*ms), np.float32)
    rgb = lambda v: {"type": "rgb", "value": v}
    return {
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 8},
        "sensor": {
            "type": "perspective",
            "fov_axis": "smaller",
            "near_clip": 0.001,
            "far_clip": 100.0,
            "fov": 39.3077,
            "to_world": _t(tf.look_at([0, 0, 3.90], [0, 0, 0], [0, 1, 0])),
            "sampler": {"type": "independent", "sample_count": spp},
            "film": {"type": "hdrfilm", "width": width, "height": height,
                     "rfilter": {"type": "gaussian"}},
        },
        "white": {"type": "diffuse",
                  "reflectance": rgb([0.885809, 0.698859, 0.666422])},
        "green": {"type": "diffuse",
                  "reflectance": rgb([0.105421, 0.37798, 0.076425])},
        "red": {"type": "diffuse",
                "reflectance": rgb([0.570068, 0.0430135, 0.0443706])},
        "light": {
            "type": "rectangle",
            "to_world": _t(tf.translate([0.0, 0.99, 0.01]),
                           tf.rotate([1, 0, 0], 90),
                           tf.scale([0.23, 0.19, 0.19])),
            "bsdf": {"type": "ref", "id": "white"},
            "emitter": {"type": "area",
                        "radiance": rgb([18.387, 13.9873, 6.75357])},
        },
        "floor": {"type": "rectangle",
                  "to_world": _t(tf.translate([0.0, -1.0, 0.0]),
                                 tf.rotate([1, 0, 0], -90)),
                  "bsdf": {"type": "ref", "id": "white"}},
        "ceiling": {"type": "rectangle",
                    "to_world": _t(tf.translate([0.0, 1.0, 0.0]),
                                   tf.rotate([1, 0, 0], 90)),
                    "bsdf": {"type": "ref", "id": "white"}},
        "back": {"type": "rectangle",
                 "to_world": _t(tf.translate([0.0, 0.0, -1.0])),
                 "bsdf": {"type": "ref", "id": "white"}},
        "green-wall": {"type": "rectangle",
                       "to_world": _t(tf.translate([1.0, 0.0, 0.0]),
                                      tf.rotate([0, 1, 0], -90)),
                       "bsdf": {"type": "ref", "id": "green"}},
        "red-wall": {"type": "rectangle",
                     "to_world": _t(tf.translate([-1.0, 0.0, 0.0]),
                                    tf.rotate([0, 1, 0], 90)),
                     "bsdf": {"type": "ref", "id": "red"}},
        "small-box": {"type": "cube",
                      "to_world": _t(tf.translate([0.335, -0.7, 0.38]),
                                     tf.rotate([0, 1, 0], -17),
                                     tf.scale(0.3)),
                      "bsdf": {"type": "ref", "id": "white"}},
        "large-box": {"type": "cube",
                      "to_world": _t(tf.translate([-0.33, -0.4, -0.28]),
                                     tf.rotate([0, 1, 0], 18.25),
                                     tf.scale([0.3, 0.61, 0.3])),
                      "bsdf": {"type": "ref", "id": "white"}},
    }


def single_emitter_plane(width: int = 64, height: int = 64):
    """A diffuse floor lit by an area light — small analytic sanity scene."""
    white = SmoothDiffuse(reflectance=ConstantTexture(jnp.asarray([0.5, 0.5, 0.5])))
    em = AreaEmitter(radiance=ConstantTexture(jnp.asarray([1.0, 1.0, 1.0])))
    floor = Mesh.make(
        *rectangle(_np(tf.compose(tf.translate([0, -1, 0]),
                                  tf.rotate([1, 0, 0], -90)))),
        bsdf_index=0, id="floor",
    )
    light = Mesh.make(
        *rectangle(_np(tf.compose(tf.translate([0, 1, 0]),
                                  tf.rotate([1, 0, 0], 90),
                                  tf.scale(0.5)))),
        bsdf_index=0, emitter_index=0, id="light",
    )
    film = Film(width=width, height=height,
                rfilter=ReconstructionFilter.box())
    sensor = PerspectiveCamera(
        to_world=jnp.asarray(tf.look_at([0, 0, 3.0], [0, 0, 0], [0, 1, 0])),
        film=film, fov=45.0,
    )
    return make_scene([floor, light], [white], [em], sensor)

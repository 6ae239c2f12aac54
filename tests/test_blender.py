"""Blender in-memory mesh decoding (utils/blender_mesh.py vs the
reference's src/shapes/blender.cpp exporter protocol).

The tests synthesize the exact binary buffers the Blender exporter
passes (MVert/MLoop/MLoopTri/MPoly structs for 2.x-3.4, plain int/f32
buffers for 3.6+), covering: version layouts, material-slot splitting,
smooth/flat vertex duplication, the v-flip on UVs, sRGB vertex colors,
and the raw-pointer (address int) path.
"""
import ctypes

import numpy as np
import pytest

from mitsuba_tpu.utils.blender_mesh import (
    _MLOOP,
    _MLOOPCOL,
    _MLOOPTRI,
    _MPOLY,
    _MVERT2,
    load_blender_mesh,
)


def _quad_mesh_36(smooth=True, two_mats=False):
    """Unit quad (two triangles) in Blender 3.6 buffer form."""
    verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                     np.float32)
    normals = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    loops = np.array([0, 1, 2, 0, 2, 3], np.int32)       # two tris
    loop_tris = np.array([[0, 1, 2], [3, 4, 5]], np.uint32)
    tri_face = np.array([0, 1], np.int32)
    sharp = None if smooth else np.array([True, True], np.bool_)
    uvs = np.array([[0, 0], [1, 0], [1, 1],
                    [0, 0], [1, 1], [0, 1]], np.float32)
    mat_indices = (np.array([0, 1], np.int32) if two_mats
                   else np.array([0, 0], np.int32))
    return dict(
        name="quad", version="3.6.2", mat_nr=0,
        vert_count=4, loop_tri_count=2, loop_count=6, poly_count=2,
        loops=loops, loop_tris=loop_tris, polys=tri_face,
        verts=verts, normals=normals, uvs=uvs,
        sharp_face=sharp, mat_indices=mat_indices,
    )


def test_v36_smooth_quad_dedups_shared_vertices():
    v, f, n, uv, cols = load_blender_mesh(_quad_mesh_36(smooth=True))
    # smooth quad: the two shared corners dedup -> 4 vertices, 2 tris
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert n is not None and np.allclose(n, [0, 0, 1])
    assert uv.shape == (4, 2)
    # area check: the two triangles tile the unit square
    p = v[f]
    area = 0.5 * np.abs(np.cross(p[:, 1] - p[:, 0],
                                 p[:, 2] - p[:, 0])[:, 2]).sum()
    assert np.isclose(area, 1.0)
    # v-flip applied (blender.cpp:366)
    src_uv = {(0.0, 1.0), (1.0, 1.0), (1.0, 0.0), (0.0, 0.0)}
    assert set(map(tuple, np.round(uv, 6))) == src_uv


def test_v36_flat_quad_is_globally_flat():
    v, f, n, uv, cols = load_blender_mesh(_quad_mesh_36(smooth=False))
    # all faces sharp -> globally flat: no normal buffer, no duplication
    assert n is None
    assert v.shape[0] == 4 and f.shape == (2, 3)


def test_v36_material_split():
    d = _quad_mesh_36(two_mats=True)
    v0, f0, *_ = load_blender_mesh(dict(d, mat_nr=0))
    v1, f1, *_ = load_blender_mesh(dict(d, mat_nr=1))
    assert f0.shape == (1, 3) and f1.shape == (1, 3)
    assert v0.shape == (3, 3) and v1.shape == (3, 3)


def test_v36_to_world():
    d = _quad_mesh_36()
    w = np.eye(4, dtype=np.float32)
    w[:3, 3] = [10.0, 0.0, 0.0]
    w[0, 0] = 2.0
    v, f, n, uv, _ = load_blender_mesh(dict(d, to_world=w))
    assert np.isclose(v[:, 0].min(), 10.0) and np.isclose(
        v[:, 0].max(), 12.0)
    assert np.allclose(n, [0, 0, 1], atol=1e-6)


def _quad_mesh_2x(smooth=True):
    """Same quad as Blender 2.9x structs (short normals, MLoop/MPoly)."""
    mv = np.zeros(4, _MVERT2)
    mv["co"] = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    mv["no"] = [[0, 0, 32767]] * 4
    ml = np.zeros(6, _MLOOP)
    ml["v"] = [0, 1, 2, 0, 2, 3]
    mlt = np.zeros(2, _MLOOPTRI)
    mlt["tri"] = [[0, 1, 2], [3, 4, 5]]
    mlt["poly"] = [0, 1]
    mp = np.zeros(2, _MPOLY)
    mp["flag"] = 1 if smooth else 0     # ME_SMOOTH
    mp["mat_nr"] = [0, 0]
    uv = np.zeros(6, np.dtype([("uv", np.float32, 2),
                               ("flag", np.int32)]))
    uv["uv"] = [[0, 0], [1, 0], [1, 1], [0, 0], [1, 1], [0, 1]]
    col = np.zeros(6, _MLOOPCOL)
    col["r"] = 255
    col["a"] = 255
    return dict(
        name="quad2x", version="2.93.0", mat_nr=0,
        vert_count=4, loop_tri_count=2, loop_count=6, poly_count=2,
        loops=ml, loop_tris=mlt, polys=mp, verts=mv, uvs=uv,
        vertex_Col=col,
    )


def test_v2x_struct_layout_and_colors():
    v, f, n, uv, cols = load_blender_mesh(_quad_mesh_2x(smooth=True))
    assert v.shape == (4, 3) and f.shape == (2, 3)
    assert np.allclose(n, [0, 0, 1], atol=1e-4)   # short-decoded
    assert "Col" in cols and cols["Col"].shape == (4, 3)
    # sRGB 255 -> linear 1.0, 0 -> 0
    assert np.allclose(cols["Col"][:, 0], 1.0)
    assert np.allclose(cols["Col"][:, 1:], 0.0)


def test_v2x_flat_duplicates_per_face():
    d = _quad_mesh_2x(smooth=False)
    # one smooth + one flat face -> NOT globally flat; the flat face's
    # corners key by face id, the smooth one's by normal
    mp = d["polys"].copy()
    mp["flag"] = [1, 0]
    d["polys"] = mp
    v, f, n, uv, _ = load_blender_mesh(d)
    assert n is not None
    # the shared edge corners split between the smooth and flat face
    assert v.shape[0] == 6 and f.shape == (2, 3)


def test_raw_pointer_protocol():
    """Buffers passed as raw addresses (the exporter's int64 pointers,
    blender.cpp:123-161)."""
    d = _quad_mesh_36(smooth=True)
    keep_alive = []

    def addr(a):
        a = np.ascontiguousarray(a)
        keep_alive.append(a)
        return a.ctypes.data

    d2 = dict(d)
    for k in ("loops", "loop_tris", "polys", "verts", "normals", "uvs",
              "mat_indices"):
        d2[k] = addr(d[k])
    v, f, n, uv, _ = load_blender_mesh(d2)
    v_ref, f_ref, n_ref, uv_ref, _ = load_blender_mesh(d)
    assert np.allclose(v, v_ref) and (f == f_ref).all()
    assert np.allclose(uv, uv_ref)


def test_loader_registry():
    """'blender' shape type reachable through load_dict scenes."""
    from mitsuba_tpu.utils.load import load_dict

    d = _quad_mesh_36(smooth=True)
    scene = load_dict({
        "type": "scene",
        "integrator": {"type": "path", "max_depth": 2},
        "sensor": {
            "type": "perspective", "fov": 45,
            "film": {"type": "hdrfilm", "width": 8, "height": 8},
        },
        "light": {"type": "constant", "radiance": 1.0},
        "quad": {**d, "type": "blender",
                 "bsdf": {"type": "diffuse"}},
    })
    m = scene.meshes[0]
    assert m.vertices.shape == (4, 3) and m.faces.shape == (2, 3)

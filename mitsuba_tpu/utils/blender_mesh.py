"""Blender mesh loader — TPU-native equivalent of the reference's
``blender`` shape plugin (src/shapes/blender.cpp:60-444), used by the
mitsuba-blender exporter add-on: it converts Blender's IN-MEMORY mesh
buffers (passed as raw pointers + counts through Properties) into the
renderer's mesh layout, splitting by material slot and deduplicating
per-corner vertices.

Faithful version handling (blender.cpp:121-141, 265-296):

=========  =========================================================
Blender    layout
=========  =========================================================
2.x - 3.0  verts = MVert{co f32[3], no i16[3], flag, bweight} (short
           normals / 32767); loops = MLoop{v, e u32}; loop_tris =
           MLoopTri{tri u32[3], poly u32}; polys = MPoly{loopstart,
           totloop i32, mat_nr i16, flag i8 (ME_SMOOTH=1), pad}
3.1 - 3.4  verts = {co f32[3], flag, bweight, pad2} (16 B); normals
           in a separate f32[3] buffer; >=3.4 material ids come from
           the ``mat_indices`` int buffer
3.5        verts = plain f32[3]; uvs plain f32[2]
3.6+       loops/loop_tris/polys are plain int buffers; per-face
           ``sharp_face`` bool buffer replaces the ME_SMOOTH flag
           (``polys`` maps tri -> face)
=========  =========================================================

The whole decode is vectorized numpy (no per-triangle Python loop —
the C++ hash-map dedup becomes one np.unique over packed corner keys:
a corner's identity is (vertex id, smooth ? normal : face id, uv),
blender.cpp:216-231).  Buffers may be raw addresses (ints, the
exporter protocol) or anything np.frombuffer accepts.
"""
from __future__ import annotations

import ctypes

import numpy as np

ME_SMOOTH = 1

_MVERT2 = np.dtype([("co", np.float32, 3), ("no", np.int16, 3),
                    ("flag", np.int8), ("bweight", np.int8)])
_MVERT3 = np.dtype([("co", np.float32, 3), ("flag", np.int8),
                    ("bweight", np.int8), ("pad", np.int8, 2)])
_MLOOP = np.dtype([("v", np.uint32), ("e", np.uint32)])
_MLOOPTRI = np.dtype([("tri", np.uint32, 3), ("poly", np.uint32)])
_MLOOPUV = np.dtype([("uv", np.float32, 2), ("flag", np.int32)])
_MLOOPCOL = np.dtype([("r", np.uint8), ("g", np.uint8),
                      ("b", np.uint8), ("a", np.uint8)])
_MPOLY = np.dtype([("loopstart", np.int32), ("totloop", np.int32),
                   ("mat_nr", np.int16), ("flag", np.int8),
                   ("pad", np.int8)])


def _version(v) -> tuple:
    if isinstance(v, (tuple, list)):
        return tuple(int(x) for x in v)
    return tuple(int(x) for x in str(v).split(".")[:3])


def _buf(src, dtype, count):
    """View ``count`` items of ``dtype`` at ``src`` (a raw address int,
    bytes, or array-like)."""
    if src is None:
        return None
    dtype = np.dtype(dtype)
    if isinstance(src, int):
        raw = (ctypes.c_char * (dtype.itemsize * count)).from_address(src)
        return np.frombuffer(raw, dtype=dtype, count=count)
    if isinstance(src, (bytes, bytearray, memoryview)):
        return np.frombuffer(src, dtype=dtype, count=count)
    a = np.asarray(src)
    if a.dtype == dtype and a.size >= count:
        return a.reshape(-1)[:count] if a.ndim != 1 else a[:count]
    return np.frombuffer(np.ascontiguousarray(a).tobytes(),
                         dtype=dtype, count=count)


def _srgb_to_linear(c):
    return np.where(c <= 0.04045, c / 12.92,
                    ((c + 0.055) / 1.055) ** 2.4).astype(np.float32)


def load_blender_mesh(props: dict):
    """Decode one material slot of a Blender mesh.

    Required props (blender.cpp:108): name, version, mat_nr,
    vert_count, loop_tri_count, loops, loop_tris, polys, verts.
    Optional: normals (3.1+), uvs, mat_indices (3.4+), sharp_face
    (3.6+), loop_count/poly_count (buffer lengths when pointers are
    raw addresses), vertex_<name> color layers, to_world (4x4).

    Returns (vertices (V,3) f32 world-space, faces (F,3) i32,
    normals (V,3) | None [None = globally flat shaded], uvs (V,2) |
    None, colors {name: (V,3) linear f32}).
    """
    for k in ("name", "version", "mat_nr", "vert_count",
              "loop_tri_count", "loops", "loop_tris", "polys", "verts"):
        if k not in props:
            raise ValueError(
                f"blender mesh {props.get('name', '?')!r}: "
                f"missing property {k!r}")
    ver = _version(props["version"])
    mat_nr = int(props["mat_nr"])
    V = int(props["vert_count"])
    T = int(props["loop_tri_count"])
    n_loops = int(props.get("loop_count", 3 * T))
    n_polys = int(props.get("poly_count", T))

    # ---- per-version buffer decode -------------------------------
    if ver >= (3, 6, 0):
        loops_v = _buf(props["loops"], np.int32, n_loops)
        tri_loops = _buf(props["loop_tris"], np.uint32,
                         3 * T).reshape(T, 3).astype(np.int64)
        tri_face = _buf(props["polys"], np.int32, T).astype(np.int64)
        sharp = (_buf(props.get("sharp_face"), np.bool_, n_polys)
                 if props.get("sharp_face") is not None else None)
        smooth_face = (np.ones(T, bool) if sharp is None
                       else ~np.asarray(sharp)[tri_face])
        poly_mat = (_buf(props.get("mat_indices"), np.int32, n_polys)
                    if props.get("mat_indices") is not None else None)
        tri_mat = (poly_mat[tri_face] if poly_mat is not None
                   else np.zeros(T, np.int32))
    else:
        ml = _buf(props["loops"], _MLOOP, n_loops)
        loops_v = ml["v"].astype(np.int64)
        mlt = _buf(props["loop_tris"], _MLOOPTRI, T)
        tri_loops = mlt["tri"].astype(np.int64)
        tri_face = mlt["poly"].astype(np.int64)
        polys = _buf(props["polys"], _MPOLY, n_polys)
        smooth_face = (polys["flag"][tri_face] & ME_SMOOTH) != 0
        if ver >= (3, 4, 0) and props.get("mat_indices") is not None:
            tri_mat = _buf(props["mat_indices"], np.int32,
                           n_polys)[tri_face]
        else:
            tri_mat = polys["mat_nr"][tri_face].astype(np.int32)

    if ver <= (3, 0, 99):
        mv = _buf(props["verts"], _MVERT2, V)
        co = mv["co"].astype(np.float32)
        vnormals = mv["no"].astype(np.float32) / 32767.0
    elif ver < (3, 5, 0):
        mv = _buf(props["verts"], _MVERT3, V)
        co = mv["co"].astype(np.float32)
        vnormals = _buf(props["normals"], np.float32,
                        3 * V).reshape(V, 3)
    else:
        co = _buf(props["verts"], np.float32, 3 * V).reshape(V, 3)
        vnormals = (_buf(props.get("normals"), np.float32,
                         3 * V).reshape(V, 3)
                    if props.get("normals") is not None else None)

    uv_src = props.get("uvs")
    if uv_src is not None:
        if ver < (3, 5, 0):
            uv_loop = _buf(uv_src, _MLOOPUV, n_loops)["uv"].astype(
                np.float32)
        else:
            uv_loop = _buf(uv_src, np.float32,
                           2 * n_loops).reshape(n_loops, 2)
        uv_loop = np.stack([uv_loop[:, 0], 1.0 - uv_loop[:, 1]], axis=1)
    else:
        uv_loop = None

    col_layers = {
        k[len("vertex_"):]: _buf(v, _MLOOPCOL, n_loops)
        for k, v in props.items() if k.startswith("vertex_")
    }

    # ---- material filter (blender.cpp:246-259) -------------------
    keep = tri_mat == mat_nr
    tri_loops = tri_loops[keep]
    tri_face = tri_face[keep]
    smooth_face = smooth_face[keep]
    T = tri_loops.shape[0]
    if T == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32),
                None, None, {})

    # globally flat when no kept face is smooth (blender.cpp:165-186)
    face_normals_mode = not bool(smooth_face.any())

    corner_loop = tri_loops.reshape(-1)               # (3T,)
    corner_vert = loops_v[corner_loop]
    corner_smooth = np.repeat(smooth_face, 3)
    corner_face = np.repeat(tri_face, 3)

    p0 = co[loops_v[tri_loops[:, 0]]]
    e1 = co[loops_v[tri_loops[:, 1]]] - p0
    e2 = co[loops_v[tri_loops[:, 2]]] - p0
    fn = np.cross(e1, e2)
    fn_len = np.linalg.norm(fn, axis=1, keepdims=True)
    degenerate_flat = ((fn_len[:, 0] == 0.0) & ~smooth_face
                       & (not face_normals_mode))
    fn = fn / np.maximum(fn_len, 1e-30)

    # per-corner shading normal: vertex normal for smooth faces (or a
    # globally flat mesh), face normal otherwise (blender.cpp:303-357)
    if vnormals is None:
        vn_corner = np.repeat(fn, 3, axis=0)
    else:
        vn = vnormals / np.maximum(
            np.linalg.norm(vnormals, axis=1, keepdims=True), 1e-30)
        vn_corner = np.where(
            (corner_smooth | face_normals_mode)[:, None],
            vn[corner_vert], np.repeat(fn, 3, axis=0))

    # ---- dedup: np.unique over packed corner keys ----------------
    # a globally-flat mesh still keys by vertex normal like smooth
    # corners do (blender.cpp:336 "smooth_face || m_face_normals")
    uv_corner = (uv_loop[corner_loop] if uv_loop is not None
                 else np.zeros((3 * T, 2), np.float32))
    smooth_like = corner_smooth | face_normals_mode
    flat_key = np.where(smooth_like, -1, corner_face)
    nrm_key = np.where(smooth_like[:, None],
                       vn_corner.astype(np.float32).view(np.int32),
                       0).astype(np.int64)
    key = np.stack([
        corner_vert.astype(np.int64),
        flat_key.astype(np.int64),
        nrm_key[:, 0], nrm_key[:, 1], nrm_key[:, 2],
        uv_corner[:, 0].astype(np.float32).view(np.int32).astype(
            np.int64),
        uv_corner[:, 1].astype(np.float32).view(np.int32).astype(
            np.int64),
    ], axis=1)
    _, first_idx, inverse = np.unique(
        key, axis=0, return_index=True, return_inverse=True)

    faces = inverse.reshape(T, 3).astype(np.int32)
    keep_tri = ~degenerate_flat
    faces = faces[keep_tri]

    verts_out = co[corner_vert[first_idx]].astype(np.float32)
    normals_out = (None if face_normals_mode
                   else vn_corner[first_idx].astype(np.float32))
    uvs_out = (uv_corner[first_idx].astype(np.float32)
               if uv_loop is not None else None)
    colors = {}
    for name, layer in col_layers.items():
        rgb = np.stack([layer["r"], layer["g"], layer["b"]],
                       axis=1).astype(np.float32) / 255.0
        colors[name] = _srgb_to_linear(rgb[corner_loop][first_idx])

    w = props.get("to_world")
    if w is not None:
        w = np.asarray(w, np.float32)
        verts_out = verts_out @ w[:3, :3].T + w[:3, 3]
        if normals_out is not None:
            ninv = np.linalg.inv(w[:3, :3]).T
            normals_out = normals_out @ ninv.T
            normals_out = normals_out / np.maximum(np.linalg.norm(
                normals_out, axis=1, keepdims=True), 1e-30)
    return verts_out, faces, normals_out, uvs_out, colors

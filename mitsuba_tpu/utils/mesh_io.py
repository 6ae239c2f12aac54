"""Triangle-mesh file loaders: OBJ and PLY.

Reference: src/shapes/obj.cpp (416 LoC), src/shapes/ply.cpp (851 LoC).
Host-side numpy parsing; quads are triangulated fan-style like the
reference's face parser.
"""
from __future__ import annotations

import struct

import numpy as np


def load_obj(path):
    """Wavefront OBJ: v/vn/vt + polygonal f with v, v/vt, v//vn, v/vt/vn."""
    vs, vns, vts = [], [], []
    f_v, f_vt, f_vn = [], [], []
    with open(path, "r", errors="replace") as fh:
        for line in fh:
            if line.startswith("v "):
                vs.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vn "):
                vns.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                vts.append([float(x) for x in line.split()[1:3]])
            elif line.startswith("f "):
                toks = line.split()[1:]
                idx = []
                for t in toks:
                    parts = t.split("/")
                    vi = int(parts[0])
                    ti = int(parts[1]) if len(parts) > 1 and parts[1] else 0
                    ni = int(parts[2]) if len(parts) > 2 and parts[2] else 0
                    idx.append((vi, ti, ni))
                # fan triangulation of polygons (obj.cpp behavior)
                for k in range(1, len(idx) - 1):
                    for (vi, ti, ni) in (idx[0], idx[k], idx[k + 1]):
                        f_v.append(vi)
                        f_vt.append(ti)
                        f_vn.append(ni)

    v = np.asarray(vs, np.float32)
    fv = np.asarray(f_v, np.int64)
    fv = np.where(fv > 0, fv - 1, len(vs) + fv)  # negative = relative

    n_corner = None
    if vns and any(f_vn):
        fn = np.asarray(f_vn, np.int64)
        fn = np.where(fn > 0, fn - 1, len(vns) + fn)
        n_corner = np.asarray(vns, np.float32)[fn]
    uv_corner = None
    if vts and any(f_vt):
        ft = np.asarray(f_vt, np.int64)
        ft = np.where(ft > 0, ft - 1, len(vts) + ft)
        uv_corner = np.asarray(vts, np.float32)[ft]

    # If normals/uvs are per-corner with differing indices, expand to
    # unshared vertices (the reference re-indexes similarly).
    if n_corner is not None or uv_corner is not None:
        nv = fv.shape[0]
        verts = v[fv]
        faces = np.arange(nv, dtype=np.int32).reshape(-1, 3)
        return (
            verts.astype(np.float32),
            faces,
            None if n_corner is None else n_corner.astype(np.float32),
            None if uv_corner is None else uv_corner.astype(np.float32),
        )
    return v, fv.reshape(-1, 3).astype(np.int32), None, None


def load_ply(path):
    """PLY: ascii 1.0 and binary_little_endian 1.0; x/y/z [+nx/ny/nz u/v]."""
    with open(path, "rb") as fh:
        header = []
        while True:
            line = fh.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        fmt = next(l.split()[1] for l in header if l.startswith("format"))
        elements = []  # (name, count, [(type, prop)...])
        for line in header:
            t = line.split()
            if not t:
                continue
            if t[0] == "element":
                elements.append((t[1], int(t[2]), []))
            elif t[0] == "property":
                if t[1] == "list":
                    elements[-1][2].append((("list", t[2], t[3]), t[4]))
                else:
                    elements[-1][2].append((t[1], t[2]))

        sizes = {"char": "b", "uchar": "B", "short": "h", "ushort": "H",
                 "int": "i", "uint": "I", "int8": "b", "uint8": "B",
                 "int16": "h", "uint16": "H", "int32": "i", "uint32": "I",
                 "float": "f", "double": "d", "float32": "f", "float64": "d"}

        verts = normals = uvs = None
        faces = []
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [fh.readline().split() for _ in range(count)]
                if name == "vertex":
                    names = [p[1] for p in props]
                    arr = np.asarray(rows, np.float32)
                    verts = arr[:, [names.index(c) for c in "xyz"]]
                    if all(c in names for c in ("nx", "ny", "nz")):
                        normals = arr[:, [names.index(c)
                                          for c in ("nx", "ny", "nz")]]
                    if all(c in names for c in ("u", "v")):
                        uvs = arr[:, [names.index(c) for c in ("u", "v")]]
                elif name == "face":
                    for r in rows:
                        k = int(r[0])
                        poly = [int(x) for x in r[1:1 + k]]
                        for j in range(1, k - 1):
                            faces.append([poly[0], poly[j], poly[j + 1]])
            else:  # binary_little_endian
                if name == "vertex":
                    codes = "".join(sizes[p[0]] for p in props)
                    names = [p[1] for p in props]
                    rec = struct.Struct("<" + codes)
                    data = fh.read(rec.size * count)
                    arr = np.asarray(
                        [rec.unpack_from(data, i * rec.size)
                         for i in range(count)], np.float32)
                    verts = arr[:, [names.index(c) for c in "xyz"]]
                    if all(c in names for c in ("nx", "ny", "nz")):
                        normals = arr[:, [names.index(c)
                                          for c in ("nx", "ny", "nz")]]
                    if all(c in names for c in ("u", "v")):
                        uvs = arr[:, [names.index(c) for c in ("u", "v")]]
                elif name == "face":
                    (cnt_t, idx_t, _), _pname = props[0]if isinstance(
                        props[0][0], tuple) else (props[0][0], props[0][1])
                    # props[0] is (("list", cnt, idx), name)
                    lst = props[0][0]
                    cnt_c, idx_c = sizes[lst[1]], sizes[lst[2]]
                    cnt_s = struct.calcsize(cnt_c)
                    idx_s = struct.calcsize(idx_c)
                    for _ in range(count):
                        (k,) = struct.unpack("<" + cnt_c, fh.read(cnt_s))
                        poly = struct.unpack("<" + idx_c * k,
                                             fh.read(idx_s * k))
                        for j in range(1, k - 1):
                            faces.append([poly[0], poly[j], poly[j + 1]])
        return (
            verts.astype(np.float32),
            np.asarray(faces, np.int32),
            None if normals is None else normals.astype(np.float32),
            None if uvs is None else uvs.astype(np.float32),
        )


def load_mesh_file(path):
    p = str(path)
    if p.lower().endswith(".obj"):
        return load_obj(p)
    if p.lower().endswith(".ply"):
        return load_ply(p)
    raise ValueError(f"unsupported mesh format: {p}")

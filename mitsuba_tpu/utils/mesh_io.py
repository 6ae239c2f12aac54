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


# ------------------------------------------------------- .serialized format

_SER_MAGIC = 0x041C
_SER_HAS_NORMALS = 0x0001
_SER_HAS_TEXCOORDS = 0x0002
_SER_HAS_COLORS = 0x0008
_SER_FACE_NORMALS = 0x0010
_SER_SINGLE = 0x1000
_SER_DOUBLE = 0x2000


def load_serialized(path, shape_index: int = 0):
    """Load one mesh from a Mitsuba ``.serialized`` container
    (src/shapes/serialized.cpp): little-endian uint16 magic 0x041C +
    uint16 version per mesh, zlib-deflated payload of
    [flags u32][name (v4, null-terminated)][vertex_count u64]
    [face_count u64][positions][normals?][uvs?][colors?][faces u32].
    The footer is [offset u64 x count][count u32].

    Returns (vertices, faces, normals|None, uvs|None).
    """
    import struct
    import zlib

    data = open(path, "rb").read()
    (count,) = struct.unpack_from("<I", data, len(data) - 4)
    assert 0 <= shape_index < count, (shape_index, count)
    table_off = len(data) - 4 - 8 * count
    (start,) = struct.unpack_from("<Q", data, table_off + 8 * shape_index)
    magic, version = struct.unpack_from("<HH", data, start)
    assert magic == _SER_MAGIC, hex(magic)
    end = (struct.unpack_from("<Q", data,
                              table_off + 8 * (shape_index + 1))[0]
           if shape_index + 1 < count else table_off)
    raw = zlib.decompress(data[start + 4:end])

    pos = 0
    (flags,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    if version >= 4:
        nul = raw.index(b"\0", pos)
        pos = nul + 1
    vc, fc = struct.unpack_from("<QQ", raw, pos)
    pos += 16
    dt = np.float64 if (flags & _SER_DOUBLE) else np.float32
    isz = np.dtype(dt).itemsize

    def arr(n):
        nonlocal pos
        a = np.frombuffer(raw, dt, count=n, offset=pos).astype(np.float32)
        pos += n * isz
        return a

    v = arr(3 * vc).reshape(vc, 3)
    n = arr(3 * vc).reshape(vc, 3) if (flags & _SER_HAS_NORMALS) else None
    uv = arr(2 * vc).reshape(vc, 2) if (flags & _SER_HAS_TEXCOORDS) else None
    if flags & _SER_HAS_COLORS:
        arr(3 * vc)  # vertex colors: parsed and dropped (unused downstream)
    f = np.frombuffer(raw, np.uint32, count=3 * fc,
                      offset=pos).astype(np.int32).reshape(fc, 3)
    if flags & _SER_FACE_NORMALS:
        n = None
    return v, f, n, uv


def write_serialized(path, meshes):
    """Write meshes (list of (v, f, n|None, uv|None)) as a version-4
    ``.serialized`` container (round-trip/test helper)."""
    import struct
    import zlib

    blobs = []
    for v, f, n, uv in meshes:
        flags = _SER_SINGLE
        payload = b""
        if n is not None:
            flags |= _SER_HAS_NORMALS
        if uv is not None:
            flags |= _SER_HAS_TEXCOORDS
        payload += struct.pack("<I", flags)
        payload += b"mesh\0"
        payload += struct.pack("<QQ", v.shape[0], f.shape[0])
        payload += np.asarray(v, np.float32).tobytes()
        if n is not None:
            payload += np.asarray(n, np.float32).tobytes()
        if uv is not None:
            payload += np.asarray(uv, np.float32).tobytes()
        payload += np.asarray(f, np.uint32).tobytes()
        blobs.append(struct.pack("<HH", _SER_MAGIC, 4)
                     + zlib.compress(payload))
    out = b""
    offsets = []
    for b in blobs:
        offsets.append(len(out))
        out += b
    import struct as st

    for o in offsets:
        out += st.pack("<Q", o)
    out += st.pack("<I", len(blobs))
    open(path, "wb").write(out)

"""Mitsuba binary volume container (``.vol``) IO.

Format (reference src/render/volumegrid.cpp:128-183 read / :99-123
write): ``b"VOL"`` magic, u8 version (3), i32 data_type (1 = float32),
i32 size_x/y/z, i32 channel_count, 6 x f32 bbox (min.xyz, max.xyz),
then ``x-fastest`` float32 samples: index ((z * sy + y) * sx + x) * C + c.

``read_vol`` returns the grid as (D, H, W, C) = (z, y, x, channels) —
the layout ``Volume3DTexture`` / ``GridMedium`` index directly.
"""
from __future__ import annotations

import struct

import numpy as np

_HEADER = struct.Struct("<3sbiiiii6f")


def read_vol(filename):
    """Read a ``.vol`` file -> (data (D, H, W, C) f32, bbox_min (3,),
    bbox_max (3,))."""
    with open(filename, "rb") as f:
        raw = f.read()
    (magic, version, data_type, sx, sy, sz, ch,
     x0, y0, z0, x1, y1, z1) = _HEADER.unpack_from(raw, 0)
    if magic != b"VOL":
        raise ValueError(f"{filename}: not a VOL file")
    if version != 3:
        raise ValueError(f"{filename}: unsupported VOL version {version}")
    if data_type != 1:
        raise ValueError(
            f"{filename}: only float32 (type 1) supported, got {data_type}")
    n = sx * sy * sz * ch
    data = np.frombuffer(raw, np.dtype("<f4"), count=n,
                         offset=_HEADER.size)
    data = data.reshape(sz, sy, sx, ch).astype(np.float32)
    return (data, np.asarray([x0, y0, z0], np.float32),
            np.asarray([x1, y1, z1], np.float32))


def write_vol(filename, data, bbox_min=(0.0, 0.0, 0.0),
              bbox_max=(1.0, 1.0, 1.0)):
    """Write a (D, H, W[, C]) array as a version-3 ``.vol`` file."""
    data = np.asarray(data, np.float32)
    if data.ndim == 3:
        data = data[..., None]
    sz, sy, sx, ch = data.shape
    mn = np.asarray(bbox_min, np.float32)
    mx = np.asarray(bbox_max, np.float32)
    with open(filename, "wb") as f:
        f.write(_HEADER.pack(b"VOL", 3, 1, sx, sy, sz, ch,
                             mn[0], mn[1], mn[2], mx[0], mx[1], mx[2]))
        f.write(np.ascontiguousarray(data, "<f4").tobytes())

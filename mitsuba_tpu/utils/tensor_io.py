"""Dupuy-Jakob tensor container ('.bsdf') reader/writer.

Reference: src/core/tensor.cpp:7-52 — binary layout:

    bytes 0:12   b"tensor_file\\x00"
    bytes 12:14  version (1, 0)
    uint32       n_fields
    per field:
      uint16      name length, then name bytes
      uint16      ndim
      uint8       dtype (Struct::Type enum: UInt8=1 ... Float32=9 ...)
      uint64      absolute byte offset of the data
      uint64[nd]  shape

The writer exists so tests can synthesize valid measured-material
files (no network egress in this environment to fetch the RGL
database); the format round-trips bit-exactly with the reference's
parser.
"""
from __future__ import annotations

import struct

import numpy as np

MAGIC = b"tensor_file\x00"

# Struct::Type enum (include/mitsuba/core/struct.h:25)
_DTYPES = {
    1: np.uint8, 2: np.int8,
    3: np.uint16, 4: np.int16,
    5: np.uint32, 6: np.int32,
    7: np.uint64, 8: np.int64,
    9: np.float16, 10: np.float32, 11: np.float64,
}
_DTYPE_CODES = {np.dtype(v): k for k, v in _DTYPES.items()}


def read_tensor_file(filename):
    """Returns {name: numpy array} for every field."""
    with open(filename, "rb") as fh:
        raw = fh.read()
    if raw[:12] != MAGIC:
        raise ValueError(f"{filename}: not a tensor file")
    (n_fields,) = struct.unpack_from("<I", raw, 14)
    pos = 18
    out = {}
    for _ in range(n_fields):
        (name_len,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        name = raw[pos:pos + name_len].decode()
        pos += name_len
        (ndim,) = struct.unpack_from("<H", raw, pos)
        pos += 2
        (dtype_code,) = struct.unpack_from("<B", raw, pos)
        pos += 1
        (offset,) = struct.unpack_from("<Q", raw, pos)
        pos += 8
        shape = struct.unpack_from(f"<{ndim}Q", raw, pos)
        pos += 8 * ndim
        dt = _DTYPES.get(dtype_code)
        if dt is None:
            raise ValueError(f"{filename}: unknown dtype {dtype_code}")
        count = int(np.prod(shape)) if shape else 1
        out[name] = np.frombuffer(
            raw, dtype=dt, count=count, offset=offset
        ).reshape(shape)
    return out


def write_tensor_file(filename, fields: dict):
    """Write {name: numpy array} in the reference's container format."""
    items = []
    # header size: magic + version + count + field table
    header_len = 12 + 2 + 4
    for name, arr in fields.items():
        arr = np.ascontiguousarray(arr)
        header_len += 2 + len(name.encode()) + 2 + 1 + 8 + 8 * arr.ndim
        items.append((name, arr))
    out = bytearray()
    out += MAGIC
    out += bytes([1, 0])
    out += struct.pack("<I", len(items))
    offset = header_len
    payload = bytearray()
    for name, arr in items:
        code = _DTYPE_CODES.get(arr.dtype)
        if code is None:
            raise ValueError(f"unsupported dtype {arr.dtype} for {name}")
        nb = name.encode()
        out += struct.pack("<H", len(nb)) + nb
        out += struct.pack("<H", arr.ndim)
        out += struct.pack("<B", code)
        out += struct.pack("<Q", offset)
        for s in arr.shape:
            out += struct.pack("<Q", s)
        payload += arr.tobytes()
        offset += arr.nbytes
    with open(filename, "wb") as fh:
        fh.write(bytes(out) + bytes(payload))

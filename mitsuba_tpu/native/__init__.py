"""Native (C++) runtime components, loaded via ctypes.

The reference's performance-critical host-side infrastructure is C++
(Embree BVH build, kd-tree SAH builder, nanothread pools); here the
equivalent host-side hot path — acceleration-structure construction — is
a C++ binned-SAH builder compiled on first use with g++ and cached.
Pure-numpy fallbacks keep everything functional without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_LIB = None
_TRIED = False


def _build_library():
    src = os.path.join(os.path.dirname(__file__), "bvh_builder.cpp")
    cache_dir = os.environ.get(
        "MITSUBA_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "mitsuba_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libbvh.so")
    if (not os.path.exists(lib_path)
            or os.path.getmtime(lib_path) < os.path.getmtime(src)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src,
               "-o", lib_path]
        subprocess.run(cmd, check=True, capture_output=True)
    return lib_path


def get_bvh_lib():
    """Load (building if needed) the native BVH library; None if
    unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        lib = ctypes.CDLL(_build_library())
        lib.build_bvh_sah.restype = ctypes.c_int32
        lib.build_bvh_sah.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def build_bvh_native(vertices, faces, leaf_size: int = 4):
    """SAH build via the native library.

    Returns (lo, hi, first, count, miss, prims) numpy arrays trimmed to
    the emitted node count, or None if the library is unavailable.
    """
    import numpy as np

    lib = get_bvh_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    nf = f.shape[0]
    max_nodes = max(2 * nf, 1)
    lo = np.empty((max_nodes, 3), np.float32)
    hi = np.empty((max_nodes, 3), np.float32)
    first = np.empty(max_nodes, np.int32)
    count = np.empty(max_nodes, np.int32)
    miss = np.empty(max_nodes, np.int32)
    prims = np.empty(nf + leaf_size, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    n_nodes = lib.build_bvh_sah(
        v.ctypes.data_as(fp), np.int32(v.shape[0]),
        f.ctypes.data_as(ip), np.int32(nf), np.int32(leaf_size),
        lo.ctypes.data_as(fp), hi.ctypes.data_as(fp),
        first.ctypes.data_as(ip), count.ctypes.data_as(ip),
        miss.ctypes.data_as(ip), prims.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        return None
    return (lo[:n_nodes], hi[:n_nodes], first[:n_nodes], count[:n_nodes],
            miss[:n_nodes], prims)

"""Native (C++) components, bound via ctypes.

The reference's performance-critical host code is C++ (SBVH builder,
loaders); here the one hot host-side path is the full-sweep SAH build for
large scenes — minutes in numpy at country_kitchen scale, ~1 s natively.
The library is compiled on first use and cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "bvh_builder.cpp")
_LIB = os.path.join(_DIR, "libflbvh.so")
_lock = threading.Lock()
_lib = None


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True, timeout=240)
        return True
    except Exception as e:  # no toolchain / failure -> numpy fallback
        print(f"native bvh builder compile failed: {e}")
        return False


def get_lib():
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _compile():
                return None
        lib = ctypes.CDLL(_LIB)
        lib.flbvh_build.restype = ctypes.c_int64
        lib.flbvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.flbvh_num_indices.restype = ctypes.c_int64
        lib.flbvh_read.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint32)]
        lib.flsbvh_build.restype = ctypes.c_int64
        lib.flsbvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32]
        lib.flsbvh_num_indices.restype = ctypes.c_int64
        lib.flsbvh_stats.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.flsbvh_read.argtypes = lib.flbvh_read.argtypes
        _lib = lib
        return _lib


def build_bvh_native(positions: np.ndarray):
    """positions [M,3,3] -> BVHArrays, or None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..accel.bvh import BVHArrays

    tris = np.ascontiguousarray(positions.reshape(-1, 9), np.float32)
    m = tris.shape[0]
    fp = tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n_nodes = lib.flbvh_build(fp, m)
    n_idx = lib.flbvh_num_indices()

    box_min = np.empty((n_nodes, 3), np.float32)
    box_max = np.empty((n_nodes, 3), np.float32)
    right = np.empty(n_nodes, np.uint32)
    parent = np.empty(n_nodes, np.int32)
    nprims = np.empty(n_nodes, np.uint8)
    indices = np.empty(n_idx, np.uint32)
    lib.flbvh_read(
        box_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        box_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nprims.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return BVHArrays(box_min, box_max, right, parent, nprims, indices)


def build_sbvh_native(positions: np.ndarray, max_leaf: int = 8,
                      verbose: bool = True):
    """Spatial-split BVH (sbvh.cpp semantics) built natively.
    positions [M,3,3] -> BVHArrays, or None if the lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    from ..accel.bvh import BVHArrays

    tris = np.ascontiguousarray(positions.reshape(-1, 9), np.float32)
    m = tris.shape[0]
    fp = tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    n_nodes = lib.flsbvh_build(fp, m, max_leaf)
    n_idx = lib.flsbvh_num_indices()
    if verbose:
        n_spatial = ctypes.c_int64()
        n_dup = ctypes.c_int64()
        lib.flsbvh_stats(ctypes.byref(n_spatial), ctypes.byref(n_dup))
        print(f"SBVH(native): {n_nodes} nodes ({n_spatial.value} spatial "
              f"splits), {n_dup.value} duplicates "
              f"({n_dup.value * 100.0 / max(m, 1):.1f}%)")

    box_min = np.empty((n_nodes, 3), np.float32)
    box_max = np.empty((n_nodes, 3), np.float32)
    right = np.empty(n_nodes, np.uint32)
    parent = np.empty(n_nodes, np.int32)
    nprims = np.empty(n_nodes, np.uint8)
    indices = np.empty(n_idx, np.uint32)
    lib.flsbvh_read(
        box_min.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        box_max.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        parent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nprims.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return BVHArrays(box_min, box_max, right, parent, nprims, indices)

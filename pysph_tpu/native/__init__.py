"""Native (C++) runtime helpers.

The reference implements its host-side mesh machinery in Cython
(/root/reference/pysph/tools/mesh_tools.pyx); the equivalents here
are C++ compiled on first use with the system toolchain and bound
with ctypes (no pybind11 dependency).  Consumers fall back to the
pure-numpy paths when no compiler is available."""

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build(src, out):
    cmd = ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src,
           '-o', out]
    subprocess.check_call(cmd, stdout=subprocess.DEVNULL,
                          stderr=subprocess.DEVNULL)


def get_lib():
    """The compiled mesh_native library, or None when unavailable.

    Builds into this package directory, keyed by source mtime."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(_HERE, 'mesh_native.cpp')
    out = os.path.join(_HERE, '_mesh_native.so')
    try:
        if (not os.path.exists(out) or
                os.path.getmtime(out) < os.path.getmtime(src)):
            _build(src, out)
        lib = ctypes.CDLL(out)
    except (OSError, subprocess.CalledProcessError):
        return None
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int64)
    lib.surface_points.restype = ctypes.c_int64
    lib.surface_points.argtypes = [
        c_d, ctypes.c_int64, c_i, ctypes.c_int64, ctypes.c_double,
        c_d, ctypes.c_int64]
    lib.fill_volume.restype = ctypes.c_int64
    lib.fill_volume.argtypes = [
        c_d, ctypes.c_int64, c_i, ctypes.c_int64, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        c_d, ctypes.c_int64]
    _LIB = lib
    return _LIB


def _as_c(arr, dtype):
    a = np.ascontiguousarray(arr, dtype=dtype)
    ptr_t = (ctypes.POINTER(ctypes.c_double)
             if dtype == np.float64 else
             ctypes.POINTER(ctypes.c_int64))
    return a, a.ctypes.data_as(ptr_t)


def surface_points(verts, tris, dx):
    """Native triangle-surface sampling; (N, 3) points or None if the
    native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    verts, vp = _as_c(verts, np.float64)
    tris, tp = _as_c(tris, np.int64)
    cap = 1024
    while True:
        out = np.empty((cap, 3), np.float64)
        _, op = _as_c(out, np.float64)
        n = lib.surface_points(vp, len(verts), tp, len(tris),
                               float(dx), op, cap)
        if n >= 0:
            return out[:n]
        cap *= 4


def fill_volume(verts, tris, dx, bounds=None):
    """Native exact ray-parity interior fill of a closed triangle
    surface; (N, 3) lattice points or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    verts, vp = _as_c(verts, np.float64)
    tris, tp = _as_c(tris, np.int64)
    if bounds is None:
        lo = verts.min(axis=0)
        hi = verts.max(axis=0)
        bounds = (lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])
    cap = 4096
    while True:
        out = np.empty((cap, 3), np.float64)
        _, op = _as_c(out, np.float64)
        n = lib.fill_volume(vp, len(verts), tp, len(tris), float(dx),
                            *[float(b) for b in bounds], op, cap)
        if n >= 0:
            return out[:n]
        cap *= 4

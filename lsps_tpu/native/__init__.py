"""ctypes bindings for the native host-side kernels (native/*.cpp).

Builds the shared library on first use (g++) and caches it next to the
sources; every entry point has a numpy fallback so the framework works
without a toolchain.  Enable in the data pipeline with
``LSPS_NATIVE=1`` (parity tests pin the cv2 path as ground truth; the
native warp agrees to >=99% of pixels, differing only on exact-tie
rounding at object borders).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native",
    "lsps_native.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "liblsps_native.so")

_lib = None
_tried = False


def _build() -> Optional[str]:
    if os.path.isfile(_LIB) and (os.path.getmtime(_LIB)
                                 >= os.path.getmtime(_SRC)):
        return _LIB
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-fopenmp", "-o", _LIB, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB
    except Exception:
        try:  # retry without openmp
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True,
                           timeout=120)
            return _LIB
        except Exception:
            return None


def get_lib():
    """The loaded library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        # a stale/foreign-arch .so must degrade to the numpy fallback,
        # not crash the loader
        return None
    d = ctypes.POINTER(ctypes.c_double)
    f = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    lib.warp_perspective_nn.argtypes = [f, i, i, d, f, i, i,
                                        ctypes.c_float]
    lib.fused_recrop_normalize_batch.argtypes = [
        f, i, i, i, d, f, f, f, f, f, ctypes.c_float, ctypes.c_float, f]
    lib.normalize_batch.argtypes = [f, i, i, f, f, f]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _dptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def warp_perspective_nn(src, M_dst_to_src, dsize, border=0.0) -> np.ndarray:
    """NN perspective warp; M maps destination -> source coords."""
    lib = get_lib()
    src = np.ascontiguousarray(src, np.float32)
    m = np.ascontiguousarray(M_dst_to_src, np.float64).reshape(9)
    dh, dw = dsize
    if lib is None:
        ys, xs = np.mgrid[0:dh, 0:dw].astype(np.float64)
        w = m[6] * xs + m[7] * ys + m[8]
        sx = np.rint((m[0] * xs + m[1] * ys + m[2]) / w).astype(np.int64)
        sy = np.rint((m[3] * xs + m[4] * ys + m[5]) / w).astype(np.int64)
        ok = (sx >= 0) & (sx < src.shape[1]) & (sy >= 0) & (sy < src.shape[0])
        out = np.full((dh, dw), border, np.float32)
        out[ok] = src[sy[ok], sx[ok]]
        return out
    out = np.empty((dh, dw), np.float32)
    lib.warp_perspective_nn(_fptr(src), src.shape[0], src.shape[1],
                            _dptr(m), _fptr(out), dh, dw,
                            ctypes.c_float(border))
    return out


def fused_recrop_normalize_batch(src, minv, com_z, cube_z, premax, zstart,
                                 zend, pad_value=0.0,
                                 nv_val=32000.0) -> np.ndarray:
    """Batched fused recrop + clamp + normalize (see lsps_native.cpp)."""
    src = np.ascontiguousarray(src, np.float32)
    n, h, w = src.shape
    minv = np.ascontiguousarray(minv, np.float64).reshape(n, 9)
    args = [np.ascontiguousarray(a, np.float32)
            for a in (com_z, cube_z, premax, zstart, zend)]
    out = np.empty_like(src)
    lib = get_lib()
    if lib is None:
        for b in range(n):
            v = warp_perspective_nn(src[b], minv[b], (h, w), pad_value)
            far = args[0][b] + args[1][b] / 2.0
            near = args[0][b] - args[1][b] / 2.0
            v[np.isclose(v, nv_val)] = pad_value
            v[(v != 0) & (v < args[3][b])] = args[3][b]
            v[(v != 0) & (v > args[4][b])] = 0.0
            v[(v == args[2][b]) | (v == 0)] = far
            v = np.clip(v, near, far)
            out[b] = (v - args[0][b]) / (args[1][b] / 2.0)
        return out
    lib.fused_recrop_normalize_batch(
        _fptr(src), n, h, w, _dptr(minv), _fptr(args[0]), _fptr(args[1]),
        _fptr(args[2]), _fptr(args[3]), _fptr(args[4]),
        ctypes.c_float(pad_value), ctypes.c_float(nv_val), _fptr(out))
    return out


def normalize_batch(src, com_z, cube_z) -> np.ndarray:
    """Batched depth normalization (dataset_hand2.py:27-31)."""
    src = np.ascontiguousarray(src, np.float32)
    n = src.shape[0]
    hw = int(np.prod(src.shape[1:]))
    com_z = np.ascontiguousarray(com_z, np.float32)
    cube_z = np.ascontiguousarray(cube_z, np.float32)
    lib = get_lib()
    if lib is None:
        far = com_z.reshape(n, 1) + cube_z.reshape(n, 1) / 2.0
        flat = src.reshape(n, hw).copy()
        flat[flat == 0] = np.broadcast_to(far, flat.shape)[flat == 0]
        return ((flat - com_z.reshape(n, 1)) / (cube_z.reshape(n, 1) / 2.0)
                ).reshape(src.shape)
    out = np.empty_like(src)
    lib.normalize_batch(_fptr(src), n, hw, _fptr(com_z), _fptr(cube_z),
                        _fptr(out.reshape(n, hw)))
    return out

"""Native (C++) fast paths with automatic build + Python fallback.

The reference's host runtime is native C++ (XUSG); here the compute path is
XLA, and the host-side work that remains hot — asset parsing — gets a C++
implementation compiled on demand with g++ and loaded through ctypes.
Everything degrades gracefully to the pure-Python implementations in
`multivolumes_tpu.scene.io_obj` / `io_dds` when no toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cpp")
_LIB = os.path.join(_HERE, "libmvnative.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.mv_load_obj.restype = ctypes.c_int
        lib.mv_load_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mv_halton.restype = ctypes.c_float
        lib.mv_halton.argtypes = [ctypes.c_uint32, ctypes.c_uint32]
        lib.mv_free.restype = None
        lib.mv_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def load_obj_native(path: str, for_dx: bool = True):
    """Fast OBJ load; returns io_obj.Mesh or None if unavailable/failed."""
    lib = get_lib()
    if lib is None:
        return None
    verts_p = ctypes.POINTER(ctypes.c_float)()
    idx_p = ctypes.POINTER(ctypes.c_int32)()
    v_count = ctypes.c_int64()
    t_count = ctypes.c_int64()
    aabb = (ctypes.c_float * 6)()
    rc = lib.mv_load_obj(
        path.encode(), 1 if for_dx else 0,
        ctypes.byref(verts_p), ctypes.byref(idx_p),
        ctypes.byref(v_count), ctypes.byref(t_count), aabb,
    )
    if rc != 0:
        return None
    try:
        v = np.ctypeslib.as_array(verts_p, shape=(v_count.value, 6)).copy()
        t = np.ctypeslib.as_array(idx_p, shape=(t_count.value, 3)).copy()
    finally:
        lib.mv_free(ctypes.cast(verts_p, ctypes.c_void_p))
        lib.mv_free(ctypes.cast(idx_p, ctypes.c_void_p))

    from multivolumes_tpu.scene.io_obj import Mesh

    return Mesh(
        vertices=v,
        indices=t,
        aabb_min=np.array(aabb[0:3], np.float32),
        aabb_max=np.array(aabb[3:6], np.float32),
    )


def halton_native(index: int, base: int):
    lib = get_lib()
    if lib is None:
        return None
    return float(lib.mv_halton(index, base))

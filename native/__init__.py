"""Native (C++) components, loaded via ctypes.

Build happens lazily on first use (g++ -O2 -shared); the compiled .so is
cached next to the source.  Python fallbacks exist for every native
component, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_LIB_FAILED = False


def _build_library() -> str:
    src = os.path.join(_DIR, "bvh_builder.cc")
    out = os.path.join(_DIR, "librtpu_native.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    cmd = ["g++", "-O2", "-fPIC", "-shared", "-std=c++17", src, "-o", out]
    log.info("building native library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def get_library():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _LIB, _LIB_FAILED
    with _LOCK:
        if _LIB is not None or _LIB_FAILED:
            return _LIB
        try:
            lib = ctypes.CDLL(_build_library())
            lib.rtpu_build_bvh.restype = ctypes.c_int32
            lib.rtpu_build_bvh.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # tri_mn
                ctypes.POINTER(ctypes.c_float),   # tri_mx
                ctypes.c_int32,                    # num_tris
                ctypes.c_int32,                    # leaf_max
                ctypes.POINTER(ctypes.c_float),   # rows_out
                ctypes.POINTER(ctypes.c_int32),   # order_out
                ctypes.POINTER(ctypes.c_int32),   # root_out
            ]
            _LIB = lib
        except Exception as e:  # toolchain missing, build error, ...
            log.warning("native library unavailable (%s); using Python fallback", e)
            _LIB_FAILED = True
        return _LIB


def build_sah_bvh(tri_mn: np.ndarray, tri_mx: np.ndarray, leaf_max: int = 8):
    """Binned-SAH BVH over per-triangle AABBs via the native builder.

    Returns (rows [N,16] f32 with child links bitcast in cols 12/13,
    order [T] i32 permutation, root link i32) or None if the native
    library is unavailable.
    """
    lib = get_library()
    if lib is None:
        return None
    t = np.ascontiguousarray(tri_mn, np.float32)
    x = np.ascontiguousarray(tri_mx, np.float32)
    n = t.shape[0]
    rows = np.zeros((max(1, n), 16), np.float32)
    order = np.zeros(n, np.int32)
    root_depth = np.zeros(2, np.int32)
    fp = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    ip = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    n_nodes = lib.rtpu_build_bvh(
        fp(t), fp(x), np.int32(n), np.int32(leaf_max),
        fp(rows), ip(order), ip(root_depth),
    )
    if n_nodes < 0:
        raise ValueError("rtpu_build_bvh failed")
    return rows[:n_nodes], order, int(root_depth[0]), int(root_depth[1])

"""Native host-runtime bindings (C++ via ctypes).

The reference's runtime around the render kernels is native C
(obj_loader.c, canvas.c, thpool.c); here the TPU compute path is JAX/XLA
and the host runtime's hot loops are C++ compiled into libfrt_native.so,
loaded through ctypes (no pybind11 in this image). Every native entry
point has a pure-Python fallback, so the package works without a
toolchain; `available()` says which path is active.

Build: `python -m fast_ray_tracer_tpu.native` or automatic on first
import (g++ -O3 -shared, cached beside the sources).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfrt_native.so")
_SRCS = [os.path.join(_DIR, "obj_core.cpp")]
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    srcs = [s for s in _SRCS if os.path.exists(s)]
    if not srcs:
        return False
    newest = max(os.path.getmtime(s) for s in srcs)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= newest:
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC",
             "-shared", "-o", _SO + ".tmp", *srcs],
            check=True, capture_output=True)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.frt_obj_load.restype = ctypes.c_void_p
        lib.frt_obj_load.argtypes = [ctypes.c_char_p]
        lib.frt_obj_counts.restype = None
        lib.frt_obj_counts.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_int64)]
        lib.frt_obj_fill.restype = None
        lib.frt_obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class ObjGeometry:
    """Raw OBJ parse result (indices are 1-based, 0 = absent)."""

    def __init__(self, v, vt, vn, tri, flags, group, event,
                 group_names, events):
        self.v = v                    # (nv, 3) float64
        self.vt = vt                  # (nvt, 3)
        self.vn = vn                  # (nvn, 3)
        self.tri = tri                # (ntri, 3, 3) int32: [corner][v,t,n]
        self.use_n = flags[:, 0].astype(bool)
        self.use_t = flags[:, 1].astype(bool)
        self.group = group            # (ntri,) group index
        self.event = event            # (ntri,) events-seen count
        self.group_names = group_names  # list[str], [0] = default group
        self.events = events          # list[("m"|"u", arg)] in file order


def parse_obj(path: str) -> Optional[ObjGeometry]:
    """Parse with the native core; None if the library is unavailable
    (callers fall back to the Python line scanner)."""
    lib = _load()
    if lib is None:
        return None
    h = lib.frt_obj_load(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        counts = (ctypes.c_int64 * 6)()
        lib.frt_obj_counts(h, counts)
        nv, nvt, nvn, ntri, glen, elen = (int(c) for c in counts)
        v = np.empty((nv, 3), np.float64)
        vt = np.empty((nvt, 3), np.float64)
        vn = np.empty((nvn, 3), np.float64)
        tri = np.empty((ntri, 3, 3), np.int32)
        flags = np.empty((ntri, 2), np.int32)
        group = np.empty((ntri,), np.int32)
        event = np.empty((ntri,), np.int32)
        gbuf = ctypes.create_string_buffer(glen)
        ebuf = ctypes.create_string_buffer(elen)

        def ptr(a, ty):
            if a.size == 0:
                return ty()          # null pointer of the right type
            return a.ctypes.data_as(ty)

        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.frt_obj_fill(ctypes.c_void_p(h), ptr(v, dp), ptr(vt, dp),
                         ptr(vn, dp), ptr(tri, ip), ptr(flags, ip),
                         ptr(group, ip), ptr(event, ip), gbuf, ebuf)
        group_names = gbuf.raw[:glen].decode().split("\n") if glen else \
            ["##default_group"]
        events = []
        if elen:
            for line in ebuf.raw[:elen].decode().split("\n"):
                events.append((line[0], line[2:]))
        return ObjGeometry(v, vt, vn, tri, flags, group, event,
                           group_names, events)
    finally:
        lib.frt_obj_free(h)


if __name__ == "__main__":
    print("native build:", "ok" if _build() else "failed")

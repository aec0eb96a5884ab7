"""Native host-side runtime kernels, loaded via ctypes.

Compiled on first use (cc -O3 -shared); falls back to None when no
compiler is available — callers must keep a Python fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libhostops.so")
_SRC = os.path.join(_DIR, "hostops.c")

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.gamma_expand_offsets.restype = ctypes.c_int
        lib.gamma_expand_offsets.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64,
            ctypes.c_uint32,
        ]
        lib.gamma_write_offsets.restype = ctypes.c_int64
        lib.gamma_write_offsets.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64,
            ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_uint32),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib

"""Native (C) helpers for host-side hot loops.

The TPU owns the data-parallel compute; these cover the serial host
pieces that would otherwise bottleneck the pipeline in Python — first
the GLV scalar decomposition (2^20 scalars: ~10 s of Python bignum vs
tens of milliseconds here, which is what lets the decomposition stay
inside the honestly-timed MSM region).

Compiled on demand with the system C compiler into this directory and
loaded via ctypes (no pybind11 in the image; plain C ABI)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))


def _build(name: str) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.c")
    out = os.path.join(_DIR, f"{name}.so")
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    for extra in (["-fopenmp"], []):
        for cc in ("cc", "gcc", "clang"):
            try:
                subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", *extra, src, "-o", out],
                    check=True,
                    capture_output=True,
                )
                return out
            except (FileNotFoundError, subprocess.CalledProcessError):
                continue
    return None


_glv_lib = None
_glv_tried = False


def glv_lib():
    """ctypes handle to glv.so, or None when no C compiler is available
    (callers fall back to the Python path)."""
    global _glv_lib, _glv_tried
    if _glv_tried:
        return _glv_lib
    _glv_tried = True
    path = _build("glv")
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.glv_decompose_batch.restype = None
    lib.glv_decompose_batch.argtypes = [
        ctypes.c_void_p,  # scalars (n*4 u64)
        ctypes.c_long,  # n
        ctypes.c_void_p,  # r[4]
        ctypes.c_void_p,  # half_r[4]
        ctypes.c_void_p,  # mu[6]
        ctypes.c_void_p,  # z2[4]
        ctypes.c_void_p,  # lam[4]
        ctypes.c_void_p,  # k_abs out (2n*2 u64)
        ctypes.c_void_p,  # neg out (2n u8)
    ]
    _glv_lib = lib
    return lib

"""Native (C) host-side runtime pieces, built on demand and bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; these are the *host* hot loops around
it (currently the frame rasterizer feeding the recording pipeline).  Sources
compile once per machine with gcc -O3 into a cached shared object next to
this package; every entry point has a pure-numpy fallback, so the framework
works (slower) without a C toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path

_DIR = Path(__file__).resolve().parent
_SO = _DIR / f"_rasterize_{sys.implementation.cache_tag}.so"

_lib = None
_tried = False


def _build() -> Path | None:
    src = _DIR / "rasterize.c"
    if _SO.exists() and _SO.stat().st_mtime >= src.stat().st_mtime:
        return _SO
    try:
        subprocess.run(
            ["gcc", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(src)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


def rasterize_lib():
    """The ctypes library with ``rasterize`` bound, or None if unavailable."""
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        so = _build()
        if so is not None:
            lib = ctypes.CDLL(str(so))
            lib.rasterize.restype = None
            lib.rasterize.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # pos
                ctypes.POINTER(ctypes.c_float),  # pressure
                ctypes.POINTER(ctypes.c_uint8),  # alive
                ctypes.c_long,  # n
                ctypes.POINTER(ctypes.c_float),  # segments
                ctypes.c_long,  # s
                ctypes.c_long,  # w
                ctypes.c_long,  # h
                ctypes.c_long,  # r_px
                ctypes.POINTER(ctypes.c_uint8),  # out
            ]
            _lib = lib
    return _lib

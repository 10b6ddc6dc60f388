"""On-demand build + ctypes binding of the native IO kernels.

Compiles ``_fastio.cpp`` once per environment into a cached shared object
(no pybind11 needed — plain C ABI via ctypes) and exposes
:func:`format_rows`.  Every entry point degrades gracefully to the pure
Python implementation when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

from ..utils.log import get_logger

log = get_logger("io.native")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build_dir() -> str:
    d = os.environ.get("COBAYA_TPU_BUILD_DIR") or os.path.join(
        tempfile.gettempdir(), "cobaya_tpu_native"
    )
    os.makedirs(d, exist_ok=True)
    return d


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = os.path.join(os.path.dirname(__file__), "_fastio.cpp")
    so = os.path.join(_build_dir(), "_fastio.so")
    try:
        if not os.path.exists(so) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            cmd = ["g++", "-O3", "-shared", "-fPIC", src, "-o", so]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            log.debug("Built native IO kernels: %s", so)
        lib = ctypes.CDLL(so)
        lib.format_rows.restype = ctypes.c_long
        lib.format_rows.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_long, ctypes.c_long,
            ctypes.c_char_p,
        ]
        _lib = lib
    except Exception as exc:
        log.debug("Native IO kernels unavailable (%s); using Python path.",
                  exc)
        _lib = None
    return _lib


def format_rows(rows: np.ndarray) -> Optional[str]:
    """Format a float64 matrix as %17.8g text; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    rows = np.ascontiguousarray(np.atleast_2d(rows), dtype=np.float64)
    n, m = rows.shape
    if n == 0:
        return ""
    buf = ctypes.create_string_buffer(n * (m * 32 + 2) + 1)
    length = lib.format_rows(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, m, buf
    )
    return buf.raw[:length].decode("ascii")

"""ctypes bindings for the native host data plane (``native/dataplane.cpp``).

Auto-builds the shared library on first use when a compiler is present;
callers fall back to the PIL path when unavailable. The native path fuses
JPEG/PNG decode + antialiased bicubic resize (PIL-matching cubic a=-0.5
resampling) + horizontal flip + float conversion, multithreaded without the
GIL.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import List, Optional

import numpy as np

_REPO_ROOT = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_NATIVE_DIR = osp.join(_REPO_ROOT, "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "libddt_dataplane.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not osp.exists(_LIB_PATH):
            if os.environ.get("DYNAMO_NO_NATIVE"):
                _build_failed = True
                return None
            try:
                subprocess.run(
                    ["sh", osp.join(_NATIVE_DIR, "build.sh")],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ddt_decode_resize_batch.restype = ctypes.c_int
            lib.ddt_decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            assert lib.ddt_version() == 1
            _lib = lib
        except Exception:
            _build_failed = True
            return None
    return _lib


def available() -> bool:
    return _load() is not None


def decode_resize_batch(
    paths: List[str], out_h: int, out_w: int, flips: Optional[List[bool]] = None,
    n_threads: int = 0,
) -> np.ndarray:
    """Decode+resize a list of image paths -> (N, out_h, out_w, 3) float32 in
    [0, 1]. Raises RuntimeError on decode failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native data plane unavailable")
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    flip_arr = np.asarray(flips if flips is not None else [0] * n, np.uint8)
    failures = lib.ddt_decode_resize_batch(
        c_paths, n, out_h, out_w,
        flip_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
    )
    if failures:
        raise RuntimeError(f"{failures}/{n} images failed to decode")
    return out

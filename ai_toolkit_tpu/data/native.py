"""ctypes bindings for the native batch image loader (native/dataproc.cpp).

Auto-builds ``libdataproc.so`` on first use (g++ + libjpeg/libpng, all baked
into the image); every caller must handle ``None`` from ``get_lib`` and fall
back to the PIL path — the native loader is a throughput optimization for the
latent-cache pass, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
SO_PATH = os.path.join(NATIVE_DIR, "libdataproc.so")


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(SO_PATH):
            try:
                subprocess.run(
                    ["make", "-C", NATIVE_DIR, "libdataproc.so"],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(SO_PATH)
            lib.dataproc_load_batch.restype = ctypes.c_int
            lib.dataproc_load_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            return None
        return _lib


def load_image_batch(
    paths: list[str], bucket_w: int, bucket_h: int, flips: list[bool] | None = None,
    n_threads: int = 0,
) -> np.ndarray | None:
    """[-1,1] float32 [B, H, W, 3] via the native pipeline, or None if
    unavailable (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, bucket_h, bucket_w, 3), np.float32)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    flips_arr = np.asarray(flips if flips is not None else [0] * n, np.uint8)
    ok = lib.dataproc_load_batch(
        ctypes.cast(c_paths, ctypes.POINTER(ctypes.c_char_p)), n, bucket_w, bucket_h,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if ok < n:
        return None  # partial failure -> let the PIL path surface real errors
    return out

"""ctypes bindings for the native decode runtime (runtime/decode.cpp).

Auto-builds ``libmtt_runtime.so`` on first import if the toolchain is
available; callers fall back to cv2 when the library can't be built (the
pipeline probes :func:`is_available`). Decode calls hold no Python state,
so pipeline worker threads decode truly in parallel.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "libmtt_runtime.so")
_lib = None
_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        def build():
            try:
                subprocess.run(
                    ["sh", os.path.join(_HERE, "build.sh")],
                    check=True, capture_output=True, timeout=120,
                )
                return True
            except Exception:
                return False

        if not os.path.exists(_SO_PATH) and not build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        if not hasattr(lib, "mtt_grid_sample_bilinear_f32"):
            # Stale build from before the warp kernel existed: rebuild once.
            if not build():
                return None
            try:
                lib = ctypes.CDLL(_SO_PATH)
            except OSError:
                return None
            if not hasattr(lib, "mtt_grid_sample_bilinear_f32"):
                return None
        for name in ("mtt_jpeg_probe", "mtt_png_probe"):
            getattr(lib, name).argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
            getattr(lib, name).restype = ctypes.c_int
        lib.mtt_jpeg_decode_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.mtt_jpeg_decode_f32.restype = ctypes.c_int
        lib.mtt_png_decode_mask_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32,
        ]
        lib.mtt_png_decode_mask_f32.restype = ctypes.c_int
        lib.mtt_grid_sample_bilinear_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.mtt_grid_sample_bilinear_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def decode_jpeg(path: str) -> np.ndarray:
    """JPEG -> float32 [0,1] (H, W, 3). Raises on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    p = path.encode()
    if lib.mtt_jpeg_probe(p, ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"jpeg probe failed: {path}")
    out = np.empty((h.value, w.value, 3), np.float32)
    rc = lib.mtt_jpeg_decode_f32(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w
    )
    if rc != 0:
        raise IOError(f"jpeg decode failed ({rc}): {path}")
    return out


def decode_mask_png(path: str) -> np.ndarray:
    """PNG -> float32 binary mask (H, W, 1). Raises on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    p = path.encode()
    if lib.mtt_png_probe(p, ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"png probe failed: {path}")
    out = np.empty((h.value, w.value), np.float32)
    rc = lib.mtt_png_decode_mask_f32(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w
    )
    if rc != 0:
        raise IOError(f"png decode failed ({rc}): {path}")
    return out[..., None]


def grid_sample_bilinear(x: np.ndarray, grid: np.ndarray, align_corners: bool) -> np.ndarray:
    """Native bilinear grid sample, bit-exact with
    ops/movements.py:grid_sample_bilinear_np (f64 coords, f32 lerp, zeros
    padding via weight zeroing). x: (N,H,W,C) f32; grid: (N,OH,OW,2) f32.
    Raises when the native runtime is unavailable (callers fall back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    x = np.ascontiguousarray(x, np.float32)
    grid = np.ascontiguousarray(grid, np.float32)
    n, h, w, c = x.shape
    oh, ow = grid.shape[1:3]
    out = np.empty((n, oh, ow, c), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.mtt_grid_sample_bilinear_f32(
        x.ctypes.data_as(fp), grid.ctypes.data_as(fp), out.ctypes.data_as(fp),
        n, h, w, c, oh, ow, int(align_corners),
    )
    if rc != 0:
        raise RuntimeError(f"grid_sample failed ({rc})")
    return out

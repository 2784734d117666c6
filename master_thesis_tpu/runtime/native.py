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
        if not hasattr(lib, "mtt_affine_warp_f32"):
            # Stale build from before the newest kernel existed: rebuild once.
            if not build():
                return None
            try:
                lib = ctypes.CDLL(_SO_PATH)
            except OSError:
                return None
            if not hasattr(lib, "mtt_affine_warp_f32"):
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
        lib.mtt_jpeg_decode_scaled_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mtt_jpeg_decode_scaled_f32.restype = ctypes.c_int
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
        lib.mtt_resize_axis_linear_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ]
        lib.mtt_resize_axis_linear_f32.restype = ctypes.c_int
        lib.mtt_affine_warp_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.mtt_affine_warp_f32.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def jpeg_scale_num(h: int, w: int, min_h: int, min_w: int) -> int:
    """Smallest DCT scale numerator n (denominator 8) whose scaled decode
    still covers ``(min_h, min_w)`` — i.e. ceil(dim*n/8) >= target on both
    axes, so the downstream resize remains a shrink. 8 = full size.

    n is capped at 5: measured on this libjpeg-turbo (2.1.5), the 6x6/7x7
    per-block scaled IDCTs are non-SIMD C paths and decode SLOWER than the
    SIMD full-size path (480x854 natural JPEG: n=6 2.34 ms vs full
    1.82 ms; n=4 0.97, n=5 1.62 — BENCH_NOTES r5 host table), so a 6/8 or
    7/8 reduction is worse than none."""
    for n in range(1, 6):
        if -(-h * n // 8) >= min_h and -(-w * n // 8) >= min_w:
            return n
    return 8


def decode_jpeg(path: str, min_hw: Optional[tuple] = None) -> np.ndarray:
    """JPEG -> float32 [0,1] (H, W, 3). Raises on failure.

    ``min_hw=(h, w)``: decode at the smallest DCT-domain scale (n/8, the
    libjpeg ``scale_num``/``scale_denom`` mechanism) that still covers the
    target — the IDCT produces the reduced image directly, cutting decode
    time roughly by the pixel ratio. The result is then meant to be resized
    down to the target (the reference decodes full frames only to downscale
    them, dataset.py:300-301); values differ from full-decode-then-resize
    only by the interpolation of already-discarded detail (DCT truncation
    is the *better* low-pass). Full-size output when no reduction covers
    the target.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    p = path.encode()
    if lib.mtt_jpeg_probe(p, ctypes.byref(h), ctypes.byref(w)) != 0:
        raise IOError(f"jpeg probe failed: {path}")
    if min_hw is not None:
        n = jpeg_scale_num(h.value, w.value, min_hw[0], min_hw[1])
        if n < 8:
            bh = -(-h.value * n // 8)
            bw = -(-w.value * n // 8)
            out = np.empty((bh, bw, 3), np.float32)
            oh = ctypes.c_int32()
            ow = ctypes.c_int32()
            rc = lib.mtt_jpeg_decode_scaled_f32(
                p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                bh, bw, n, ctypes.byref(oh), ctypes.byref(ow),
            )
            if rc == 0:
                # Rows are packed contiguously at the ACTUAL scaled width
                # (== the computed buffer dims on libjpeg-turbo, but
                # re-interpret rather than slice to stay correct if the
                # library rounds the scale).
                k = oh.value * ow.value * 3
                return out.ravel()[:k].reshape(oh.value, ow.value, 3).copy()
            # rc=4: library rounded the scale up past the buffer — fall
            # through to the exact full-size decode.
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


def resize_axis_linear(
    x: np.ndarray, axis: int, idx0: np.ndarray, idx1: np.ndarray,
    w1: np.ndarray, out_size: int,
) -> np.ndarray:
    """Native per-axis linear resize, bit-exact with the numpy expression
    ``take(x, idx0, axis)*(1-w1) + take(x, idx1, axis)*w1`` at f32
    (ops/interp.py:resize_hw_np — the host pipeline's resize hot loop).
    Raises when the native runtime is unavailable (callers fall back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    x = np.ascontiguousarray(x, np.float32)
    axis = axis % x.ndim
    outer = int(np.prod(x.shape[:axis], dtype=np.int64))
    inner = int(np.prod(x.shape[axis + 1 :], dtype=np.int64))
    in_size = x.shape[axis]
    out_shape = x.shape[:axis] + (int(out_size),) + x.shape[axis + 1 :]
    out = np.empty(out_shape, np.float32)
    idx0 = np.ascontiguousarray(idx0, np.int32)
    idx1 = np.ascontiguousarray(idx1, np.int32)
    w1 = np.ascontiguousarray(w1, np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    rc = lib.mtt_resize_axis_linear_f32(
        x.ctypes.data_as(fp), out.ctypes.data_as(fp),
        outer, in_size, inner,
        idx0.ctypes.data_as(ip), idx1.ctypes.data_as(ip),
        w1.ctypes.data_as(fp), int(out_size),
    )
    if rc != 0:
        raise RuntimeError(f"resize_axis failed ({rc})")
    return out


def affine_warp(
    x: np.ndarray, theta: np.ndarray, gxv: np.ndarray, gyv: np.ndarray,
    x_orig: tuple, y_orig: tuple,
) -> np.ndarray:
    """Fused simulator warp: the grid chain of
    ops/movements.py:simulate_movement_resized (apply_theta -> to_orig ->
    f32 round) evaluated on the fly per output pixel, plus the bilinear
    align_corners=True gather from ONE shared source frame. Bit-exact with
    the numpy chain + :func:`grid_sample_bilinear` (tests/test_runtime.py).

    x: (H, W, C) f32, C in {1, 2, 3}; theta: (N, 2, 3) f64;
    gxv (OW) / gyv (OH): align_corners=True normalized output positions;
    x_orig / y_orig: to_orig ``(vsize, rsize, osize)`` per axis with
    rsize < 0 for the identity branch. Returns (N, OH, OW, C) f32.
    Raises when the native runtime is unavailable (callers fall back)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native runtime unavailable")
    x = np.ascontiguousarray(x, np.float32)
    theta = np.ascontiguousarray(theta, np.float64)
    gxv = np.ascontiguousarray(gxv, np.float64)
    gyv = np.ascontiguousarray(gyv, np.float64)
    h, w, c = x.shape
    n = theta.shape[0]
    ow, oh = gxv.shape[0], gyv.shape[0]
    out = np.empty((n, oh, ow, c), np.float32)
    fp = ctypes.POINTER(ctypes.c_float)
    dp = ctypes.POINTER(ctypes.c_double)
    rc = lib.mtt_affine_warp_f32(
        x.ctypes.data_as(fp), h, w, c,
        theta.ctypes.data_as(dp), n,
        gxv.ctypes.data_as(dp), ow, gyv.ctypes.data_as(dp), oh,
        float(x_orig[0]), float(x_orig[1]), float(x_orig[2]),
        float(y_orig[0]), float(y_orig[1]), float(y_orig[2]),
        out.ctypes.data_as(fp),
    )
    if rc != 0:
        raise RuntimeError(f"affine_warp failed ({rc})")
    return out


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

"""Image resizing with exact torch ``F.interpolate`` semantics.

The reference resizes with ``torch.nn.functional.interpolate`` in
``bilinear`` (align_corners=False) and ``nearest`` (legacy asymmetric) modes
throughout (reference: master_thesis/utils.py:489-508, :536-547, :583-593).
PSNR parity requires bit-level agreement with those coordinate conventions,
which differ from ``jax.image.resize``:

- torch ``nearest``:  ``src = floor(dst * in / out)`` (asymmetric, no half-pixel
  offset).
- torch ``bilinear`` (align_corners=False): ``src = (dst + 0.5) * in/out - 0.5``
  with edge clamping of the two gathered taps.
- torch ``bilinear`` (align_corners=True): ``src = dst * (in-1)/(out-1)``.

All index/weight tables are computed with numpy at trace time (shapes are
static under jit), so each resize lowers to two gathers and a lerp per axis —
fully fusable by XLA, no dynamic shapes.

Layout: channel-last. ``resize_hw`` resizes the two axes *before* the last
axis, i.e. works on ``(..., H, W, C)``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    # torch legacy 'nearest': floor(i * in / out)
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def _linear_taps(
    in_size: int, out_size: int, align_corners: bool
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (idx0, idx1, weight-of-idx1) for a 1-D linear resize."""
    if align_corners and out_size > 1:
        src = np.arange(out_size) * ((in_size - 1) / (out_size - 1))
    elif align_corners:
        src = np.zeros(out_size)
    else:
        src = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
    src = np.clip(src, 0.0, max(in_size - 1, 0))
    idx0 = np.floor(src).astype(np.int64)
    idx0 = np.clip(idx0, 0, in_size - 1)
    idx1 = np.clip(idx0 + 1, 0, in_size - 1)
    w1 = (src - idx0).astype(np.float32)
    return idx0, idx1, w1


def _take(x: jnp.ndarray, idx: np.ndarray, axis: int) -> jnp.ndarray:
    return jnp.take(x, jnp.asarray(idx), axis=axis)


def _use_mm_impl() -> bool:
    """Matmul resize on TPU-class backends (XLA lowers jnp.take to slow
    per-index slice loops there); gather/take resize on CPU."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


def _resize_axis_mm(x: jnp.ndarray, weights: np.ndarray, axis: int) -> jnp.ndarray:
    """Applies a dense (out, in) interpolation matrix along ``axis`` as one
    MXU matmul — the TPU-native form of a static-index resize. The matrix has
    <= 2 nonzeros per row, so values are bit-identical to the two-tap lerp
    (f32 accumulate, HIGHEST precision)."""
    import jax

    m = jnp.asarray(weights)  # (out, in) f32
    y = jnp.moveaxis(x, axis, -1)
    lead_shape = y.shape[:-1]
    y2 = y.reshape(-1, y.shape[-1])
    out = jax.lax.dot_general(
        y2.astype(jnp.float32),
        m.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return jnp.moveaxis(out.reshape(*lead_shape, m.shape[0]), -1, axis)


def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    idx0, idx1, w1 = _linear_taps(in_size, out_size, align_corners)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, idx0), 1.0 - w1)
    np.add.at(m, (rows, idx1), w1)
    return m


def _nearest_matrix(in_size: int, out_size: int) -> np.ndarray:
    idx = _nearest_indices(in_size, out_size)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), idx] = 1.0
    return m


def resize_axis_nearest(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    if _use_mm_impl():
        return _resize_axis_mm(x, _nearest_matrix(x.shape[axis], out_size), axis)
    return _take(x, _nearest_indices(x.shape[axis], out_size), axis)


def resize_axis_linear(
    x: jnp.ndarray, out_size: int, axis: int, align_corners: bool = False
) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if _use_mm_impl():
        return _resize_axis_mm(x, _linear_matrix(in_size, out_size, align_corners), axis)
    idx0, idx1, w1 = _linear_taps(in_size, out_size, align_corners)
    x0 = _take(x, idx0, axis)
    x1 = _take(x, idx1, axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w1 = jnp.asarray(w1, dtype=x.dtype).reshape(shape)
    return x0 * (1 - w1) + x1 * w1


def resize_hw_np(
    x: np.ndarray,
    size: Sequence[int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> np.ndarray:
    """Numpy twin of :func:`resize_hw` for the host data pipeline.

    Shares the exact same index/weight tables, so host preprocessing and
    device ops agree bit-for-bit (no jax involvement on worker threads).
    """
    h, w = int(size[0]), int(size[1])
    h_axis, w_axis = x.ndim - 3, x.ndim - 2

    def take(arr, idx, axis):
        return np.take(arr, idx, axis=axis)

    if mode == "nearest":
        if x.shape[h_axis] != h:
            x = take(x, _nearest_indices(x.shape[h_axis], h), h_axis)
        if x.shape[w_axis] != w:
            x = take(x, _nearest_indices(x.shape[w_axis], w), w_axis)
        return x
    if mode == "bilinear":
        for axis, out_size in ((h_axis, h), (w_axis, w)):
            in_size = x.shape[axis]
            if in_size == out_size:
                continue
            idx0, idx1, w1 = _linear_taps(in_size, out_size, align_corners)
            if x.dtype == np.float32:
                # Native per-axis kernel: bit-exact with the numpy
                # expression below (same tap tables, same f32 op order —
                # tests/test_runtime.py), ~5x faster on the host pipeline's
                # resize hot loop. Falls back when the runtime is absent.
                try:
                    from master_thesis_tpu.runtime import native as _native

                    x = _native.resize_axis_linear(
                        x, axis, idx0, idx1, w1.astype(np.float32), out_size
                    )
                    continue
                except Exception:
                    pass
            shape = [1] * x.ndim
            shape[axis] = out_size
            w1 = w1.astype(x.dtype).reshape(shape)
            x = take(x, idx0, axis) * (1 - w1) + take(x, idx1, axis) * w1
        return x
    raise ValueError(f"unknown resize mode: {mode}")


def resize_hw(
    x: jnp.ndarray,
    size: Sequence[int],
    mode: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resizes axes (-3, -2) of a channel-last array to ``size=(H', W')``."""
    h, w = int(size[0]), int(size[1])
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    if mode == "nearest":
        if x.shape[h_axis] != h:
            x = resize_axis_nearest(x, h, h_axis)
        if x.shape[w_axis] != w:
            x = resize_axis_nearest(x, w, w_axis)
        return x
    if mode == "bilinear":
        x = resize_axis_linear(x, h, h_axis, align_corners)
        x = resize_axis_linear(x, w, w_axis, align_corners)
        return x
    raise ValueError(f"unknown resize mode: {mode}")

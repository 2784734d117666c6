"""Image transforms (TPU analog of reference TransformsUtils, utils.py:466-640).

Channel-last layout throughout: sequences are ``(F, H, W, C)`` on the host
pipeline and ``(B, F, H, W, C)`` on device.

The mask dilation replaces the reference's host-side ``cv2.dilate`` with a
cross-structuring-element morphological dilate expressed as two
``lax.reduce_window`` max-pools (one horizontal, one vertical — their max is
exactly the cross-kernel dilate). It runs on-device, fuses with the
compositing that follows, and is iterated ``iterations`` times like the
reference (utils.py:618-640). The host pipeline may still use cv2 for
CPU-side preprocessing; both agree bit-for-bit on binary masks (tested).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from master_thesis_tpu.ops import interp


def resize(
    image: jnp.ndarray,
    size: Sequence[int],
    mode: str = "bilinear",
    keep_ratio: bool = True,
) -> jnp.ndarray:
    """Resizes ``(F, H, W, C)`` (or any ``(..., H, W, C)``) images.

    Replicates the reference's keep-ratio behavior exactly, including the
    quirk that a ``size=(H', -1)`` request slices with ``[:, :-1]`` and so
    drops the last column (utils.py:485-491).
    """
    h, w = image.shape[-3], image.shape[-2]
    if keep_ratio and size[1] == -1:
        new_size = (size[0], round(w * size[0] / h))
        out = interp.resize_hw(image, new_size, mode=mode)
        return out[..., : size[0], : size[1], :]
    if keep_ratio:
        new_h = size[0] if h < w else round(h * size[1] / w)
        new_w = size[1] if w <= h else round(w * size[0] / h)
        out = interp.resize_hw(image, (new_h, new_w), mode=mode)
        return out[..., : size[0], : size[1], :]
    return interp.resize_hw(image, size, mode=mode)


def resize_set(
    x: jnp.ndarray, v: jnp.ndarray, y: jnp.ndarray, size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resizes frames (bilinear) and visibility maps (nearest) to ``size``².

    Reference: utils.py:511-549 (note ``v`` uses interpolate's default
    nearest mode there).
    """
    x_new = interp.resize_hw(x, (size, size), mode="bilinear")
    v_new = interp.resize_hw(v, (size, size), mode="nearest")
    y_new = interp.resize_hw(y, (size, size), mode="bilinear")
    return x_new, v_new, y_new


def resize_set_bis(
    x_target: jnp.ndarray,
    m_target: jnp.ndarray,
    x_ref: jnp.ndarray,
    m_ref: jnp.ndarray,
    size: Sequence[int],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Resizes target ``(B,H,W,C)`` + refs ``(B,F,H,W,C)`` (masks nearest).

    Reference: utils.py:551-595.
    """
    h, w = x_ref.shape[-3], x_ref.shape[-2]
    if h == size[0] and w == size[1]:
        return x_target, m_target, x_ref, m_ref
    x_target_new = interp.resize_hw(x_target, size, mode="bilinear")
    m_target_new = interp.resize_hw(m_target, size, mode="nearest")
    x_ref_new = interp.resize_hw(x_ref, size, mode="bilinear")
    m_ref_new = interp.resize_hw(m_ref, size, mode="nearest")
    return x_target_new, m_target_new, x_ref_new, m_ref_new


def crop(
    image: jnp.ndarray, size: Sequence[int], crop_position: Sequence[int]
) -> jnp.ndarray:
    """Crops ``(..., H, W, C)`` at ``crop_position`` (top-left), static shapes.

    The reference samples the position with host randomness (utils.py:597-616);
    here the caller supplies it so the op stays deterministic/jittable.
    """
    ph, pw = crop_position
    return image[..., ph : ph + size[0], pw : pw + size[1], :]


def dilate(
    mask: jnp.ndarray, filter_size: Sequence[int] = (3, 3), iterations: int = 4
) -> jnp.ndarray:
    """Morphological dilation with a cross structuring element, on device.

    Equivalent to ``cv2.dilate(mask, MORPH_CROSS(kh, kw), iterations)``
    (reference utils.py:618-640): one cross-dilate equals the elementwise max
    of a ``1 x kw`` and a ``kh x 1`` max-pool.

    Args:
        mask: ``(..., H, W, C)`` float or bool mask.
        filter_size: cross kernel size ``(kh, kw)`` (odd).
        iterations: number of times the dilation is applied.
    """
    kh, kw = int(filter_size[0]), int(filter_size[1])
    orig_dtype = mask.dtype
    x = mask.astype(jnp.float32)
    window_h = [1] * x.ndim
    window_h[-3] = kh
    window_w = [1] * x.ndim
    window_w[-2] = kw
    pad = [(0, 0)] * x.ndim
    pad_h = list(pad)
    pad_h[-3] = (kh // 2, kh // 2)
    pad_w = list(pad)
    pad_w[-2] = (kw // 2, kw // 2)
    for _ in range(iterations):
        vert = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, tuple(window_h), (1,) * x.ndim, pad_h
        )
        horz = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, tuple(window_w), (1,) * x.ndim, pad_w
        )
        x = jnp.maximum(vert, horz)
    return x.astype(orig_dtype)

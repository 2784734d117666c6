"""Loss functions (TPU analog of reference LossesUtils, utils.py:129-224).

All losses are pure jnp functions of arrays, jit/grad-friendly. Dynamic-shape
constructs in the reference (boolean row selection by ``batch_mask``,
utils.py:158-165) are re-expressed as weighted reductions so everything
compiles to static shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# Sobel kernels, (kh, kw); the reference applies them as a grouped conv over
# the 3 RGB channels (utils.py:131-136, :193-224).
_GRAD_H = jnp.asarray([[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]])
_GRAD_V = jnp.asarray([[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]])


def masked_l1(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    mask: jnp.ndarray,
    batch_mask: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
    weight: float = 1.0,
) -> jnp.ndarray:
    """L1 between ``y_hat`` and ``y`` restricted to ``mask`` (utils.py:138-169).

    - ``reduction='mean'``: mean of ``|y_hat - y| * mask`` over all elements
      (of the rows kept by ``batch_mask``).
    - ``reduction='sum'``: sum normalized by ``sum(mask) + 1e-9``. Note the
      mask may have fewer channels than the images; the normalizer counts
      mask elements (not broadcast elements), matching the reference.
    - ``batch_mask``: optional ``(B,)`` bool; rows where it is False are
      excluded. If no rows remain the loss is 0.
    """
    diff = jnp.abs(y_hat * mask - y * mask)
    if batch_mask is not None:
        bm = batch_mask.astype(diff.dtype).reshape(
            (batch_mask.shape[0],) + (1,) * (diff.ndim - 1)
        )
        diff = diff * bm
        n_rows = jnp.sum(batch_mask.astype(diff.dtype))
    else:
        n_rows = None

    if reduction == "sum":
        mask_sum = jnp.sum(
            mask * bm if batch_mask is not None else mask
        )
        return weight * jnp.sum(diff) / (mask_sum + 1e-9)
    if reduction == "mean":
        if batch_mask is None:
            return weight * jnp.mean(diff)
        per_row = float(jnp.size(diff) // diff.shape[0])
        denom = n_rows * per_row
        return weight * jnp.where(denom > 0, jnp.sum(diff) / jnp.maximum(denom, 1.0), 0.0)
    raise ValueError(f"unknown reduction: {reduction}")


def perceptual(
    feats_hat: Sequence[jnp.ndarray],
    feats_gt: Sequence[jnp.ndarray],
    weight: float = 1.0,
) -> jnp.ndarray:
    """Mean L1 across VGG pool-feature pyramids (utils.py:171-191).

    Takes the two feature lists (computed by the caller's VGG apply) so the
    feature extraction can be shared/checkpointed by the train step.
    """
    loss = 0.0
    for fh, fg in zip(feats_hat, feats_gt):
        loss = loss + jnp.mean(jnp.abs(fh - fg))
    return weight * loss / len(feats_hat)


def sobel_grads(y: jnp.ndarray) -> jnp.ndarray:
    """Horizontal+vertical Sobel responses of ``(B, H, W, C)`` images.

    Returns ``(B, H, W, 2C)`` (H-gradients then V-gradients, per channel),
    computed as a depthwise conv — maps to an XLA fused conv on TPU.
    """
    c = y.shape[-1]
    # Depthwise kernel: HWIO with I=1 (per group) and O=2C, out channel
    # 2*ch+j being Sobel kernel j applied to input channel ch.
    k = jnp.stack([_GRAD_H, _GRAD_V], axis=-1)  # (3, 3, 2)
    k = jnp.tile(k, (1, 1, c)).reshape(3, 3, 1, 2 * c)
    dtype = jnp.result_type(y.dtype, jnp.float32)
    out = jax.lax.conv_general_dilated(
        y.astype(dtype),
        k.astype(dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    # out channels are interleaved (c0_h, c0_v, c1_h, ...); match the
    # reference's concatenated ordering (all H grads then all V grads).
    out = out.reshape(*out.shape[:-1], c, 2)
    return jnp.concatenate([out[..., 0], out[..., 1]], axis=-1)


def grad(
    y_hat: jnp.ndarray, y: jnp.ndarray, reduction: str = "mean", weight: float = 1.0
) -> jnp.ndarray:
    """Sobel gradient loss (utils.py:193-224)."""
    gh = sobel_grads(y_hat)
    gg = sobel_grads(y)
    ones = jnp.ones_like(gh)
    return masked_l1(gh, gg, ones, reduction=reduction, weight=weight)

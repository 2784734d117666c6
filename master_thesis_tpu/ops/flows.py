"""Dense-flow utilities (TPU analog of reference FlowsUtils, utils.py:12-126).

Flows are stored as *absolute* sampling grids in normalized ``[-1, 1]``
coordinates: ``flow[b, f, i, j] = (x, y)`` is where frame ``f`` samples from
to land at pixel ``(i, j)``. A *relative* flow is the displacement from the
identity grid. This matches the reference's convention so trained DFPN
checkpoints mean the same thing.

Layout is channel-last: images ``(B, F, H, W, C)``, visibility maps
``(B, F, H, W, 1)``, flows ``(B, F, H, W, 2)`` with ``(x, y)`` last.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from master_thesis_tpu.ops import interp
from master_thesis_tpu.ops.grid_sample import grid_sample


def identity_grid(h: int, w: int) -> jnp.ndarray:
    """Identity sampling grid ``(H, W, 2)`` (align_corners=True spacing)."""
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx, gy], axis=-1)


def flow_abs_to_relative(flow: jnp.ndarray) -> jnp.ndarray:
    """(B,F,H,W,2) absolute grid -> relative displacement.

    Reference: utils.py:16-32.
    """
    h, w = flow.shape[-3], flow.shape[-2]
    return flow - identity_grid(h, w).astype(flow.dtype)


def flow_relative_to_abs(flow_rel: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`flow_abs_to_relative`. Reference: utils.py:34-51."""
    h, w = flow_rel.shape[-3], flow_rel.shape[-2]
    return flow_rel + identity_grid(h, w).astype(flow_rel.dtype)


def crop_flow(
    flow: jnp.ndarray, crop_size: Sequence[int], crop_position: Sequence[int]
) -> jnp.ndarray:
    """Crops an absolute flow, rescaling displacements to the new frame.

    Reference: utils.py:53-75.
    """
    h, w = flow.shape[-3], flow.shape[-2]
    ch, cw = crop_size
    ph, pw = crop_position
    rel = flow_abs_to_relative(flow)
    rel = rel[..., ph : ph + ch, pw : pw + cw, :]
    scale = jnp.asarray([w / cw, h / ch], dtype=flow.dtype)
    return flow_relative_to_abs(rel * scale)


def align_set(
    x: jnp.ndarray, v: jnp.ndarray, flow: jnp.ndarray, precision=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Warps frames ``x`` (bilinear) and visibility ``v`` (nearest) by ``flow``.

    The reference's hot warp (utils.py:77-104): frames use bilinear with
    align_corners=True, visibility maps use nearest so they stay binary.

    Args:
        x: ``(B, F, H, W, C)`` frames.
        v: ``(B, F, H, W, 1)`` visibility maps.
        flow: ``(B, F, H, W, 2)`` absolute flows.
        precision: matmul precision of both warps (see ops/grid_sample.py);
            ``None`` = full f32. Reduced precision is lossless for the
            nearest-mode visibility warp — its weights are one-hot and the
            maps are 0/1, so every product is exact in bf16 too.

    Returns:
        ``(x_aligned, v_aligned)`` with the input shapes.
    """
    b, f, h, w, c = x.shape
    grid = flow.reshape(b * f, h, w, 2)
    x_aligned = grid_sample(
        x.reshape(b * f, h, w, c), grid, mode="bilinear", align_corners=True,
        precision=precision,
    )
    v_aligned = grid_sample(
        v.reshape(b * f, h, w, v.shape[-1]), grid, mode="nearest",
        align_corners=True, precision=precision,
    )
    return x_aligned.reshape(x.shape), v_aligned.reshape(v.shape)


def resize_flow(
    flow: jnp.ndarray, size: Sequence[int], mode: str = "nearest"
) -> jnp.ndarray:
    """Spatially resizes a flow field (values untouched — they are absolute).

    Reference: utils.py:106-126.
    """
    return interp.resize_hw(flow, size, mode=mode, align_corners=False)

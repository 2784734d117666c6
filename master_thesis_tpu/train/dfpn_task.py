"""DFPN training/eval steps (TPU analog of reference model_dfpn.py:135-394).

One jit contains: VGG feature extraction (frozen), DFPN forward, the
multi-resolution pyramid construction, the three predicted-flow warps, the
six-part loss, and the Adam update.

Loss parity notes (reference compute_loss, model_dfpn.py:210-293):
    - correlation L1 vs the ground-truth VGG correlation of the *clean*
      frames (no masks), mean reduction.
    - flow L1 at 16/64/256, batch-masked by ``flows_use`` (only items built
      by the movement simulator carry supervised flow).
    - alignment-reconstruction L1 at 64/256 (sum-normalized) masked by the
      target visibility and excluding out-of-range flow positions.
    - The reference's ``_train_val_wrapper`` also warps with the *ground
      truth* flows and builds GT visibility maps (model_dfpn.py:358-375);
      those tensors are never consumed by any loss — dead computation that
      this implementation intentionally skips (2 warps saved per step).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import functools

import jax
import jax.numpy as jnp

from master_thesis_tpu.models.dfpn import correlation_masked_4d, prepare_vgg_input
from master_thesis_tpu.ops import flows as flows_ops
from master_thesis_tpu.ops import interp, losses, transforms

LOSSES_NAMES = (
    "corr_loss", "flow_16", "flow_64", "flow_256",
    "alignment_recons_64", "alignment_recons_256",
)


def target_ref_indexes(frames_n: int) -> Tuple[int, list]:
    t = frames_n // 2
    return t, [i for i in range(frames_n) if i != t]


def _vgg_pool4(vgg_apply: Callable, x_flat: jnp.ndarray) -> jnp.ndarray:
    """Pool-4 (index 3) VGG features of pre-normalized 256² frames."""
    return vgg_apply(x_flat, normalize_input=False)[3]


def forward_and_loss(
    dfpn_apply: Callable,
    params,
    vgg_apply: Callable,
    x: jnp.ndarray,
    m: jnp.ndarray,
    y: jnp.ndarray,
    flow_gt: jnp.ndarray,
    flows_use: jnp.ndarray,
    base_size: int = 256,
    constrain: Callable = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Runs DFPN on a ``(B, F, H, W, C)`` batch and computes the 6-part loss.

    ``base_size`` must match the model's cascade resolution (256 in
    production; scaled down only for cheap multi-device tests).
    ``constrain`` optionally applies a sharding constraint to the sliced
    reference stacks (sequence parallelism over the frame axis).
    """
    b, f, h, w, _ = x.shape
    t, r_list = target_ref_indexes(f)
    x_t, m_t = x[:, t], m[:, t]
    x_r, m_r = x[:, r_list], m[:, r_list]
    if constrain is not None:
        x_r, m_r = constrain(x_r), constrain(m_r)
    fr = len(r_list)

    # Frozen VGG features for the correlation volume (reference
    # model_dfpn.py:510-518 computes them under no_grad).
    feats_t = _vgg_pool4(vgg_apply, prepare_vgg_input(x_t, size=base_size))
    feats_r = _vgg_pool4(
        vgg_apply, prepare_vgg_input(x_r.reshape(b * fr, h, w, 3), size=base_size)
    )
    feats_r = feats_r.reshape(b, fr, *feats_r.shape[1:])
    feats_t = jax.lax.stop_gradient(feats_t)
    feats_r = jax.lax.stop_gradient(feats_r)

    corr, flow_16, flow_64, flow_256 = dfpn_apply(
        params, x_t, m_t, x_r, m_r, feats_t, feats_r
    )

    # Multi-resolution pyramids (reference model_dfpn.py:350-356). The
    # 16-resolution image pyramid and its warp exist in the reference
    # (model_dfpn.py:350, :377-379) but feed no loss — skipped here along
    # with the GT warps (see module docstring); only ``flow_16_gt`` from the
    # 16 tier is consumed.
    s16, s64 = base_size // 16, base_size // 4
    x_64, v_64, _ = transforms.resize_set(x, 1 - m, y, s64)
    x_256, v_256, y_256 = x, 1 - m, y

    flow_16_gt = flows_ops.resize_flow(flow_gt[:, r_list], (s16, s16))
    flow_64_gt = flows_ops.resize_flow(flow_gt[:, r_list], (s64, s64))
    flow_256_gt = flow_gt[:, r_list]

    x_64_al, _ = flows_ops.align_set(x_64[:, r_list], v_64[:, r_list], flow_64)
    x_256_al, _ = flows_ops.align_set(x_256[:, r_list], v_256[:, r_list], flow_256)

    # GT correlation from clean frames (reference model_dfpn.py:242-257).
    if h == base_size and w == base_size:
        y_vgg_in = y.reshape(b * f, h, w, 3)
    else:
        y_vgg_in = interp.resize_hw(
            y.reshape(b * f, h, w, 3), (base_size, base_size), mode="bilinear"
        )
    y_feats = jax.lax.stop_gradient(vgg_apply(y_vgg_in))[3]
    y_feats = y_feats.reshape(b, f, *y_feats.shape[1:])
    corr_y = correlation_masked_4d(y_feats[:, t], None, y_feats[:, r_list], None)
    corr_loss = jnp.mean(jnp.abs(corr - corr_y))

    ones = jnp.ones_like(flow_16)
    flow_loss_16 = losses.masked_l1(flow_16, flow_16_gt, ones, batch_mask=flows_use)
    flow_loss_64 = losses.masked_l1(
        flow_64, flow_64_gt, jnp.ones_like(flow_64), batch_mask=flows_use
    )
    flow_loss_256 = losses.masked_l1(
        flow_256, flow_256_gt, jnp.ones_like(flow_256), batch_mask=flows_use
    )

    # Out-of-range flow positions are excluded from the reconstruction loss
    # (reference model_dfpn.py:269-272).
    def out_mask(flow):
        oob = (flow < -1).astype(jnp.float32) + (flow > 1).astype(jnp.float32)
        return jnp.clip(jnp.sum(oob, axis=-1, keepdims=True), 0, 1)

    v_t_64 = jnp.broadcast_to(v_64[:, t][:, None], v_64[:, r_list].shape)
    v_t_256 = jnp.broadcast_to(v_256[:, t][:, None], v_256[:, r_list].shape)
    x_t_64 = jnp.broadcast_to(x_64[:, t][:, None], x_64[:, r_list].shape)
    x_t_256 = jnp.broadcast_to(x_256[:, t][:, None], x_256[:, r_list].shape)

    recons_64 = losses.masked_l1(
        x_t_64, x_64_al, v_t_64 * (1 - out_mask(flow_64)), reduction="sum"
    )
    recons_256 = losses.masked_l1(
        x_t_256, x_256_al, v_t_256 * (1 - out_mask(flow_256)), reduction="sum"
    )

    total = (
        corr_loss + flow_loss_16 + flow_loss_64 + flow_loss_256 + recons_64 + recons_256
    )
    return total, {
        "corr_loss": corr_loss,
        "flow_16": flow_loss_16,
        "flow_64": flow_loss_64,
        "flow_256": flow_loss_256,
        "alignment_recons_64": recons_64,
        "alignment_recons_256": recons_256,
    }


def log_alignment_frames(
    logger, align_fn: Callable, x, m, y, step: int, max_items: int = 4
):
    """Logs aligned-frame image grids at test time (TPU analog of reference
    ``_log_frames``, model_dfpn.py:411-456): per batch item, a frame strip of
    [masked input | aligned refs (target inserted) | visibility maps |
    trivial copy-composite].
    """
    import numpy as np

    b, f = x.shape[0], x.shape[1]
    t, r_list = target_ref_indexes(f)
    x_t, m_t = x[:, t], m[:, t]
    x_ref_aligned, v_ref_aligned, v_map = align_fn(x_t, m_t, x[:, r_list], m[:, r_list])

    x_t_rep = jnp.broadcast_to(x_t[:, None], x_ref_aligned.shape)
    y_hat_trivial = x_t_rep * (1 - v_map) + x_ref_aligned * v_map

    x_np, m_np, y_np = map(np.asarray, (x, m, y))
    xa, va, triv = map(np.asarray, (x_ref_aligned, v_ref_aligned, y_hat_trivial))
    for i in range(min(b, max_items)):
        aligned = np.insert(xa[i], t, x_np[i, t], axis=0)
        vmaps = np.insert(
            np.repeat(va[i], 3, axis=-1), t, np.repeat(m_np[i, t], 3, axis=-1), axis=0
        )
        trivial = np.insert(triv[i], t, y_np[i, t], axis=0)
        strip = np.concatenate([x_np[i], aligned, vmaps, trivial], axis=1)  # stack rows
        logger.log_images(f"frames/{i + 1}", np.clip(strip, 0, 1), step)


def _make_constrain(ref_sharding):
    if ref_sharding is None:
        return None
    return lambda t: jax.lax.with_sharding_constraint(t, ref_sharding)


def make_train_step(
    dfpn_apply: Callable, vgg_apply: Callable,
    base_size: int = 256, ref_sharding=None, donate: bool = True,
):
    """``ref_sharding``: optional NamedSharding for the (B, F-1, ...)
    reference stacks — sequence parallelism over the frame axis, same
    contract as chn_task.make_train_step. ``donate`` as in chn_task."""
    constrain = _make_constrain(ref_sharding)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, x, m, y, flow_gt, flows_use):
        def loss_fn(params):
            return forward_and_loss(
                dfpn_apply, params, vgg_apply, x, m, y, flow_gt, flows_use,
                base_size=base_size, constrain=constrain,
            )

        (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        items["loss"] = total
        return new_state, items

    return train_step


def make_eval_step(
    dfpn_apply: Callable, vgg_apply: Callable,
    base_size: int = 256, ref_sharding=None,
):
    constrain = _make_constrain(ref_sharding)

    @jax.jit
    def eval_step(params, x, m, y, flow_gt, flows_use):
        total, items = forward_and_loss(
            dfpn_apply, params, vgg_apply, x, m, y, flow_gt, flows_use,
            base_size=base_size, constrain=constrain,
        )
        items["loss"] = total
        return items

    return eval_step

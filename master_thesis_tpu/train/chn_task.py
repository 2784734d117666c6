"""CHN training/eval steps (TPU analog of reference model_chn.py:256-422).

Everything per-step runs inside one jit: frozen aligner, CHN forward, the
5-part loss, Adam update, and on-device PSNR/SSIM for validation. The
aligner and the VGG feature extractor enter as closures over frozen params,
so CHN is aligner-agnostic exactly like the reference (CPN or DFPN,
__main__.py:28-35).

Loss parity notes (reference model_chn.py:324-376):
    - non-hole (w=0.5), visible-hole (w=2) on ``y_hat``; non-visible-hole
      (w=1) on the composite; all sum-normalized masked L1.
    - perceptual (w=0.5) over 5 VGG pool maps of the folded ``(B*F)`` frames.
      The reference's VGG extractor ``detach()``es every pool feature
      (model_vgg.py:43), so in torch the perceptual term contributes ZERO
      gradient to the generator — it is a logged scalar only. The default
      (``perceptual_grad=False``) reproduces that exactly (stop_gradient on
      both feature sets), which is required for optimizer-trajectory parity
      with the reference (tests/test_reference_parity.py). ``--perceptual_grad``
      opts into a live perceptual gradient as a documented deviation.
    - Sobel gradient loss (w=1). The reference's ``squeeze(2)`` formulation
      only supports one reference frame (frames_n=2); here it is applied to
      the folded ``(B*F)`` frames, which is identical for frames_n=2 and the
      natural generalization beyond it.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from master_thesis_tpu.ops import losses, measures

LOSSES_NAMES = ("loss_nh", "loss_vh", "loss_nvh", "loss_perceptual", "loss_grad")


def target_ref_indexes(frames_n: int) -> Tuple[int, list]:
    """Center frame is the target, the rest are references
    (reference model_chn.py:442-457)."""
    t = frames_n // 2
    return t, [i for i in range(frames_n) if i != t]


def compute_loss(
    y_target: jnp.ndarray,
    v_target: jnp.ndarray,
    y_hat: jnp.ndarray,
    y_hat_comp: jnp.ndarray,
    v_map: jnp.ndarray,
    vgg_apply: Callable,
    perceptual_grad: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Five-part CHN loss. Shapes: y_target (B,H,W,3); y_hat (B,F,H,W,3).

    ``perceptual_grad=False`` (default) stop-gradients the predicted VGG
    features too, matching the reference's feature ``detach()``
    (model_vgg.py:43) under which the perceptual term trains nothing."""
    b, f, h, w, c = y_hat.shape
    target = jnp.broadcast_to(y_target[:, None], y_hat.shape)

    nh_mask = jnp.broadcast_to(v_target[:, None], v_map.shape)
    loss_nh = losses.masked_l1(y_hat, target, nh_mask, reduction="sum", weight=0.5)
    loss_vh = losses.masked_l1(y_hat, target, v_map, reduction="sum", weight=2.0)
    nvh_mask = (1 - nh_mask) - v_map
    loss_nvh = losses.masked_l1(y_hat_comp, target, nvh_mask, reduction="sum", weight=1.0)

    y_hat_flat = y_hat.reshape(b * f, h, w, c)
    target_flat = target.reshape(b * f, h, w, c)
    feats_hat = vgg_apply(y_hat_flat)
    if not perceptual_grad:
        feats_hat = jax.lax.stop_gradient(feats_hat)
    feats_gt = jax.lax.stop_gradient(vgg_apply(target_flat))
    loss_perceptual = losses.perceptual(feats_hat, feats_gt, weight=0.5)

    loss_grad = losses.grad(y_hat_flat, target_flat, reduction="mean", weight=1.0)

    total = loss_nh + loss_vh + loss_nvh + loss_perceptual + loss_grad
    return total, {
        "loss_nh": loss_nh,
        "loss_vh": loss_vh,
        "loss_nvh": loss_nvh,
        "loss_perceptual": loss_perceptual,
        "loss_grad": loss_grad,
    }


def make_train_step(
    chn_apply: Callable,
    align_fn: Callable,
    vgg_apply: Callable,
    ref_sharding=None,
    donate: bool = True,
    perceptual_grad: bool = False,
):
    """Builds the jitted CHN train step.

    ``perceptual_grad``: see :func:`compute_loss` — False (default) matches
    the reference's gradient-dead perceptual term.

    ``align_fn(x_t, m_t, x_refs, m_refs) -> (x_aligned, v_aligned, v_maps)``
    closes over frozen aligner params; gradients never flow into it.

    ``ref_sharding``: optional ``NamedSharding`` for the ``(B, F-1, ...)``
    reference tensors — sequence parallelism over the frame axis (the
    workload's natural sequence axis, SURVEY §5.7). The target frame count
    is odd so the full stack can't shard evenly; the refs stack can.

    ``donate``: donate the train-state buffers to the update (halves HBM
    held across the step); Config.donate_buffers turns it off for callers
    that must keep the pre-step state alive.
    """

    def _constrain(t):
        if ref_sharding is None:
            return t
        return jax.lax.with_sharding_constraint(t, ref_sharding)

    @functools.partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state, x, m, y):
        frames_n = x.shape[1]
        t, r_list = target_ref_indexes(frames_n)
        x_t, m_t = x[:, t], m[:, t]
        x_r, m_r = _constrain(x[:, r_list]), _constrain(m[:, r_list])
        y_t = y[:, t]

        xa, va, vm = jax.lax.stop_gradient(align_fn(x_t, m_t, x_r, m_r))
        xa, va, vm = _constrain(xa), _constrain(va), _constrain(vm)

        def loss_fn(params):
            y_hat, y_hat_comp = chn_apply(params, x_t, 1 - m_t, xa, va, vm)
            total, items = compute_loss(
                y_t, 1 - m_t, y_hat, y_hat_comp, vm, vgg_apply,
                perceptual_grad=perceptual_grad,
            )
            return total, items

        (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        items["loss"] = total
        return new_state, items

    return train_step


def make_eval_step(
    chn_apply: Callable,
    align_fn: Callable,
    vgg_apply: Callable,
    lpips_fn: Callable = None,
):
    """Validation step: loss + on-device PSNR/SSIM (and LPIPS when a
    converted metric net is available) of the first composite (reference
    model_chn.py:282-307 logs metrics on y_hat_comp[:, :, 0])."""

    @jax.jit
    def eval_step(params, x, m, y):
        frames_n = x.shape[1]
        t, r_list = target_ref_indexes(frames_n)
        x_t, m_t = x[:, t], m[:, t]
        x_r, m_r = x[:, r_list], m[:, r_list]
        y_t = y[:, t]

        xa, va, vm = align_fn(x_t, m_t, x_r, m_r)
        y_hat, y_hat_comp = chn_apply(params, x_t, 1 - m_t, xa, va, vm)
        total, items = compute_loss(y_t, 1 - m_t, y_hat, y_hat_comp, vm, vgg_apply)
        items["loss"] = total
        items["psnr"] = measures.psnr(y_hat_comp[:, 0], y_t)
        items["ssim"] = measures.ssim(y_hat_comp[:, 0], y_t)
        if lpips_fn is not None:
            items["lpips"] = lpips_fn(y_hat_comp[:, 0], y_t)
        return items, y_hat_comp

    return eval_step

"""Copy-and-Paste Network (CPN) affine aligner in flax.

TPU re-design of the reference's frozen third-party aligner
(model_cpn.py:13-118, itself from the Copy-and-Paste-Networks repo). Only
``align`` is on the reference's call path; the context-matching machinery
(Encoder / CM_Module / Decoder) is implemented for completeness and weight
coverage but never called by the inpainting pipeline (reference loads-but-
ignores it, model_cpn.py:177-296).

Parity quirk faithfully reproduced: ``A_Regressor.__call__`` applies
``conv5a``/``conv5b`` twice and never uses ``conv6a``/``conv6b`` even though
their parameters exist (reference model_cpn.py:164-174) — replicating the
bug is required for the published ``weight.pth`` to behave identically.

All CPN weights are frozen: call ``align`` under ``jax.lax.stop_gradient``
or simply keep the params out of the optimizer (the train steps do the
latter).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from master_thesis_tpu.models.nn_ext import Conv
from master_thesis_tpu.ops import interp
from master_thesis_tpu.ops.grid_sample import affine_grid, grid_sample


def _normalize(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=x.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=x.dtype)
    return (x - mean) / std


class AEncoder(nn.Module):
    """Alignment encoder: 224-square input, 256ch at 1/8 res
    (reference model_cpn.py:121-150)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_f, in_v):
        x = jnp.concatenate([_normalize(in_f), in_v], axis=-1)
        x = interp.resize_hw(x, (224, 224), mode="bilinear", align_corners=False)
        c = lambda f, k, s, p, name: Conv(
            features=f, kernel_size=(k, k), strides=(s, s), padding=(p, p),
            dtype=self.dtype, name=name,
        )
        x = nn.relu(c(64, 5, 2, 2, "conv12")(x))
        x = nn.relu(c(64, 3, 1, 1, "conv2")(x))
        x = nn.relu(c(128, 3, 2, 1, "conv23")(x))
        x = nn.relu(c(128, 3, 1, 1, "conv3")(x))
        x = nn.relu(c(256, 3, 2, 1, "conv34")(x))
        x = nn.relu(c(256, 3, 1, 1, "conv4a")(x))
        return nn.relu(c(256, 3, 1, 1, "conv4b")(x))


class ARegressor(nn.Module):
    """Affine regressor: concat feats -> 2x3 theta
    (reference model_cpn.py:153-174, incl. the conv5a/5b reuse quirk)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat1, feat2):
        c = lambda f, s, name: Conv(
            features=f, kernel_size=(3, 3), strides=(s, s), padding=(1, 1),
            dtype=self.dtype, name=name,
        )
        conv45 = c(512, 2, "conv45")
        conv5a = c(512, 1, "conv5a")
        conv5b = c(512, 1, "conv5b")
        conv56 = c(512, 2, "conv56")
        # The reference's forward applies conv5a/conv5b twice and never
        # touches its conv6a/conv6b parameters (model_cpn.py:170-171); those
        # dead weights are simply dropped by the checkpoint converter.

        x = jnp.concatenate([feat1, feat2], axis=-1)
        x = nn.relu(conv45(x))
        x = nn.relu(conv5a(x))
        x = nn.relu(conv5b(x))
        x = nn.relu(conv56(x))
        x = nn.relu(conv5a(x))
        x = nn.relu(conv5b(x))
        x = jnp.mean(x, axis=(-3, -2))  # global average pool
        theta = nn.Dense(6, dtype=self.dtype, name="fc")(x)
        return theta.reshape(-1, 2, 3)


class CPN(nn.Module):
    """Affine alignment of reference frames onto a target frame."""

    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.a_encoder = AEncoder(dtype=self.dtype, name="A_Encoder")
        self.a_regressor = ARegressor(dtype=self.dtype, name="A_Regressor")

    def __call__(self, x_target, m_target, x_refs, m_refs):
        return self.align(x_target, m_target, x_refs, m_refs)

    def align(
        self,
        x_target: jnp.ndarray,
        m_target: jnp.ndarray,
        x_refs: jnp.ndarray,
        m_refs: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Aligner interface shared with DFPN (reference model_cpn.py:31-91).

        Args:
            x_target: ``(B, H, W, 3)``; m_target: ``(B, H, W, 1)``.
            x_refs: ``(B, F, H, W, 3)``; m_refs: ``(B, F, H, W, 1)``.

        Returns:
            ``(x_aligned, v_aligned, v_maps)`` with ref-shaped layouts.
        """
        b, f, h, w, c = x_refs.shape
        x_refs_flat = x_refs.reshape(b * f, h, w, c)
        m_refs_flat = m_refs.reshape(b * f, h, w, 1)

        feat_t = self.a_encoder(x_target, m_target)  # (B, h', w', 256)
        feat_r = self.a_encoder(x_refs_flat, m_refs_flat)  # (B*F, h', w', 256)

        fh, fw, fc = feat_t.shape[1:]
        feat_t_rep = jnp.broadcast_to(
            feat_t[:, None], (b, f, fh, fw, fc)
        ).reshape(b * f, fh, fw, fc)

        theta = self.a_regressor(feat_t_rep, feat_r)  # (B*F, 2, 3)
        grid = affine_grid(theta, (h, w), align_corners=False)

        # Frames and visibility share the grid and the bilinear mode
        # (reference model_cpn.py:79-88), so one 4-channel warp covers both
        # — halves the tent-weight construction of the matmul warp. When the
        # module computes in bf16 (serving), the warp's matmuls run at bf16
        # precision too: its output only feeds the bf16 network input, so
        # the ~4e-3 warp error is below the network's own rounding, and the
        # MXU runs 3.4x faster than the f32-HIGHEST parity path.
        import jax

        warp_precision = (
            jax.lax.Precision.DEFAULT
            if self.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
        warped = grid_sample(
            jnp.concatenate([x_refs_flat, 1.0 - m_refs_flat], axis=-1),
            grid, mode="bilinear", align_corners=False,
            precision=warp_precision,
        )
        x_aligned = warped[..., :c].reshape(b, f, h, w, c)
        v_aligned = warped[..., c:].reshape(b, f, h, w, 1)
        v_aligned = (v_aligned > 0.5).astype(x_refs.dtype)
        v_maps = jnp.clip(v_aligned - (1.0 - m_target[:, None]), 0.0, 1.0)
        return x_aligned, v_aligned, v_maps


class Encoder(nn.Module):
    """Context encoder (unused by the pipeline; reference model_cpn.py:177-199)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, in_f, in_v):
        x = jnp.concatenate([_normalize(in_f), in_v], axis=-1)
        c = lambda f, k, s, p, name: Conv(
            features=f, kernel_size=(k, k), strides=(s, s), padding=(p, p),
            dtype=self.dtype, name=name,
        )
        x = nn.relu(c(64, 5, 2, 2, "conv12")(x))
        x = nn.relu(c(64, 3, 1, 1, "conv2")(x))
        x = nn.relu(c(128, 3, 2, 1, "conv23")(x))
        x = nn.relu(c(128, 3, 1, 1, "conv3")(x))
        return c(128, 3, 1, 1, "value3")(x)


def cm_module(c_feats: jnp.ndarray, v_t: jnp.ndarray, v_aligned: jnp.ndarray):
    """Context matching over visible overlap (reference model_cpn.py:202-254).

    c_feats: ``(B, F, h, w, C)`` (frame 0 = target); v_t: ``(B, H, W, 1)``;
    v_aligned: ``(B, F-1, H, W, 1)``.
    """
    b, f, h, w, cc = c_feats.shape
    v_t_r = interp.resize_hw(v_t, (h, w), mode="bilinear", align_corners=False)
    v_t_r = (v_t_r > 0.5).astype(c_feats.dtype)

    v_r = interp.resize_hw(v_aligned, (h, w), mode="bilinear", align_corners=False)
    v_r = (v_r > 0.5).astype(c_feats.dtype)  # (B, F-1, h, w, 1)

    vmap = v_t_r[:, None] * v_r  # (B, F-1, h, w, 1)
    v_sum = jnp.sum(vmap[..., 0], axis=(-2, -1))  # (B, F-1)
    zeros = v_sum < 1e-4
    v_sum = v_sum + zeros.astype(v_sum.dtype)

    gs = jnp.sum(
        vmap * c_feats[:, None, 0] * c_feats[:, 1:], axis=(-3, -2, -1)
    ) / (v_sum * cc)
    gs = jnp.where(zeros, 0.0, gs)  # (B, F-1)
    cos_sim = jnp.broadcast_to(gs[:, :, None, None, None], (b, f - 1, h, w, cc))

    c_match = _masked_softmax(cos_sim, v_r, axis=1)
    c_out = jnp.sum(c_feats[:, 1:] * c_match, axis=1)

    c_mask = jnp.sum(c_match * v_r, axis=1)
    c_mask = 1 - jnp.mean(c_mask, axis=-1, keepdims=True)
    return jnp.concatenate([c_feats[:, 0], c_out, c_mask], axis=-1), c_mask


def _masked_softmax(vec, mask, axis):
    masked_vec = vec * mask
    max_vec = jnp.max(masked_vec, axis=axis, keepdims=True)
    exps = jnp.exp(masked_vec - max_vec)
    masked_exps = exps * mask
    masked_sums = jnp.sum(masked_exps, axis=axis, keepdims=True)
    masked_sums = masked_sums + (masked_sums < 1e-4).astype(masked_sums.dtype)
    return masked_exps / masked_sums


class Decoder(nn.Module):
    """Dilated-conv decoder (unused by the pipeline; reference
    model_cpn.py:257-296)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = lambda f, k, p, d, name: Conv(
            features=f, kernel_size=(k, k), padding=(p, p), dilation=(d, d),
            dtype=self.dtype, name=name,
        )
        x = nn.relu(c(257, 3, 1, 1, "conv4")(x))
        x = nn.relu(c(257, 3, 1, 1, "conv5_1")(x))
        x = nn.relu(c(257, 3, 1, 1, "conv5_2")(x))
        x = nn.relu(c(257, 3, 2, 2, "convA4_1")(x))
        x = nn.relu(c(257, 3, 4, 4, "convA4_2")(x))
        x = nn.relu(c(257, 3, 8, 8, "convA4_3")(x))
        x = nn.relu(c(257, 3, 16, 16, "convA4_4")(x))
        x = nn.relu(c(257, 3, 1, 1, "conv3c")(x))
        x = nn.relu(c(128, 3, 1, 1, "conv3b")(x))
        x = nn.relu(c(128, 3, 1, 1, "conv3a")(x))
        x = jnp.repeat(jnp.repeat(x, 2, -3), 2, -2)
        x = nn.relu(c(64, 3, 1, 1, "conv32")(x))
        x = nn.relu(c(64, 3, 1, 1, "conv2")(x))
        x = jnp.repeat(jnp.repeat(x, 2, -3), 2, -2)
        x = c(3, 5, 2, 1, "conv21")(x)
        mean = jnp.asarray([0.485, 0.456, 0.406], dtype=x.dtype)
        std = jnp.asarray([0.229, 0.224, 0.225], dtype=x.dtype)
        return x * std + mean

"""Dense Flow Prediction Network (DFPN) in flax.

TPU re-design of the reference DFPN stack (model_dfpn.py:14-743): a VGG
correlation volume filled by a separable 4-D conv, a correlation->flow mixer,
and two cascaded flow refiners at 64 and 256 resolution. Layout is NHWC with
frames folded into batch; the 4-D cost volume is computed as one batched
MXU matmul (see ``correlation_masked_4d``).

The VGG feature extractor is passed in as ``(apply_fn, params)`` frozen
state: features are always computed under ``stop_gradient`` (the reference
wraps them in ``torch.no_grad``, model_dfpn.py:510-515).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from master_thesis_tpu.models.nn_ext import Conv, ConvTranspose2dTorch
from master_thesis_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD
from master_thesis_tpu.ops import flows as flows_ops
from master_thesis_tpu.ops import transforms


def correlation_masked_4d(
    x_target_feats: jnp.ndarray,
    v_target: Optional[jnp.ndarray],
    x_ref_feats: jnp.ndarray,
    v_ref: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Masked cosine-similarity cost volume (reference model_dfpn.py:534-565).

    Args:
        x_target_feats: ``(B, H, W, C)`` target features (NHWC).
        v_target: optional ``(B, H, W, 1)`` visibility.
        x_ref_feats: ``(B, F, H, W, C)`` reference features.
        v_ref: optional ``(B, F, H, W, 1)`` visibilities.

    Returns:
        ``(B, F, H, W, H, W)`` correlation volume: position ``(p, q)`` holds
        the cosine similarity of target pixel p's feature with ref pixel q's.
    """
    b, f, h, w, c = x_ref_feats.shape
    if v_target is not None:
        x_target_feats = x_target_feats * v_target
    if v_ref is not None:
        x_ref_feats = x_ref_feats * v_ref

    t = x_target_feats.reshape(b, h * w, c).astype(jnp.float32)
    t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-9)
    r = x_ref_feats.reshape(b, f, h * w, c).astype(jnp.float32)
    r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-9)

    # (B, 1, HW, C) x (B, F, C, HW) -> (B, F, HW, HW): one batched MXU matmul.
    corr = jnp.einsum(
        "bpc,bfqc->bfpq", t, r, precision=jax.lax.Precision.HIGHEST
    )
    return corr.reshape(b, f, h, w, h, w)


def softmax_3d(x: jnp.ndarray) -> jnp.ndarray:
    """Softmax over (q-space x frames) per target pixel — the reference's
    optional correlation normalization (model_dfpn.py:567-583, off by
    default there and here).

    x: ``(B, F, H, W, H, W)`` correlation volume.
    """
    b, f, h, w, _, _ = x.shape
    # (b, p_h, p_w, q_h*q_w*f) softmax over the last axis.
    xt = x.transpose(0, 2, 3, 4, 5, 1).reshape(b, h, w, -1)
    xt = jax.nn.softmax(xt, axis=-1)
    return xt.reshape(b, h, w, h, w, f).transpose(0, 5, 1, 2, 3, 4)


class SeparableConv4d(nn.Module):
    """4-D conv separated into two 2-D conv stacks over the cost volume's two
    spatial sub-spaces (reference model_dfpn.py:586-626).

    Input/output: ``(B, F, H, W, H, W)`` = (b, f, p-space, q-space).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr):
        b, f, h, w, _, _ = corr.shape
        c3 = lambda feats, name: Conv(
            features=feats, kernel_size=(3, 3), padding=(1, 1), dtype=self.dtype,
            name=name,
        )
        # Stage 1: conv over q-space, batch = (b, f, p).
        x = corr.reshape(b * f * h * w, h, w, 1).astype(self.dtype)
        x = nn.relu(c3(128, "conv1_0")(x))
        x = nn.relu(c3(256, "conv1_1")(x))
        x = c3(256, "conv1_2")(x)  # (b*f*p, h, w, 256)

        # Swap: batch becomes (b, f, q), spatial becomes p-space.
        x = x.reshape(b, f, h * w, h * w, 256)
        x = x.transpose(0, 1, 3, 2, 4)  # (b, f, q, p, 256)
        x = x.reshape(b * f * h * w, h, w, 256)
        x = nn.relu(c3(256, "conv2_0")(x))
        x = nn.relu(c3(128, "conv2_1")(x))
        x = c3(1, "conv2_2")(x)  # (b*f*q, h, w, 1)

        x = x.reshape(b, f, h * w, h, w)  # (b, f, q, p_h, p_w)
        x = x.transpose(0, 1, 3, 4, 2)  # (b, f, p_h, p_w, q)
        return x.reshape(b, f, h, w, h, w)


class AlignmentCorrelationMixer(nn.Module):
    """Cost volume -> coarse 16x16 flow (reference model_dfpn.py:629-674).

    The flattened p-space becomes channels; convs run over q-space.
    """

    corr_size: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, corr):
        b, f, h, w, _, _ = corr.shape
        cs = self.corr_size
        # (b, f, p_h, p_w, q_h, q_w) -> (b*f, q_h, q_w, p_h*p_w)
        x = corr.reshape(b * f, cs * cs, cs, cs).transpose(0, 2, 3, 1)
        x = x.astype(self.dtype)

        # Final three stages output the 2 flow components (== cs // 8 at the
        # reference's fixed cs=16, model_dfpn.py:638-660; written as a
        # literal 2 so scaled-down test configs keep a valid flow head).
        schedule = [
            (cs**2, 5, True), (cs**2, 3, True), (cs, 3, True),
            (cs, 5, True), (cs, 3, True), (cs // 2, 3, True),
            (cs // 2, 5, True), (cs // 2, 3, True), (cs // 4, 3, True),
            (cs // 4, 5, True), (cs // 4, 3, True), (2, 3, False),
            (2, 5, False), (2, 3, False),
        ]
        for i, (feats, k, relu) in enumerate(schedule):
            x = Conv(
                features=feats, kernel_size=(k, k), padding=(k // 2, k // 2),
                dtype=self.dtype, name=f"mixer_{i}",
            )(x)
            if relu:
                x = nn.relu(x)
        # (b*f, h, w, 2) -> (b, f, h, w, 2)
        return x.reshape(b, f, h, w, 2)


class FlowEstimator(nn.Module):
    """U-Net-ish 21-conv flow refiner (reference model_dfpn.py:677-743).

    Input channels: ref frame (3) + target frame (3) + ref mask (1) + target
    mask (1) + prior flow (2) = 10.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_target, m_target, x_refs, m_refs, flow_pre):
        b, f, h, w, c = x_refs.shape
        x_t = jnp.broadcast_to(x_target[:, None], (b, f, h, w, c))
        m_t = jnp.broadcast_to(m_target[:, None], (b, f, h, w, 1))
        x = jnp.concatenate(
            [x_refs, x_t, m_refs, m_t, flow_pre], axis=-1
        ).reshape(b * f, h, w, 10).astype(self.dtype)

        # Both stride-folding rewrites opt OUT here: an on-chip e2e A/B of
        # the align path (scripts/measure/dfpn_align_killswitch_ab.py,
        # config-4 geometry) measured s2d +3.7 ms and phase-transpose
        # +3.4 ms inside the estimators (74.4 -> 67.0 ms with both off) —
        # XLA tiles these 128-channel strided convs well already, and the
        # rewrites' reshapes break its conv<->conv fusion.
        conv = lambda feats, k, s, name: Conv(
            features=feats, kernel_size=(k, k), strides=(s, s),
            padding=(k // 2, k // 2), dtype=self.dtype, name=name,
            use_s2d=False,
        )
        up = lambda k, p, name: ConvTranspose2dTorch(
            features=128, kernel_size=(k, k), strides=(2, 2), padding=(p, p),
            output_padding=(1, 1), dtype=self.dtype, name=name,
            use_phase=False,
        )

        # (kernel, stride) schedule mirroring the reference Sequential.
        x = nn.relu(conv(128, 5, 1, "c0")(x))
        x = nn.relu(conv(128, 3, 1, "c1")(x))
        x = nn.relu(conv(128, 5, 2, "c2")(x))
        x = nn.relu(conv(128, 5, 1, "c3")(x))
        x = nn.relu(conv(128, 3, 1, "c4")(x))
        x = nn.relu(conv(128, 3, 2, "c5")(x))
        x = nn.relu(conv(128, 5, 1, "c6")(x))
        x = nn.relu(conv(128, 3, 1, "c7")(x))
        x = nn.relu(conv(128, 3, 2, "c8")(x))
        x = nn.relu(conv(128, 5, 1, "c9")(x))
        x = nn.relu(conv(128, 3, 1, "c10")(x))
        x = nn.relu(up(3, 1, "t0")(x))
        x = nn.relu(conv(128, 5, 1, "c11")(x))
        x = nn.relu(conv(128, 3, 1, "c12")(x))
        x = nn.relu(up(3, 1, "t1")(x))
        x = nn.relu(conv(128, 5, 1, "c13")(x))
        x = nn.relu(conv(128, 3, 1, "c14")(x))
        x = nn.relu(up(5, 2, "t2")(x))
        x = nn.relu(conv(128, 5, 1, "c15")(x))
        x = nn.relu(conv(128, 3, 1, "c16")(x))
        x = conv(2, 3, 1, "c17")(x)
        return x.reshape(b, f, h, w, 2)


class DFPN(nn.Module):
    """Dense Flow Prediction Network (reference model_dfpn.py:14-133).

    ``vgg_apply`` is a closure ``images_nhwc -> [5 pool feats]`` over frozen
    VGG params (supplied by the caller so the same VGG instance is shared
    with the CHN perceptual loss).
    """

    dtype: jnp.dtype = jnp.float32
    use_softmax: bool = False  # reference CorrelationVGG flag (model_dfpn.py:485)
    # Working resolution of the cascade (the reference fixes 256,
    # model_dfpn.py:74-81). Scaled-down values (e.g. 64) keep the same graph
    # shape for cheap multi-device tests; production keeps 256.
    base_size: int = 256

    def setup(self):
        self.corr_conv = SeparableConv4d(dtype=self.dtype, name="separable4d")
        self.corr_mixer = AlignmentCorrelationMixer(
            corr_size=self.base_size // 16, dtype=self.dtype, name="mixer"
        )
        self.flow_64 = FlowEstimator(dtype=self.dtype, name="flow_64")
        self.flow_256 = FlowEstimator(dtype=self.dtype, name="flow_256")

    def __call__(self, x_target, m_target, x_refs, m_refs, vgg_feats_target, vgg_feats_refs):
        """Forward pass (reference model_dfpn.py:46-101).

        Args:
            x_target: ``(B, H, W, 3)`` masked target frame.
            m_target: ``(B, H, W, 1)`` target mask.
            x_refs: ``(B, F, H, W, 3)`` masked reference frames.
            m_refs: ``(B, F, H, W, 1)`` reference masks.
            vgg_feats_target: pool-4 VGG features ``(B, 16, 16, 512)`` of the
                *normalized, 256-resized* target (see :meth:`prepare_vgg_input`).
            vgg_feats_refs: ``(B, F, 16, 16, 512)`` likewise for refs.

        Returns:
            ``(corr, flow_16, flow_64, flow_full)`` where flow_full is at the
            input resolution.
        """
        b, f, h, w, _ = x_refs.shape
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x_target.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x_target.dtype)
        x_target = (x_target - mean) / std
        x_refs = (x_refs - mean) / std

        s256, s64 = self.base_size, self.base_size // 4
        x_t_256, m_t_256, x_r_256, m_r_256 = transforms.resize_set_bis(
            x_target, m_target, x_refs, m_refs, (s256, s256)
        )
        x_t_64, m_t_64, x_r_64, m_r_64 = transforms.resize_set_bis(
            x_target, m_target, x_refs, m_refs, (s64, s64)
        )

        fh, fw = vgg_feats_target.shape[1:3]
        v_target = transforms.interp.resize_hw(
            1 - m_t_256, (fh, fw), mode="nearest"
        )
        v_ref = transforms.interp.resize_hw(1 - m_r_256, (fh, fw), mode="nearest")

        corr = correlation_masked_4d(
            jax.lax.stop_gradient(vgg_feats_target),
            v_target,
            jax.lax.stop_gradient(vgg_feats_refs),
            v_ref,
        )
        corr = self.corr_conv(corr)
        if self.use_softmax:
            corr = softmax_3d(corr)

        flow_16 = self.corr_mixer(corr)
        flow_64_pre = flows_ops.resize_flow(flow_16, (s64, s64), mode="bilinear")
        flow_64 = self.flow_64(x_t_64, m_t_64, x_r_64, m_r_64, flow_64_pre)
        flow_256_pre = flows_ops.resize_flow(flow_64, (s256, s256), mode="bilinear")
        flow_256 = self.flow_256(x_t_256, m_t_256, x_r_256, m_r_256, flow_256_pre)

        return corr, flow_16, flow_64, flows_ops.resize_flow(
            flow_256, (h, w), mode="bilinear"
        )


def flow_estimator_apply_pallas(
    params: dict,
    x_target: jnp.ndarray,
    m_target: jnp.ndarray,
    x_refs: jnp.ndarray,
    m_refs: jnp.ndarray,
    flow_pre: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """FlowEstimator forward on fused banded conv stacks (serving).

    Same math as :class:`FlowEstimator` (reference model_dfpn.py:677-743):
    the fixed-resolution conv segments run as fused banded Pallas stacks
    (ops/pallas_sep4d.py:conv_stack_banded — one HBM round-trip per
    segment instead of one per conv); the stride-2 downs run as
    space-to-depth dense convs and the 2x transposed convs as 4-phase
    low-res convs + pixel shuffle (models/nn_ext.py) — all exact
    regroupings.
    """
    from master_thesis_tpu.models.nn_ext import (
        phase_transpose_kernel,
        pixel_shuffle_2x,
        strided_conv_s2d,
    )
    from master_thesis_tpu.ops.pallas_sep4d import conv_stack_banded

    b, f, h, w, c = x_refs.shape
    x_t = jnp.broadcast_to(x_target[:, None], (b, f, h, w, c))
    m_t = jnp.broadcast_to(m_target[:, None], (b, f, h, w, 1))
    x = jnp.concatenate(
        [x_refs, x_t, m_refs, m_t, flow_pre], axis=-1
    ).reshape(b * f, h, w, 10).astype(dtype)

    kk = lambda n: params[n]["kernel"]
    bb = lambda n: params[n]["bias"]

    def seg(x, names, last_relu=True):
        relus = [True] * len(names)
        if not last_relu:
            relus[-1] = False
        return conv_stack_banded(
            x, [kk(n) for n in names], [bb(n) for n in names], relus,
            interpret=interpret,
        )

    def down(x, name, k):
        y = strided_conv_s2d(x, kk(name), 2, k // 2, k // 2, dtype)
        return nn.relu(y + bb(name).astype(dtype))

    def up(x, name, pad):
        w4, (p_l, p_r) = phase_transpose_kernel(kk(name), 2, pad)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w4.astype(dtype), (1, 1),
            padding=((p_l, p_r), (p_l, p_r)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return nn.relu(pixel_shuffle_2x(y) + bb(name).astype(dtype))

    x = seg(x, ["c0", "c1"])
    x = down(x, "c2", 5)
    x = seg(x, ["c3", "c4"])
    x = down(x, "c5", 3)
    x = seg(x, ["c6", "c7"])
    x = down(x, "c8", 3)
    x = seg(x, ["c9", "c10"])
    x = up(x, "t0", 1)
    x = seg(x, ["c11", "c12"])
    x = up(x, "t1", 1)
    x = seg(x, ["c13", "c14"])
    x = up(x, "t2", 2)
    x = seg(x, ["c15", "c16", "c17"], last_relu=False)
    return x.reshape(b, f, h, w, 2)


def _conv_im2col(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray):
    """k×k same-padding conv as ONE dense matmul with K = k²·Cin, in plain
    XLA (pad + k² shifted slices + reshape-free dot). For thin-input convs
    (the flow estimator's Cin=10 c0, where a direct conv lowers to a
    contraction depth of 10/128 MXU lanes ≈ 13 TFLOP/s in-graph —
    scripts/measure/align_inner_decomp.py) this keeps the contraction
    near-full-depth while STAYING inside XLA's fusion scope, unlike a
    Pallas kernel which pins an HBM round-trip at each boundary."""
    kh, kw, cin, cout = kernel.shape
    n, h, w, _ = x.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    cols = jnp.concatenate(
        [
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (n, h, w, cin))
            for dy in range(kh)
            for dx in range(kw)
        ],
        axis=-1,
    )
    # kernel[dy, dx, ci, :] reshapes to row (dy·kw + dx)·cin + ci — the
    # concat order above.
    return cols @ kernel.reshape(kh * kw * cin, cout) + bias


def flow_estimator_apply_hybrid(
    params: dict,
    x_target: jnp.ndarray,
    m_target: jnp.ndarray,
    x_refs: jnp.ndarray,
    m_refs: jnp.ndarray,
    flow_pre: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    fuse_mids: bool = True,
    c0_mode: str = "pallas",
) -> jnp.ndarray:
    """FlowEstimator forward with selective segment fusion — a measured
    r4 CANDIDATE kept behind flags, NOT the production path.

    The r4 per-block profile (scripts/measure/flow_profile.py, N=20 @256²
    bf16) showed c0 (Cin=10 pads to 128 MXU lanes → ~14 TFLOP/s) and the
    64²/32² mid segments starving STANDALONE while the 128²/256² blocks
    ran 114-187 TFLOP/s, and this function's selective fusion duly won
    its standalone A/B 1.7× (29.0 vs 50.4 ms,
    scripts/measure/flow_hybrid_ab.py). In-graph it is a wash-to-loss
    (full align 68.0 vs 66.9 ms; every ``c0_mode`` lost or tied —
    scripts/measure/dfpn_serving_ab.py): inside the align program XLA
    already runs those segments near this speed, and the standalone
    baseline was layout-pessimized at the jit boundary. Production keeps
    the plain flax module; this stays in-tree, parity-tested
    (tests/test_pallas_sep4d.py), for future compiler/silicon re-flips.

    Segment modes (exact regroupings — same products, f32 accumulation):

    - ``c0_mode``: "pallas" folds the 5×5 tap set into the contraction
      (K = 25·10 = 250 — ops/pallas_sep4d.py:_tap_group); "s2d" runs the
      phase-packed dense conv (nn_ext.conv_phase_s2d); "im2col"
      materializes the K=250 column matrix in XLA; "xla" keeps the
      direct conv.
    - ``fuse_mids``: c6-c7, c9-c10, c11-c12 as fused VMEM banded stacks
      (one HBM round-trip per segment) when hw >= 1024.
    - The strided downs, transposed ups, and 128²/256² segments always
      keep the plain XLA lowering (reference model_dfpn.py:677-743).
    """
    from master_thesis_tpu.models.nn_ext import Conv, ConvTranspose2dTorch
    from master_thesis_tpu.ops.pallas_sep4d import conv_stack_banded

    b, f, h, w, c = x_refs.shape
    x_t = jnp.broadcast_to(x_target[:, None], (b, f, h, w, c))
    m_t = jnp.broadcast_to(m_target[:, None], (b, f, h, w, 1))
    x = jnp.concatenate(
        [x_refs, x_t, m_refs, m_t, flow_pre], axis=-1
    ).reshape(b * f, h, w, 10).astype(dtype)

    kk = lambda n: params[n]["kernel"]
    bb = lambda n: params[n]["bias"]

    def xla_conv(x, name, k, s=1, relu=True, feats=128):
        y = Conv(
            features=feats, kernel_size=(k, k), strides=(s, s),
            padding=(k // 2, k // 2), dtype=dtype, use_s2d=False,
        ).apply({"params": params[name]}, x)
        return nn.relu(y) if relu else y

    def xla_up(x, name, k, p):
        y = ConvTranspose2dTorch(
            features=128, kernel_size=(k, k), strides=(2, 2),
            padding=(p, p), output_padding=(1, 1), dtype=dtype,
            use_phase=False,
        ).apply({"params": params[name]}, x)
        return nn.relu(y)

    def seg(x, names, ksizes):
        if not fuse_mids or x.shape[1] * x.shape[2] < 1024:
            for n, k in zip(names, ksizes):
                x = xla_conv(x, n, k)
            return x
        return conv_stack_banded(
            x, [kk(n) for n in names], [bb(n) for n in names],
            [True] * len(names), interpret=interpret,
        )

    if c0_mode == "im2col":
        x = nn.relu(_conv_im2col(x, kk("c0").astype(dtype), bb("c0")))
    elif c0_mode == "s2d" and h % 2 == 0 and w % 2 == 0:
        from master_thesis_tpu.models.nn_ext import conv_phase_s2d

        x = nn.relu(
            conv_phase_s2d(x, kk("c0"), 2, 2, 2, dtype) + bb("c0")
        )
    elif c0_mode == "pallas" and h * w >= 1024:
        x = conv_stack_banded(
            x, [kk("c0")], [bb("c0")], [True], interpret=interpret
        )
    else:
        x = xla_conv(x, "c0", 5)
    x = xla_conv(x, "c1", 3)
    x = xla_conv(x, "c2", 5, s=2)
    x = xla_conv(x, "c3", 5)
    x = xla_conv(x, "c4", 3)
    x = xla_conv(x, "c5", 3, s=2)
    x = seg(x, ["c6", "c7"], [5, 3])
    x = xla_conv(x, "c8", 3, s=2)
    x = seg(x, ["c9", "c10"], [5, 3])
    x = xla_up(x, "t0", 3, 1)
    x = seg(x, ["c11", "c12"], [5, 3])
    x = xla_up(x, "t1", 3, 1)
    x = xla_conv(x, "c13", 5)
    x = xla_conv(x, "c14", 3)
    x = xla_up(x, "t2", 5, 2)
    x = xla_conv(x, "c15", 5)
    x = xla_conv(x, "c16", 3)
    x = xla_conv(x, "c17", 3, relu=False, feats=2)
    return x.reshape(b, f, h, w, 2)


def dfpn_infer_apply(
    variables,
    x_target: jnp.ndarray,
    m_target: jnp.ndarray,
    x_refs: jnp.ndarray,
    m_refs: jnp.ndarray,
    vgg_feats_target: jnp.ndarray,
    vgg_feats_refs: jnp.ndarray,
    *,
    dtype=jnp.bfloat16,
    base_size: int = 256,
    use_softmax: bool = False,
    interpret: bool = False,
    pallas_sep4d: bool = False,
    pallas_mixer: bool = True,
    pallas_flow: bool = False,
    hybrid_flow: bool = False,
    hybrid_fuse_mids: bool = True,
    hybrid_c0_mode: str = "pallas",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-function DFPN forward for serving: ``DFPN.__call__`` with each
    stage on its measured-fastest path. On-chip (v5e, config-4 shapes) the
    fused Pallas kernels win only for the correlation mixer (1.4 vs
    2.3 ms); the separable 4-D conv (35.5 vs 28.8 ms) and the flow
    estimators run faster as XLA convs. The r4 hybrid estimator
    (``flow_estimator_apply_hybrid``) won its STANDALONE A/B decisively
    (29.0 vs 50.4 ms at N=20 @256², scripts/measure/flow_hybrid_ab.py)
    but is a wash IN-GRAPH (align 67.99 vs 66.94 ms,
    scripts/measure/dfpn_serving_ab.py): inside the full align program
    XLA's fusion already runs the starved segments near the hybrid's
    speed — the standalone baseline was layout-pessimized at the jit
    boundary. Production therefore keeps the plain module; the hybrid
    and the r3 all-Pallas estimator stay behind ``hybrid_flow=`` /
    ``pallas_flow`` (``pallas_flow`` takes precedence when both are
    set) — see BENCH_NOTES.md.

    Identical math and identical param tree to the flax module; parity is
    tested against ``DFPN.apply`` (tests/test_pallas_sep4d.py).
    Reference: model_dfpn.py:46-101.
    """
    from master_thesis_tpu.ops.pallas_sep4d import (
        mixer_apply_pallas,
        sep4d_apply_pallas,
    )

    p = variables["params"]
    b, f, h, w, _ = x_refs.shape
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x_target.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x_target.dtype)
    x_target = (x_target - mean) / std
    x_refs = (x_refs - mean) / std

    s256, s64 = base_size, base_size // 4
    x_t_256, m_t_256, x_r_256, m_r_256 = transforms.resize_set_bis(
        x_target, m_target, x_refs, m_refs, (s256, s256)
    )
    x_t_64, m_t_64, x_r_64, m_r_64 = transforms.resize_set_bis(
        x_target, m_target, x_refs, m_refs, (s64, s64)
    )

    fh, fw = vgg_feats_target.shape[1:3]
    v_target = transforms.interp.resize_hw(1 - m_t_256, (fh, fw), mode="nearest")
    v_ref = transforms.interp.resize_hw(1 - m_r_256, (fh, fw), mode="nearest")

    corr = correlation_masked_4d(
        jax.lax.stop_gradient(vgg_feats_target),
        v_target,
        jax.lax.stop_gradient(vgg_feats_refs),
        v_ref,
    )
    if pallas_sep4d:
        corr = sep4d_apply_pallas(
            p["separable4d"], corr, dtype=dtype, interpret=interpret
        )
    else:
        corr = SeparableConv4d(dtype=dtype).apply(
            {"params": p["separable4d"]}, corr
        )
    if use_softmax:
        corr = softmax_3d(corr)

    if pallas_mixer:
        flow_16 = mixer_apply_pallas(
            p["mixer"], corr, corr_size=base_size // 16, dtype=dtype,
            interpret=interpret,
        )
    else:
        flow_16 = AlignmentCorrelationMixer(
            corr_size=base_size // 16, dtype=dtype
        ).apply({"params": p["mixer"]}, corr)
    flow_64_pre = flows_ops.resize_flow(flow_16, (s64, s64), mode="bilinear")

    def flow_est(name, *args):
        if pallas_flow:
            return flow_estimator_apply_pallas(
                p[name], *args, dtype=dtype, interpret=interpret
            )
        if hybrid_flow:
            return flow_estimator_apply_hybrid(
                p[name], *args, dtype=dtype, interpret=interpret,
                fuse_mids=hybrid_fuse_mids, c0_mode=hybrid_c0_mode,
            )
        return FlowEstimator(dtype=dtype).apply({"params": p[name]}, *args)

    flow_64 = flow_est("flow_64", x_t_64, m_t_64, x_r_64, m_r_64, flow_64_pre)
    flow_256_pre = flows_ops.resize_flow(flow_64, (s256, s256), mode="bilinear")
    flow_256 = flow_est(
        "flow_256", x_t_256, m_t_256, x_r_256, m_r_256, flow_256_pre
    )

    return corr, flow_16, flow_64, flows_ops.resize_flow(
        flow_256, (h, w), mode="bilinear"
    )


def prepare_vgg_input(x: jnp.ndarray, size: int = 256) -> jnp.ndarray:
    """ImageNet-normalize + resize to ``size``² for VGG feature extraction.

    Mirrors DFPN's internal preprocessing (model_dfpn.py:71-77): frames are
    normalized first, then bilinearly resized. ``size`` must match the
    model's ``base_size`` (256 in production).
    """
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    x = (x - mean) / std
    if x.shape[-3] != size or x.shape[-2] != size:
        x = transforms.interp.resize_hw(x, (size, size), mode="bilinear")
    return x


def dfpn_align(
    dfpn_apply: Callable,
    params,
    x_target: jnp.ndarray,
    m_target: jnp.ndarray,
    x_refs: jnp.ndarray,
    m_refs: jnp.ndarray,
    vgg_feats_target: jnp.ndarray,
    vgg_feats_refs: jnp.ndarray,
    warp_precision=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Aligner interface matching CPN.align (reference model_dfpn.py:103-133).

    ``warp_precision``: matmul precision of the frame warp — pass
    ``jax.lax.Precision.DEFAULT`` on the bf16 serving path (the warped
    frames only feed the bf16 CHN input; see CPN.align for the rationale).
    """
    _, _, _, flow_full = jax.lax.stop_gradient(
        dfpn_apply(
            params, x_target, m_target, x_refs, m_refs,
            vgg_feats_target, vgg_feats_refs,
        )
    )
    x_ref_aligned, v_ref_aligned = flows_ops.align_set(
        x_refs, 1.0 - m_refs, flow_full, precision=warp_precision
    )
    v_map = jnp.clip(v_ref_aligned - (1.0 - m_target[:, None]), 0.0, 1.0)
    return x_ref_aligned, v_ref_aligned, v_map

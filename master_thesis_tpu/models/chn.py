"""Copy-and-Hallucinate Network (CHN) in flax.

TPU re-design of the reference CHN (model_chn.py:18-85) and its RRDBNet
generator (model_chn.py:506-623). Layout is NHWC with the frame axis folded
into the batch — ``(B, F, H, W, C) -> (B*F, H, W, C)`` — so every conv runs
as one large MXU-friendly batch (the reference does the same fold for its
CUDA convs, model_chn.py:80).

The trunk runs at H/4 resolution: 5-conv head with two stride-2 downsamples
(note: *no* activations in the head, matching the reference's
``nn.Sequential`` of bare convs, model_chn.py:522-528), ``nb`` RRDB blocks,
trunk-conv residual, then two nearest-2x upsamples.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from master_thesis_tpu.models.nn_ext import leaky_relu
from master_thesis_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C), exact torch nearest upsample."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


class ResidualDenseBlock5C(nn.Module):
    """5 densely-connected 3x3 convs with 0.2-scaled residual
    (reference model_chn.py:588-623).

    TPU formulation: the reference computes ``conv_k(concat(x, x1..x_{k-1}))``
    — five narrow convs whose ``gc=32`` output widths leave 3/4 of the MXU's
    128 output lanes idle. Convolution is linear in its input channels, so
    each conv splits into per-source contributions, and all contributions
    *from* the same tensor batch into ONE wide conv the moment that tensor
    exists (output widths 192/160/128/96/64 instead of 32). Same parameters,
    same math (summation regrouped), ~3x better MXU lane utilization.
    """

    nf: int = 64
    gc: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nf, gc = self.nf, self.gc
        widths = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
        outs = [gc, gc, gc, gc, nf]
        from master_thesis_tpu.models.nn_ext import _uniform

        kernels, biases = [], []
        for k in range(5):
            fan_in = widths[k] * 9
            bound = (3.0 / fan_in) ** 0.5
            kernels.append(
                self.param(f"conv{k + 1}_kernel", _uniform(bound), (3, 3, widths[k], outs[k]), jnp.float32)
            )
            biases.append(
                self.param(f"conv{k + 1}_bias", _uniform(bound), (outs[k],), jnp.float32)
            )

        def conv(inp, kernel):
            return jax.lax.conv_general_dilated(
                inp.astype(self.dtype),
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            )

        def src_slice(k, lo, hi):
            """Channels [lo, hi) of conv_k's kernel input axis."""
            return kernels[k][:, :, lo:hi, :]

        # Contributions FROM x to conv1..conv5 (input channels [0, nf)).
        w_x = jnp.concatenate([src_slice(k, 0, nf) for k in range(5)], axis=-1)
        p = conv(x, w_x)
        p1, p2, p3, p4, p5 = jnp.split(p, np.cumsum(outs)[:-1].tolist(), axis=-1)

        x1 = leaky_relu(p1 + biases[0].astype(self.dtype))

        # FROM x1 to conv2..conv5 (channels [nf, nf+gc) of those kernels).
        w_x1 = jnp.concatenate(
            [src_slice(k, nf, nf + gc) for k in range(1, 5)], axis=-1
        )
        q = conv(x1, w_x1)
        q2, q3, q4, q5 = jnp.split(q, np.cumsum(outs[1:])[:-1].tolist(), axis=-1)

        x2 = leaky_relu(p2 + q2 + biases[1].astype(self.dtype))

        w_x2 = jnp.concatenate(
            [src_slice(k, nf + gc, nf + 2 * gc) for k in range(2, 5)], axis=-1
        )
        r = conv(x2, w_x2)
        r3, r4, r5 = jnp.split(r, np.cumsum(outs[2:])[:-1].tolist(), axis=-1)

        x3 = leaky_relu(p3 + q3 + r3 + biases[2].astype(self.dtype))

        w_x3 = jnp.concatenate(
            [src_slice(k, nf + 2 * gc, nf + 3 * gc) for k in range(3, 5)], axis=-1
        )
        s = conv(x3, w_x3)
        s4, s5 = jnp.split(s, np.cumsum(outs[3:])[:-1].tolist(), axis=-1)

        x4 = leaky_relu(p4 + q4 + r4 + s4 + biases[3].astype(self.dtype))

        t5 = conv(x4, src_slice(4, nf + 3 * gc, nf + 4 * gc))
        x5 = p5 + q5 + r5 + s5 + t5 + biases[4].astype(self.dtype)
        return 0.2 * x5 + x


class RRDB(nn.Module):
    """Residual-in-residual dense block (reference model_chn.py:558-585)."""

    nf: int = 64
    gc: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="rdb1")(x)
        y = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="rdb2")(y)
        y = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="rdb3")(y)
        return 0.2 * y + x


def _conv_nhwc(x, kernel, bias=None, stride=1, pad=1, dtype=jnp.float32):
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(stride, stride), padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        out = out + bias.astype(dtype)
    return out


_HEAD_STRIDES = (1, 1, 2, 1, 2)


def _conv15s4_s2d(x, w_eff, dtype):
    """The composed 15x15 stride-4 head conv as space-to-depth + a dense
    4x4 stride-1 conv — exact rearrangement.

    A 225-tap stride-4 conv is a shape XLA tiles poorly on TPU (measured
    ~5% MXU); folding the stride into the layout gives a 4x4 conv over
    16x channels at 1/4 resolution — identical FLOPs, MXU-dense. With
    pad=7, tap ``ky`` maps to base offset ``floor((ky-7)/4)`` in
    {-2..1} and phase ``(ky-7) mod 4`` — a 4x4 kernel with asymmetric
    (2, 1) padding.
    """
    b, hh, ww, c = x.shape
    kh, kw, _, o = w_eff.shape  # (15, 15, c, o)
    x4 = x.reshape(b, hh // 4, 4, ww // 4, 4, c).transpose(0, 1, 3, 2, 4, 5)
    x4 = x4.reshape(b, hh // 4, ww // 4, 16 * c)
    w4 = jnp.zeros((4, 4, 4, 4, c, o), w_eff.dtype)
    for ky in range(kh):
        d_y, p_y = divmod(ky - 7, 4)
        for kx in range(kw):
            d_x, p_x = divmod(kx - 7, 4)
            w4 = w4.at[d_y + 2, d_x + 2, p_y, p_x].set(w_eff[ky, kx])
    w4 = w4.reshape(4, 4, 16 * c, o)
    return jax.lax.conv_general_dilated(
        x4.astype(dtype), w4.astype(dtype),
        window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def _head_scaffold(params, shape_hw, dtype):
    """Shared machinery of the composed head: the 5-layer nested runner,
    the composed 15x15 stride-4 kernel, and the border-band applier.

    The head has no activations, so it is one linear map: the bias-free
    kernels compose into a single conv (nn_ext.compose_conv_kernels) and
    the biases' exact contribution — including their zero-padding border
    structure — is the head's zero-input response. The nested head's
    per-layer zero padding truncates intermediate borders, so composed !=
    nested within a 2-row/col output band; that band is recomputed exactly
    from 16-row/col input strips (strip row r aligns with full-image
    output row r; 16 input rows give 4 output rows of which the first 2
    are divergence-free).

    Returns ``(run_nested, finish, degenerate)``: ``run_nested(inp)``
    applies the 5 convs layer-by-layer; when ``degenerate`` (output too
    small / odd sizes) the caller must return ``run_nested`` of its full
    input; otherwise ``finish(apply_composed, strip)`` takes a function
    applying the composed kernel (sliced however the caller likes) and an
    input-strip builder, and assembles interior + zero response + exact
    border bands.
    """
    from master_thesis_tpu.models.nn_ext import compose_conv_kernels

    head = [
        (params[f"conv_first_{i}_kernel"], params[f"conv_first_{i}_bias"])
        for i in range(5)
    ]

    def run_nested(inp):
        h = inp
        for (wk, bk), s in zip(head, _HEAD_STRIDES):
            h = _conv_nhwc(h, wk, bk, stride=s, dtype=dtype)
        return h

    hh, ww = shape_hw
    h_out, w_out = (hh + 14 - 15) // 4 + 1, (ww + 14 - 15) // 4 + 1
    degenerate = h_out <= 4 or w_out <= 4 or hh % 4 or ww % 4
    in_ch = head[0][0].shape[2]

    def finish(apply_composed, strip):
        w_eff = head[0][0]
        for (wk, _), s_prev in zip(head[1:], np.cumprod(_HEAD_STRIDES)[:-1]):
            w_eff = compose_conv_kernels(w_eff, int(s_prev), wk)
        y = apply_composed(w_eff)
        y = y + run_nested(jnp.zeros((1, hh, ww, in_ch), y.dtype))
        top = run_nested(strip(slice(0, 16), slice(None)))[:, :2]
        bot = run_nested(strip(slice(-16, None), slice(None)))[:, -2:]
        y = y.at[:, :2].set(top).at[:, -2:].set(bot)
        lef = run_nested(strip(slice(None), slice(0, 16)))[:, :, :2]
        rig = run_nested(strip(slice(None), slice(-16, None)))[:, :, -2:]
        return y.at[:, :, :2].set(lef).at[:, :, -2:].set(rig)

    return run_nested, finish, degenerate


def rrdbnet_head_forward(params, x, dtype):
    """The RRDBNet head (5 bare convs, reference model_chn.py:522-528) as
    one composed 15x15 stride-4 conv + exact border strips (see
    :func:`_head_scaffold`)."""
    run_nested, finish, degenerate = _head_scaffold(params, x.shape[1:3], dtype)
    if degenerate:
        return run_nested(x)
    return finish(
        lambda w_eff: _conv15s4_s2d(x, w_eff, dtype),
        lambda sl_h, sl_w: x[:, sl_h, sl_w],
    )


def chn_head_grouped(params, x_t_n, v_t, x_r_n, v_r, v_m, dtype):
    """The composed RRDBNet head evaluated by source group.

    The head is linear (no activations), so ``head(concat(groups)) =
    sum_g head_g(group_g)`` with ``head_g`` = the composed 15x15 kernel
    sliced to that group's input channels. The per-target channels
    (``x_target``, ``v_target``) are identical across the F references
    (CHN repeats the target per ref, reference model_chn.py:76-79), so
    their head contribution is computed once per *target* and broadcast —
    at F=5 that cuts composed-head FLOPs ~36% and never materializes the
    ``(B*F, H, W, 9)`` concat. Border bands are recomputed exactly from
    narrow 9-channel strips (shared machinery: :func:`_head_scaffold`).

    Args:
        x_t_n: ``(B, H, W, 3)`` ImageNet-normalized target.
        v_t: ``(B, H, W, 1)`` target visibility.
        x_r_n: ``(B, F, H, W, 3)`` normalized aligned refs.
        v_r, v_m: ``(B, F, H, W, 1)`` aligned visibility / visibility map.

    Returns:
        ``(B*F, H/4, W/4, nf)`` — identical to running the head on the
        9-channel concat.
    """
    b, f, hh, ww, _ = x_r_n.shape
    run_nested, finish, degenerate = _head_scaffold(params, (hh, ww), dtype)

    def strip9(sl_h, sl_w):
        """9-channel concat of an input strip, channel order
        [x_t, x_ref, v_t, v_ref, v_map] (reference model_chn.py:76-79)."""
        xt = jnp.broadcast_to(x_t_n[:, None, sl_h, sl_w], x_r_n[:, :, sl_h, sl_w].shape)
        vt = jnp.broadcast_to(v_t[:, None, sl_h, sl_w], v_r[:, :, sl_h, sl_w].shape)
        cat = jnp.concatenate(
            [xt, x_r_n[:, :, sl_h, sl_w], vt, v_r[:, :, sl_h, sl_w],
             v_m[:, :, sl_h, sl_w]], axis=-1,
        )
        return cat.reshape((b * f,) + cat.shape[2:])

    if degenerate:
        return run_nested(strip9(slice(None), slice(None)))

    def apply_composed(w_eff):
        w_tgt = w_eff[:, :, (0, 1, 2, 6), :]  # x_t (3) + v_t
        w_ref = w_eff[:, :, (3, 4, 5, 7, 8), :]  # x_ref (3) + v_ref + v_map
        y_t = _conv15s4_s2d(
            jnp.concatenate([x_t_n, v_t], axis=-1), w_tgt, dtype
        )  # (B, H/4, W/4, nf) — once per target
        ref_in = jnp.concatenate([x_r_n, v_r, v_m], axis=-1)
        y_r = _conv15s4_s2d(ref_in.reshape(b * f, hh, ww, 5), w_ref, dtype)
        return y_r + jnp.broadcast_to(
            y_t[:, None], (b, f) + y_t.shape[1:]
        ).reshape(y_r.shape)

    return finish(apply_composed, strip9)


def rrdbnet_tail_forward(params, y, dtype):
    """upconv1/2 (fused phase convs + pixel shuffle), hr_conv, conv_last."""
    from master_thesis_tpu.models.nn_ext import (
        fused_upsample_conv_kernel,
        pixel_shuffle_2x,
    )

    def up_conv(name, inp):
        w4 = fused_upsample_conv_kernel(params[f"{name}_kernel"])
        out = _conv_nhwc(inp, w4, dtype=dtype)
        return pixel_shuffle_2x(out) + params[f"{name}_bias"].astype(dtype)

    y = leaky_relu(up_conv("upconv1", y))
    y = leaky_relu(up_conv("upconv2", y))
    y = leaky_relu(_conv_nhwc(y, params["hr_conv_kernel"], params["hr_conv_bias"], dtype=dtype))
    return _conv_nhwc(y, params["conv_last_kernel"], params["conv_last_bias"], dtype=dtype)


def rrdbnet_infer_apply(
    params, x, nb: int, nf: int = 64, gc: int = 32,
    dtype=jnp.bfloat16, pallas_trunk: bool = True, interpret: bool = False,
    head_y=None, pallas_tail: bool = True, pallas_bwd: bool = True,
):
    """Pure-function RRDBNet forward for inference/serving AND training.

    Identical math to ``RRDBNet.__call__`` but with the trunk running as the
    fused Pallas kernel (ops/pallas_rrdb.py) — the XLA trunk measures ~28%
    MXU (HBM-bound conv round-trips) vs ~67% fused — and the tail as the
    phase-space kernel (ops/pallas_tail.py). Differentiable end to end:
    the trunk is a ``jax.custom_vjp`` (``make_hybrid_trunk``) backed by
    the fused backward kernel (XLA-remat fallback past VMEM); the tail's
    ``custom_vjp`` rematerializes through the XLA twin. At large spatial
    sizes (512²+) where the kernels' working sets exceed the VMEM window
    both fall back to the XLA formulations. ``head_y``: precomputed head
    output (``chn_head_grouped``) — skips the in-function head (``x`` is
    then ignored).
    """
    from master_thesis_tpu.ops.pallas_rrdb import make_hybrid_trunk
    from master_thesis_tpu.ops.pallas_tail import make_hybrid_tail

    y = head_y if head_y is not None else rrdbnet_head_forward(params, x, dtype)
    trunk_params = {k: v for k, v in params.items() if k.startswith("rrdb_")}
    trunk = make_hybrid_trunk(
        nb, nf, gc, dtype, use_pallas=pallas_trunk, interpret=interpret,
        pallas_bwd=pallas_bwd,
    )(y, trunk_params)
    y = y + _conv_nhwc(trunk, params["trunk_conv_kernel"], params["trunk_conv_bias"], dtype=dtype)
    tail_params = {
        k: params[k]
        for k in (
            "upconv1_kernel", "upconv1_bias", "upconv2_kernel",
            "upconv2_bias", "hr_conv_kernel", "hr_conv_bias",
            "conv_last_kernel", "conv_last_bias",
        )
    }
    return make_hybrid_tail(
        dtype, use_pallas=pallas_trunk and pallas_tail, interpret=interpret,
        pallas_bwd=pallas_bwd,
    )(y, tail_params)


class RRDBNet(nn.Module):
    """RRDB generator (reference model_chn.py:506-555).

    Two exact TPU regroupings on top of the reference architecture:

    - **Head composition.** The 5-conv head has no activations, so it is one
      linear map: the bias-free kernels compose into a single 15x15 stride-4
      conv (models/nn_ext.py:compose_conv_kernels), and the biases' exact
      contribution — including their zero-padding border structure — is the
      head's response to a zero input, computed once per step on a single
      zero frame (1/batch of the cost). ~8x fewer head FLOPs and one kernel
      launch instead of five.
    - **Fused upsample-convs.** ``conv3x3(nearest_up_2x(y))`` is rewritten
      as a low-resolution 4-phase conv + pixel shuffle
      (models/nn_ext.py:fused_upsample_conv_kernel): full MXU output lanes
      (4*nf channels) and no 4x-upsampled intermediate in HBM.
    """

    out_nc: int = 3
    nb: int = 20
    nf: int = 64
    gc: int = 32
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize RRDB blocks (memory <-> FLOPs)

    @nn.compact
    def __call__(self, x):
        from master_thesis_tpu.models.nn_ext import _uniform

        nf = self.nf

        def raw_conv_params(name, in_c, out_c):
            bound = (3.0 / (in_c * 9)) ** 0.5
            k = self.param(f"{name}_kernel", _uniform(bound), (3, 3, in_c, out_c), jnp.float32)
            b = self.param(f"{name}_bias", _uniform(bound), (out_c,), jnp.float32)
            return k, b

        # Declare every non-trunk parameter flat so the pure-function paths
        # (rrdbnet_head_forward / rrdbnet_tail_forward / rrdbnet_infer_apply)
        # consume the same tree.
        own = {}
        in_c = x.shape[-1]
        for i in range(5):
            k, b = raw_conv_params(f"conv_first_{i}", in_c if i == 0 else nf, nf)
            own[f"conv_first_{i}_kernel"] = k
            own[f"conv_first_{i}_bias"] = b
        for name, (ci, co) in (
            ("trunk_conv", (nf, nf)), ("upconv1", (nf, nf)), ("upconv2", (nf, nf)),
            ("hr_conv", (nf, nf)), ("conv_last", (nf, self.out_nc)),
        ):
            k, b = raw_conv_params(name, ci, co)
            own[f"{name}_kernel"] = k
            own[f"{name}_bias"] = b

        y = rrdbnet_head_forward(own, x, self.dtype)

        trunk = y
        block_cls = nn.remat(RRDB) if self.remat else RRDB
        for i in range(self.nb):
            trunk = block_cls(self.nf, self.gc, self.dtype, name=f"rrdb_{i}")(trunk)
        y = y + _conv_nhwc(
            trunk, own["trunk_conv_kernel"], own["trunk_conv_bias"], dtype=self.dtype
        )
        return rrdbnet_tail_forward(own, y, self.dtype)


def chn_infer_apply(
    variables, x_target, v_target, x_refs_aligned, v_refs_aligned, v_maps,
    nb: int = 20, nf: int = 64, gc: int = 32, dtype=jnp.bfloat16,
    interpret: bool = False, pallas_trunk: bool = True,
    pallas_tail: bool = True, pallas_bwd: bool = True,
):
    """Pure-function CHN forward: identical math to ``CHN.__call__`` with
    the RRDB trunk running as the fused Pallas kernel.

    Used by bench.py, the full-video algorithms, AND the TPU training step
    (train/build.py:chn_train_fn): the trunk's ``custom_vjp`` pairs the
    fused Pallas forward with the fused Pallas backward (XLA-remat
    fallback past VMEM), and every other stage (grouped head, tail,
    composite clip) is plain differentiable XLA.
    """
    params = variables["params"]["nn"]
    b, f, h, w, c = x_refs_aligned.shape
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x_target.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x_target.dtype)
    head_y = chn_head_grouped(
        params, (x_target - mean) / std, v_target,
        (x_refs_aligned - mean) / std, v_refs_aligned, v_maps, dtype,
    )
    nn_output = rrdbnet_infer_apply(
        params, None, nb=nb, nf=nf, gc=gc, dtype=dtype, interpret=interpret,
        head_y=head_y, pallas_trunk=pallas_trunk, pallas_tail=pallas_tail,
        pallas_bwd=pallas_bwd,
    ).reshape(b, f, h, w, 3)
    x_t = jnp.broadcast_to(x_target[:, None], (b, f, h, w, c))
    v_t = jnp.broadcast_to(v_target[:, None], (b, f, h, w, 1))
    out_dtype = jnp.result_type(x_target.dtype, jnp.float32)
    y_hat = jnp.clip(nn_output.astype(out_dtype) * std + mean, 0.0, 1.0)
    y_hat_comp = v_t * x_t + (1 - v_t) * y_hat
    return y_hat, y_hat_comp


class CHN(nn.Module):
    """Copy-and-Hallucinate forward (reference model_chn.py:44-85).

    Inputs (channel-last):
        x_target: ``(B, H, W, 3)`` frame to inpaint, range [0, 1].
        v_target: ``(B, H, W, 1)`` visibility of the target.
        x_refs_aligned: ``(B, F, H, W, 3)`` aligned reference frames.
        v_refs_aligned: ``(B, F, H, W, 1)`` aligned ref visibilities.
        v_maps: ``(B, F, H, W, 1)`` target-hole areas visible in each ref.

    Returns ``(y_hat, y_hat_comp)``, both ``(B, F, H, W, 3)``.
    """

    nb: int = 20
    nf: int = 64
    gc: int = 32
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x_target, v_target, x_refs_aligned, v_refs_aligned, v_maps):
        b, f, h, w, c = x_refs_aligned.shape
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x_target.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x_target.dtype)

        x_t = jnp.broadcast_to(x_target[:, None], (b, f, h, w, c))
        v_t = jnp.broadcast_to(v_target[:, None], (b, f, h, w, 1))

        nn_input = jnp.concatenate(
            [
                (x_t - mean) / std,
                (x_refs_aligned - mean) / std,
                v_t,
                v_refs_aligned,
                v_maps,
            ],
            axis=-1,
        ).reshape(b * f, h, w, 9)

        nn_output = RRDBNet(
            out_nc=3, nb=self.nb, nf=self.nf, gc=self.gc, dtype=self.dtype,
            remat=self.remat, name="nn",
        )(nn_input).reshape(b, f, h, w, 3)

        out_dtype = jnp.result_type(x_target.dtype, jnp.float32)
        y_hat = jnp.clip(nn_output.astype(out_dtype) * std + mean, 0.0, 1.0)
        y_hat_comp = v_t * x_t + (1 - v_t) * y_hat
        return y_hat, y_hat_comp

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

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from master_thesis_tpu.models.nn_ext import Conv, leaky_relu
from master_thesis_tpu.models.vgg import IMAGENET_MEAN, IMAGENET_STD


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, 2H, 2W, C), exact torch nearest upsample."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)


class ResidualDenseBlock5C(nn.Module):
    """5 densely-connected 3x3 convs with 0.2-scaled residual
    (reference model_chn.py:588-623)."""

    nf: int = 64
    gc: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name: Conv(
            features=f, kernel_size=(3, 3), padding=(1, 1), dtype=self.dtype, name=name
        )
        x1 = leaky_relu(conv(self.gc, "conv1")(x))
        x2 = leaky_relu(conv(self.gc, "conv2")(jnp.concatenate([x, x1], -1)))
        x3 = leaky_relu(conv(self.gc, "conv3")(jnp.concatenate([x, x1, x2], -1)))
        x4 = leaky_relu(conv(self.gc, "conv4")(jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.nf, "conv5")(jnp.concatenate([x, x1, x2, x3, x4], -1))
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


class RRDBNet(nn.Module):
    """RRDB generator (reference model_chn.py:506-555)."""

    out_nc: int = 3
    nb: int = 20
    nf: int = 64
    gc: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = lambda f, name, s=(1, 1): Conv(
            features=f, kernel_size=(3, 3), strides=s, padding=(1, 1),
            dtype=self.dtype, name=name,
        )
        y = conv(self.nf, "conv_first_0")(x)
        y = conv(self.nf, "conv_first_1")(y)
        y = conv(self.nf, "conv_first_2", s=(2, 2))(y)
        y = conv(self.nf, "conv_first_3")(y)
        y = conv(self.nf, "conv_first_4", s=(2, 2))(y)

        trunk = y
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, self.dtype, name=f"rrdb_{i}")(trunk)
        y = y + conv(self.nf, "trunk_conv")(trunk)

        y = leaky_relu(conv(self.nf, "upconv1")(upsample_nearest_2x(y)))
        y = leaky_relu(conv(self.nf, "upconv2")(upsample_nearest_2x(y)))
        return conv(self.out_nc, "conv_last")(leaky_relu(conv(self.nf, "hr_conv")(y)))


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
            out_nc=3, nb=self.nb, nf=self.nf, gc=self.gc, dtype=self.dtype, name="nn"
        )(nn_input).reshape(b, f, h, w, 3)

        y_hat = jnp.clip(nn_output.astype(jnp.float32) * std + mean, 0.0, 1.0)
        y_hat_comp = v_t * x_t + (1 - v_t) * y_hat
        return y_hat, y_hat_comp

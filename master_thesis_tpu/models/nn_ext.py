"""Small NN building blocks with exact torch layer semantics.

flax's stock ``ConvTranspose`` uses a different padding convention than
``torch.nn.ConvTranspose2d``; the DFPN flow estimators depend on torch's
(reference model_dfpn.py:698-706), so checkpoint parity requires matching
output geometry and values. ``ConvTranspose2dTorch`` expresses the torch op
as an input-dilated correlation with a spatially flipped kernel — a single
``lax.conv_general_dilated`` call that XLA maps onto the MXU like any conv.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def _uniform(bound):
    """uniform(-bound, bound) initializer (the torch conv default)."""

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv(nn.Module):
    """2-D conv (NHWC, cross-correlation) with explicit symmetric padding.

    Matches ``torch.nn.Conv2d(in, out, k, stride, padding, dilation)``.
    Kernel layout: HWIO.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        kh, kw = self.kernel_size
        # Kaiming-uniform fan_in init, the torch Conv2d default.
        fan_in = in_c * kh * kw
        bound = (1.0 / fan_in) ** 0.5 * (3.0**0.5)
        kernel = self.param(
            "kernel",
            _uniform(bound),
            (kh, kw, in_c, self.features),
            self.param_dtype,
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=self.strides,
            padding=(
                (self.padding[0], self.padding[0]),
                (self.padding[1], self.padding[1]),
            ),
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param(
                "bias", _uniform(bound), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class ConvTranspose2dTorch(nn.Module):
    """``torch.nn.ConvTranspose2d`` with (stride, padding, output_padding).

    Output size: ``(in - 1) * stride - 2 * padding + kernel + output_padding``.
    Kernel param layout: HWIO with I=in_channels, O=out_channels (the torch
    ``(in, out, kh, kw)`` weight transposed to ``(kh, kw, in, out)``).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        kh, kw = self.kernel_size
        # torch computes the init fan from weight.size(1) * k * k, which for
        # a ConvTranspose2d weight (in, out, kh, kw) is out * kh * kw.
        fan_in = self.features * kh * kw
        bound = (1.0 / fan_in) ** 0.5 * (3.0**0.5)
        kernel = self.param(
            "kernel",
            _uniform(bound),
            (kh, kw, in_c, self.features),
            self.param_dtype,
        )
        # Correlate the zero-stuffed input with the spatially flipped kernel.
        kernel_f = kernel[::-1, ::-1]
        pads = (
            (kh - 1 - self.padding[0], kh - 1 - self.padding[0] + self.output_padding[0]),
            (kw - 1 - self.padding[1], kw - 1 - self.padding[1] + self.output_padding[1]),
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel_f.astype(self.dtype),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_bias:
            bias = self.param(
                "bias", _uniform(bound), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y

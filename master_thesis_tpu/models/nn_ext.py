"""Small NN building blocks with exact torch layer semantics.

flax's stock ``ConvTranspose`` uses a different padding convention than
``torch.nn.ConvTranspose2d``; the DFPN flow estimators depend on torch's
(reference model_dfpn.py:698-706), so checkpoint parity requires matching
output geometry and values. ``ConvTranspose2dTorch`` expresses the torch op
as an input-dilated correlation with a spatially flipped kernel — a single
``lax.conv_general_dilated`` call that XLA maps onto the MXU like any conv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# Trace-time kill switches for the exact stride-folding regroupings (A/B
# measurement + escape hatch: the rewrites are forward-exact, but their
# VJPs lower differently than the plain strided forms — flip these before
# tracing to compare training-step timings on chip).
USE_S2D_CONV = True
USE_PHASE_TRANSPOSE = True


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, negative_slope * x)


def _uniform(bound):
    """uniform(-bound, bound) initializer (the torch conv default)."""

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def compose_conv_kernels(
    wa: jnp.ndarray, sa: int, wb: jnp.ndarray
) -> jnp.ndarray:
    """Kernel of the composition ``conv(conv(x, wa, stride=sa), wb)``.

    Both kernels HWIO, zero padding assumed on both convs (the composite is
    then a single zero-padded conv — valid because zero padding equals
    convolving on the zero-extended plane, where composition of
    translation-invariant linear ops is itself one conv). Biases are NOT
    composed — handle them via a zero-input response (see RRDBNet head).

    Composite kernel size ``ka + sa * (kb - 1)``; composite stride
    ``sa * sb``; composite padding ``pa + sa * pb``.
    """
    ka = wa.shape[0]
    kb = wb.shape[0]
    ci = wa.shape[2]
    # W_c[u, ci, co] = sum_v wb[v, cm, co] * wa[u - sa*v, ci, cm]
    #               = correlation of wa (as ci-batch images over cm channels)
    #                 with the spatially flipped wb, rhs-dilated by sa.
    img = wa.transpose(2, 0, 1, 3)  # (ci, ka, ka, cm)
    fil = wb[::-1, ::-1]  # (kb, kb, cm, co)
    pad = sa * (kb - 1)
    out = jax.lax.conv_general_dilated(
        img,
        fil,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(sa, sa),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (ci, kc, kc, co)
    return out.transpose(1, 2, 0, 3)


def fused_upsample_conv_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """Rewrites a 3x3 kernel applied after nearest-2x upsampling as one
    low-resolution 4-phase conv kernel ``(3, 3, C, 4*O)``.

    Identity: ``conv3x3(pad1(up2x(y)))[2i+a, 2j+b] = sum_{ki,kj}
    W[ki,kj] * y[i + floor((a+ki-1)/2), j + floor((b+kj-1)/2)]`` — a 2-tap
    window per axis per phase. Phases are packed into output channels
    (ordering ``(a, b, o)``) and un-packed by pixel shuffle. Exact
    regrouping (borders included: the upsampled zero pad maps to the
    low-res zero pad), ~4x fewer activation bytes touched and full MXU
    output lanes (4*O channels).
    """
    c, o = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, c, 2, 2, o), dtype=w.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for ki in range(3):
                for kj in range(3):
                    di = (a + ki - 1) // 2  # floor division handles -1
                    dj = (b + kj - 1) // 2
                    out = out.at[di + 1, dj + 1, :, a, b, :].add(w[ki, kj])
    return out.reshape(3, 3, c, 4 * o)


def pixel_shuffle_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 4*O) with (a, b, o) channel packing -> (N, 2h, 2w, O)."""
    n, h, w, c4 = x.shape
    o = c4 // 4
    x = x.reshape(n, h, w, 2, 2, o)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, 2 * h, 2 * w, o)


def strided_conv_s2d(x, kernel, s: int, pad_h: int, pad_w: int, dtype):
    """Stride-``s`` conv as space-to-depth + a dense stride-1 conv.

    Exact regrouping: with ``ky - pad = s*dY + py`` the strided window
    decomposes into per-phase taps at base offsets ``dY``, so the conv
    runs over ``s²x`` channels at ``1/s`` resolution — identical FLOPs,
    MXU-dense tiling instead of a strided window XLA tiles poorly.
    Caller must ensure H, W divide by ``s`` and the torch output size
    equals ``H/s x W/s`` (see :class:`Conv`).
    """
    b, hh, ww, c = x.shape
    kh, kw, _, o = kernel.shape
    x4 = x.reshape(b, hh // s, s, ww // s, s, c).transpose(0, 1, 3, 2, 4, 5)
    x4 = x4.reshape(b, hh // s, ww // s, s * s * c)
    lo_y, hi_y = (0 - pad_h) // s, (kh - 1 - pad_h) // s
    lo_x, hi_x = (0 - pad_w) // s, (kw - 1 - pad_w) // s
    w4 = jnp.zeros(
        (hi_y - lo_y + 1, hi_x - lo_x + 1, s, s, c, o), kernel.dtype
    )
    for ky in range(kh):
        d_y, p_y = divmod(ky - pad_h, s)
        for kx in range(kw):
            d_x, p_x = divmod(kx - pad_w, s)
            w4 = w4.at[d_y - lo_y, d_x - lo_x, p_y, p_x].set(kernel[ky, kx])
    w4 = w4.reshape(hi_y - lo_y + 1, hi_x - lo_x + 1, s * s * c, o)
    return jax.lax.conv_general_dilated(
        x4.astype(dtype), w4.astype(dtype),
        window_strides=(1, 1),
        padding=((-lo_y, hi_y), (-lo_x, hi_x)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )


def conv_phase_s2d(
    x, kernel, s: int, pad_h: int, pad_w: int, dtype,
    shuffle_out: bool = True,
):
    """Stride-1 k×k conv as s2d(``s``) → one dense low-res conv → pixel
    shuffle: BOTH sides phase-packed (``strided_conv_s2d`` packs only the
    input — it needs stride ``s`` to keep the output at low res).

    Exact regrouping for thin-``Cin`` stride-1 convs: the contraction
    deepens to ``s²·Cin`` and the output widens to ``s²·Cout`` at
    ``1/s²`` the positions — same products, MXU-dense, and still inside
    XLA's fusion scope. Measured r4 status: WINS standalone where the
    direct lowering starves (the flow estimator's Cin=10 c0 profiled
    ~13 TFLOP/s standalone) but LOSES in-graph (full align 71.6 vs
    66.9 ms, scripts/measure/dfpn_serving_ab.py) — in context XLA
    already covers the thin conv; kept as a candidate behind
    ``c0_mode="s2d"`` / ``vgg_pool4_hybrid``.

    Identity: ``y[s·i+py, s·j+px] = Σ_{u,v} k[u,v]·x[s·i+py+u-p, ...]``
    and ``s·i+py+u-p = s·(i+a)+qy`` pins each original tap ``u`` to one
    (low-res tap ``a``, input phase ``qy``) pair per output phase — a
    ``⌈(k+s-1)/s⌉``-tap dense conv over ``(qy,qx,c)``-packed channels.

    ``shuffle_out=False`` returns the phase-packed ``(N, H/s, W/s,
    s²·Cout)`` map (channel order ``(py, px, o)``) so callers can absorb
    the un-shuffle — e.g. a following 2×2 max-pool IS a max over the
    phase groups.
    """
    b, hh, ww, c = x.shape
    kh, kw, _, o = kernel.shape
    x4 = x.reshape(b, hh // s, s, ww // s, s, c).transpose(0, 1, 3, 2, 4, 5)
    x4 = x4.reshape(b, hh // s, ww // s, s * s * c)
    lo_y, hi_y = (0 - pad_h) // s, (s - 1 + kh - 1 - pad_h) // s
    lo_x, hi_x = (0 - pad_w) // s, (s - 1 + kw - 1 - pad_w) // s
    w4 = jnp.zeros(
        (hi_y - lo_y + 1, hi_x - lo_x + 1, s, s, c, s, s, o), kernel.dtype
    )
    for py in range(s):
        for ky in range(kh):
            a_y, q_y = divmod(py + ky - pad_h, s)
            for px in range(s):
                for kx in range(kw):
                    a_x, q_x = divmod(px + kx - pad_w, s)
                    w4 = w4.at[a_y - lo_y, a_x - lo_x, q_y, q_x, :, py, px].set(
                        kernel[ky, kx]
                    )
    w4 = w4.reshape(hi_y - lo_y + 1, hi_x - lo_x + 1, s * s * c, s * s * o)
    y4 = jax.lax.conv_general_dilated(
        x4.astype(dtype), w4.astype(dtype),
        window_strides=(1, 1),
        padding=((-lo_y, hi_y), (-lo_x, hi_x)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if not shuffle_out:
        return y4
    n, h4, w4_, c4 = y4.shape
    y4 = y4.reshape(n, h4, w4_, s, s, o).transpose(0, 1, 3, 2, 4, 5)
    return y4.reshape(n, h4 * s, w4_ * s, o)


class Conv(nn.Module):
    """2-D conv (NHWC, cross-correlation) with explicit symmetric padding.

    Matches ``torch.nn.Conv2d(in, out, k, stride, padding, dilation)``.
    Kernel layout: HWIO. Stride-s convs whose output is exactly ``H/s x
    W/s`` run as space-to-depth + a dense stride-1 conv
    (:func:`strided_conv_s2d`) — an exact regrouping that avoids XLA's
    poor tiling of strided windows on TPU.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # Per-module override of USE_S2D_CONV (None = module global). The
    # regrouping is exact either way; which lowering is faster is
    # shape-dependent (on v5e it wins for the CHN head, loses inside the
    # DFPN flow estimators — BENCH_NOTES.md).
    use_s2d: Optional[bool] = None

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
        s = self.strides[0]
        use_s2d = (
            (USE_S2D_CONV if self.use_s2d is None else self.use_s2d)
            and s > 1
            and self.strides[1] == s
            and self.dilation == (1, 1)
            and x.shape[1] % s == 0
            and x.shape[2] % s == 0
            and (x.shape[1] + 2 * self.padding[0] - kh) // s + 1
            == x.shape[1] // s
            and (x.shape[2] + 2 * self.padding[1] - kw) // s + 1
            == x.shape[2] // s
        )
        if use_s2d:
            y = strided_conv_s2d(
                x, kernel, s, self.padding[0], self.padding[1], self.dtype
            )
        else:
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


def phase_transpose_kernel(
    w: jnp.ndarray, stride: int, padding: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Stride-``s`` transposed conv as one low-resolution phase conv.

    The transpose conv ``y[s·v - p + κ] += x[v]·W[κ]`` evaluated at output
    ``u = s·t + a`` (phase ``a``) reads input offsets ``d = v - t`` with tap
    ``κ = a + p - s·d`` — a *small dense conv per phase*. All ``s²`` phases
    are packed into output channels ``(a, b, o)`` (un-packed by
    :func:`pixel_shuffle_2x` for ``s=2``) so the whole transpose conv is ONE
    low-res conv with ``4·O`` output lanes. Exact regrouping: the same
    products are summed, none of the ``(s²-1)/s²`` zero-stuffed positions of
    the ``lhs_dilation`` lowering are ever touched.

    Returns ``(kernel (K', K', C, s²·O), conv padding (padL, padR))`` for a
    stride-1 NHWC correlation; output spatial size is the input's, so it
    only covers geometries where the transposed output is exactly
    ``s x input`` (k=3,p=1,op=1 and k=5,p=2,op=1 — both DFPN cases).
    """
    k, _, c, o = w.shape
    s, p = stride, padding
    d_min = min(-((k - 1 - a - p) // s) for a in range(s))  # ceil((a+p-k+1)/s)
    d_max = max((a + p) // s for a in range(s))
    kp = d_max - d_min + 1
    out = jnp.zeros((kp, kp, c, s, s, o), dtype=w.dtype)
    for a in range(s):
        for b in range(s):
            for dy in range(d_min, d_max + 1):
                for dx in range(d_min, d_max + 1):
                    ky = a + p - s * dy
                    kx = b + p - s * dx
                    if 0 <= ky < k and 0 <= kx < k:
                        out = out.at[dy - d_min, dx - d_min, :, a, b, :].set(
                            w[ky, kx]
                        )
    return out.reshape(kp, kp, c, s * s * o), (-d_min, d_max)


class ConvTranspose2dTorch(nn.Module):
    """``torch.nn.ConvTranspose2d`` with (stride, padding, output_padding).

    Output size: ``(in - 1) * stride - 2 * padding + kernel + output_padding``.
    Kernel param layout: HWIO with I=in_channels, O=out_channels (the torch
    ``(in, out, kh, kw)`` weight transposed to ``(kh, kw, in, out)``).

    When the geometry is an exact 2x upsample (stride 2 and
    ``output_padding`` covering the tail: out = 2 x in — every DFPN use),
    the op runs as a 4-phase low-res conv + pixel shuffle
    (:func:`phase_transpose_kernel`): same products, ~(s²·k²)/K'²·4 fewer
    MACs than the zero-stuffed ``lhs_dilation`` lowering and full MXU
    output lanes. Other geometries keep the dilated form.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (2, 2)
    padding: Tuple[int, int] = (1, 1)
    output_padding: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    # Per-module override of USE_PHASE_TRANSPOSE (None = module global);
    # see Conv.use_s2d.
    use_phase: Optional[bool] = None

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
        s = self.strides[0]
        exact_2x = (
            (USE_PHASE_TRANSPOSE if self.use_phase is None else self.use_phase)
            and self.strides == (2, 2)
            and kh == kw
            and self.padding[0] == self.padding[1]
            # out = (in-1)·2 - 2p + k + op == 2·in  <=>  op == 2p - k + 2
            and self.output_padding == (2 * self.padding[0] - kh + 2,) * 2
        )
        if exact_2x:
            w4, (pl, pr) = phase_transpose_kernel(kernel, s, self.padding[0])
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w4.astype(self.dtype),
                window_strides=(1, 1),
                padding=((pl, pr), (pl, pr)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
            )
            y = pixel_shuffle_2x(y)
        else:
            # Correlate the zero-stuffed input with the spatially flipped
            # kernel.
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

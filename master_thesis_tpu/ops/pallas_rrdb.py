"""Fused RRDB Pallas kernel (the CHN trunk's hot loop).

One kernel instance computes a full RRDB — 3 residual dense blocks, 15
dense-conv applications — for one frame, entirely in VMEM. The layout trick:
activations live as ``(C, H*W)`` (channels on sublanes, pixels on lanes), so
a 3x3 conv tap at offset ``(dy, dx)`` is a *lane roll* by ``dy*W + dx``
followed by one MXU matmul ``(OUT, C) @ (C, H*W)`` — no im2col, no HBM
round-trips between the 15 convs, and the per-source contribution
regrouping from models/chn.py applies (wide OUT dims keep the MXU full).
Row-wrap artifacts of the flat roll are masked with lane iotas.

The kernel defines no VJP of its own; :func:`make_hybrid_trunk` makes it
trainable by pairing the Pallas forward with a rematerialized backward
through the XLA twin (:func:`rrdb_trunk_xla`).
Parity: exact regrouping of the reference RDB math (model_chn.py:588-623),
tested against the flax module in interpret mode.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tap offsets of a 3x3 conv, (dy, dx) relative to center.
_TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def _split_rdb_weights(params: dict, nf: int, gc: int):
    """RDB params (conv{k}_kernel/bias) -> per-source tap-major matrices.

    Returns (weights, biases): weights[src] has shape (9, OUT_src, C_src)
    where OUT_src concatenates every conv this source feeds (the regrouped
    formulation); biases[k] is conv_k's bias, shape (out_k, 1).
    """
    ks = [params[f"conv{k}_kernel"] for k in range(1, 6)]  # (3,3,in,out)
    bs = [params[f"conv{k}_bias"] for k in range(1, 6)]
    outs = [gc, gc, gc, gc, nf]
    weights = []
    for src in range(5):  # source tensor: x, x1, x2, x3, x4
        lo = 0 if src == 0 else nf + (src - 1) * gc
        hi = nf if src == 0 else lo + gc
        first_target = src  # x feeds conv1..5; x_i feeds conv_{i+1}..5
        blocks = [ks[t][:, :, lo:hi, :] for t in range(first_target, 5)]
        w = jnp.concatenate(blocks, axis=-1)  # (3, 3, C_src, OUT_src)
        # (OUT, 9*C): taps stacked along the contraction axis so each source
        # costs ONE MXU matmul with K = 9*C (K=32 or 64 alone starves the
        # 128-deep systolic array).
        w = w.reshape(9, w.shape[2], w.shape[3])  # (9, C, OUT)
        w = w.transpose(2, 0, 1).reshape(w.shape[2], 9 * w.shape[1])
        weights.append(w)
    biases = [b.reshape(-1, 1) for b in bs]
    return weights, biases


def _rrdb_tap_weights(rrdb_params: dict, nf: int, gc: int, dtype):
    """Flattened (weights, biases) lists for the 3 RDBs of one RRDB."""
    flat = []
    for j in (1, 2, 3):
        w, b = _split_rdb_weights(rrdb_params[f"rdb{j}"], nf, gc)
        flat.extend(a.astype(dtype) for a in w)
        flat.extend(a.astype(jnp.float32) for a in b)
    return flat


def _tap_masks(w_img: int, hw: int) -> np.ndarray:
    """(9, HW) f32 validity planes for the flat-roll taps — 1 where tap
    ``(dy, dx)`` of flat position ``p`` stays on the same row and in range.
    Static per (W, HW); passed into the kernel so masking is ONE multiply
    per tap instead of iota compares + select on the VPU."""
    pos = np.arange(hw)
    col = pos % w_img
    masks = np.empty((9, hw), np.float32)
    for k, (dy, dx) in enumerate(_TAPS):
        off = dy * w_img + dx
        valid = (col + dx >= 0) & (col + dx < w_img)
        valid &= (pos + off >= 0) & (pos + off < hw)
        masks[k] = valid
    return masks


def _rrdb_kernel(nf, gc, w_img, x_ref, masks_ref, *rest):
    """One frame's RRDB. x_ref: (1, C, HW); masks_ref: (9, HW) tap validity.
    rest = 3x(5 weights + 5 biases) then out_ref."""
    out_ref = rest[-1]
    wb = rest[:-1]
    hw = x_ref.shape[-1]

    outs = [gc, gc, gc, gc, nf]
    bounds = np.cumsum(outs)

    def accum_from(src_vals, w_stk, acc):
        """acc (n_out, HW) += all 9 tap contributions from src_vals.

        The 9 masked rolls are stacked along the contraction axis and hit
        the MXU as ONE (OUT, 9C) @ (9C, HW) matmul. src rolls happen in f32
        (Mosaic's rotate only supports 32-bit data); the matmul operand is
        cast to the weights' dtype.
        """
        src_f32 = src_vals.astype(jnp.float32)
        taps = []
        for k, (dy, dx) in enumerate(_TAPS):
            off = dy * w_img + dx
            if off == 0:
                taps.append(src_f32)
                continue
            # pltpu.roll requires a non-negative shift; roll by -off mod HW.
            shifted = pltpu.roll(src_f32, (-off) % hw, 1)
            taps.append(shifted * masks_ref[k : k + 1, :])
        stacked = jnp.concatenate(taps, axis=0).astype(w_stk.dtype)  # (9C, HW)
        prec = (
            jax.lax.Precision.HIGHEST if w_stk.dtype == jnp.float32 else None
        )
        return acc + jax.lax.dot(
            w_stk, stacked, preferred_element_type=jnp.float32, precision=prec
        )

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    split_at = [int(v) for v in bounds[:-1]]

    x0 = x_ref[0]  # (C, HW)
    x_blk = x0
    for j in range(3):
        ws = wb[j * 10 : j * 10 + 5]
        bs = wb[j * 10 + 5 : j * 10 + 10]
        # Per-conv accumulator segments (Mosaic has no scatter-add, so the
        # big accumulator is kept as a list and updated with plain adds).
        # Sources pass in their native dtype: the rolls run f32 either way
        # and the tap stack is rounded to the weight dtype once at the
        # matmul — pre-casting would be two extra VPU passes, same values.
        p = accum_from(
            x_blk, ws[0][:], jnp.zeros((int(bounds[-1]), hw), jnp.float32)
        )
        accs = list(jnp.split(p, split_at, axis=0))

        for k in range(4):  # produce x1..x4, distribute their contributions
            xk = lrelu(accs[k] + bs[k][:])
            w = ws[k + 1][:]  # contributions from xk into conv_{k+2}..conv_5
            contrib = accum_from(
                xk, w, jnp.zeros((w.shape[0], hw), jnp.float32)
            )
            pieces = jnp.split(
                contrib, [int(b - bounds[k]) for b in bounds[k + 1 : -1]], axis=0
            )
            for idx, piece in enumerate(pieces):
                accs[k + 1 + idx] = accs[k + 1 + idx] + piece
        x5 = accs[4] + bs[4][:]
        x_blk = (0.2 * x5 + x_blk.astype(jnp.float32)).astype(x_blk.dtype)
    out_ref[0] = (0.2 * x_blk.astype(jnp.float32) + x0.astype(jnp.float32)).astype(
        out_ref.dtype
    )


def rrdb_pallas(
    x_chw: jnp.ndarray,
    rrdb_params: dict,
    nf: int,
    gc: int,
    w_img: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Applies one RRDB to ``x_chw`` (N, C, H*W) via the fused kernel."""
    n, c, hw = x_chw.shape
    wb = _rrdb_tap_weights(rrdb_params, nf, gc, x_chw.dtype)
    masks = jnp.asarray(_tap_masks(w_img, hw))
    kernel = functools.partial(_rrdb_kernel, nf, gc, w_img)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(wb)),
        out_specs=pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, hw), x_chw.dtype),
        interpret=interpret,
    )(x_chw, masks, *wb)


def pallas_trunk_fits(nf: int, gc: int, hw: int, itemsize: int = 2) -> bool:
    """Whether one kernel instance's working set fits scoped VMEM (16 MB).

    Per grid step the kernel holds (all (·, HW)-shaped): the f32 source
    being rolled, the 9-tap stack (9·C_src in the weight dtype), the f32
    accumulator segments (sum of conv outputs = nf + 4·gc rows), and the
    x/out blocks. ``itemsize`` is the activation/weight dtype's byte width
    (2 for the bf16 serving/training path, 4 for f32). Measured on v5e at
    bf16: HW=4096 compiles, HW=8192 overflows by ~3.5 MB — the estimate
    below reproduces that boundary with ~20% slack.
    """
    acc_rows = nf + 4 * gc
    bytes_per_lane = (
        9 * nf * itemsize  # tap stack of the widest source
        + nf * 4  # f32 rolled source
        + acc_rows * 4  # f32 accumulators
        + 2 * nf * itemsize  # x block + out block
    )
    return bytes_per_lane * hw <= 12 << 20


def rrdb_trunk_pallas(
    x_nhwc: jnp.ndarray,
    rrdbnet_params: dict,
    nb: int,
    nf: int = 64,
    gc: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Runs the full nb-block trunk with the fused kernel.

    x_nhwc: (N, H, W, nf) trunk input (the RRDBNet head output). Returns the
    trunk output in NHWC, ready for trunk_conv. The caller is responsible
    for checking :func:`pallas_trunk_fits` — at large spatial sizes (512²+)
    the per-frame working set exceeds scoped VMEM and the XLA trunk
    (:func:`rrdb_trunk_xla`) must be used instead.
    """
    n, h, w, c = x_nhwc.shape
    x = x_nhwc.reshape(n, h * w, c).transpose(0, 2, 1)  # (N, C, HW)
    for i in range(nb):
        x = rrdb_pallas(x, rrdbnet_params[f"rrdb_{i}"], nf, gc, w, interpret=interpret)
    return x.transpose(0, 2, 1).reshape(n, h, w, c)


def make_hybrid_trunk(
    nb: int,
    nf: int = 64,
    gc: int = 32,
    dtype=jnp.bfloat16,
    use_pallas: bool = True,
    interpret: bool = False,
):
    """Differentiable trunk: fused Pallas forward, XLA-remat backward.

    Returns ``trunk(x_nhwc, trunk_params) -> (N, H, W, nf)`` wrapped in a
    ``jax.custom_vjp``:

    - **forward**: the fused Pallas kernel (:func:`rrdb_trunk_pallas`) when
      the per-frame working set fits VMEM, else the regrouped XLA
      formulation. When never differentiated (serving), this is exactly the
      old forward — the custom-vjp wrapper adds nothing to the trace.
    - **backward**: rematerialized VJP of :func:`rrdb_trunk_xla` from the
      saved ``(x, params)`` residuals. Only the trunk *input* and the f32
      parameters are held across fwd→bwd (vs. ~60 dense blocks of
      intermediate activations), and the gradient is the exact gradient of
      the XLA formulation evaluated at the same primal point.

    Training the thesis (2000 iters x 100 epochs, reference data.py:364)
    is the dominant compute; this puts its forward on the fastest kernel
    while keeping autodiff exact w.r.t. the XLA math.
    """

    def xla_fn(x, params):
        return rrdb_trunk_xla(x, params, nb, nf, gc, dtype=dtype)

    itemsize = jnp.dtype(dtype).itemsize

    def _impl(x, params):
        n, h, w, c = x.shape
        if use_pallas and (interpret or pallas_trunk_fits(nf, gc, h * w, itemsize)):
            return rrdb_trunk_pallas(
                x.astype(dtype), params, nb=nb, nf=nf, gc=gc, interpret=interpret
            )
        return xla_fn(x, params)

    @jax.custom_vjp
    def trunk(x, params):
        return _impl(x, params)

    def fwd(x, params):
        return _impl(x, params), (x, params)

    def bwd(res, g):
        x, params = res
        _, vjp = jax.vjp(xla_fn, x, params)
        return vjp(g)

    trunk.defvjp(fwd, bwd)
    return trunk


def rrdb_trunk_xla(
    x_nhwc: jnp.ndarray,
    rrdbnet_params: dict,
    nb: int,
    nf: int = 64,
    gc: int = 32,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """XLA twin of :func:`rrdb_trunk_pallas` on the same flat param tree.

    Same regrouped per-source wide-conv formulation as the flax module
    (models/chn.py:ResidualDenseBlock5C); used when the fused kernel's
    working set exceeds VMEM (large spatial sizes).
    """

    # This backend defaults conv precision to bf16 even in f32 (CLAUDE.md);
    # request full precision when running f32 (parity tests), bf16 when
    # serving in bf16 (HIGHEST on bf16 inputs is the same multiply anyway).
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    def conv(inp, kernel):
        return jax.lax.conv_general_dilated(
            inp.astype(dtype), kernel.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=prec,
        )

    outs = [gc, gc, gc, gc, nf]
    splits = np.cumsum(outs)[:-1].tolist()

    def rdb(params, x):
        ks = [params[f"conv{k}_kernel"] for k in range(1, 6)]
        bs = [params[f"conv{k}_bias"] for k in range(1, 6)]

        def src_w(src):
            lo = 0 if src == 0 else nf + (src - 1) * gc
            hi = nf if src == 0 else lo + gc
            return jnp.concatenate(
                [ks[t][:, :, lo:hi, :] for t in range(src, 5)], axis=-1
            )

        p = list(jnp.split(conv(x, src_w(0)), splits, axis=-1))
        xs = x
        for k in range(4):
            xk = jax.nn.leaky_relu(p[k] + bs[k].astype(dtype), 0.2)
            contrib = conv(xk, src_w(k + 1))
            pieces = jnp.split(
                contrib, np.cumsum(outs[k + 1 : -1]).tolist(), axis=-1
            )
            for idx, piece in enumerate(pieces):
                p[k + 1 + idx] = p[k + 1 + idx] + piece
        x5 = p[4] + bs[4].astype(dtype)
        return 0.2 * x5 + xs

    x = x_nhwc.astype(dtype)
    for i in range(nb):
        blk = rrdbnet_params[f"rrdb_{i}"]
        y = x
        for j in (1, 2, 3):
            y = rdb(blk[f"rdb{j}"], y)
        x = 0.2 * y + x
    return x

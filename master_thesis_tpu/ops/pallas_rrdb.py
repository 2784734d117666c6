"""Fused RRDB Pallas kernel (the CHN trunk's hot loop).

One kernel instance computes a full RRDB — 3 residual dense blocks, 15
dense-conv applications — for one frame, entirely in VMEM. The layout trick:
activations live as ``(C, H*W)`` (channels on sublanes, pixels on lanes), so
a 3x3 conv tap at offset ``(dy, dx)`` is a *lane roll* by ``dy*W + dx``
followed by one MXU matmul ``(OUT, C) @ (C, H*W)`` — no im2col, no HBM
round-trips between the 15 convs, and the per-source contribution
regrouping from models/chn.py applies (wide OUT dims keep the MXU full).
Row-wrap artifacts of the flat roll are masked with lane iotas.

:func:`make_hybrid_trunk` makes the trunk trainable: a ``jax.custom_vjp``
pairing the fused forward with the fused backward kernel
(:func:`rrdb_bwd_pallas` — reverse per-RRDB sweep, hidden activations
recomputed in VMEM, weight grads accumulated across the frame grid), with
an XLA-remat fallback (:func:`rrdb_trunk_xla`) past VMEM limits.
Parity: exact regrouping of the reference RDB math (model_chn.py:588-623),
tested against the flax module in interpret mode.
"""

from __future__ import annotations

import functools

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


def _rrdb_adj_weights(rrdb_params: dict, nf: int, gc: int, dtype):
    """Adjoint-conv matrices for the backward: per RDB, per conv t, the
    full conv_t kernel as ``(in_t, 9*out_t)`` so the source-grad step is
    ONE K=9*out_t matmul against the 9-tap stack of ``dP_t`` (the adjoint
    of a conv is a conv with the transposed, spatially-flipped kernel —
    the flip lives in the +off tap rolls)."""
    flat = []
    for j in (1, 2, 3):
        p = rrdb_params[f"rdb{j}"]
        for t in range(1, 6):
            k = p[f"conv{t}_kernel"]  # (3, 3, in_t, out_t)
            a = k.reshape(9, k.shape[2], k.shape[3])
            a = a.transpose(1, 0, 2).reshape(k.shape[2], 9 * k.shape[3])
            flat.append(a.astype(dtype))
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


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.2 * v)


def _accum_taps(src_vals, w_stk, acc, masks_ref, w_img):
    """acc (n_out, HW) += all 9 tap contributions from src_vals.

    The 9 masked rolls are stacked along the contraction axis and hit
    the MXU as ONE (OUT, 9C) @ (9C, HW) matmul. src rolls happen in f32
    (Mosaic's rotate only supports 32-bit data); the matmul operand is
    cast to the weights' dtype.
    """
    hw = src_vals.shape[-1]
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
    prec = jax.lax.Precision.HIGHEST if w_stk.dtype == jnp.float32 else None
    return acc + jax.lax.dot(
        w_stk, stacked, preferred_element_type=jnp.float32, precision=prec
    )


def _rrdb_kernel(nf, gc, w_img, x_ref, masks_ref, *rest):
    """One frame's RRDB. x_ref: (1, C, HW); masks_ref: (9, HW) tap validity.
    rest = 3x(5 weights + 5 biases) then out_ref."""
    out_ref = rest[-1]
    wb = rest[:-1]

    outs = [gc, gc, gc, gc, nf]
    bounds = np.cumsum(outs)

    x0 = x_ref[0]  # (C, HW)
    x_blk = x0
    for j in range(3):
        ws = wb[j * 10 : j * 10 + 5]
        bs = wb[j * 10 + 5 : j * 10 + 10]
        # Sources pass in their native dtype: the rolls run f32 either way
        # and the tap stack is rounded to the weight dtype once at the
        # matmul — pre-casting would be two extra VPU passes, same values.
        x_blk, _ = _rdb_fwd_block(x_blk, ws, bs, masks_ref, w_img, bounds)
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
    big_vmem: bool = False,
) -> jnp.ndarray:
    """Applies one RRDB to ``x_chw`` (N, C, H*W) via the fused kernel.

    ``big_vmem`` raises Mosaic's VMEM window to 100 MB (the backward
    kernel's setting) for working sets past the default scoped window —
    large spatial sizes (512² inputs -> HW=16384 trunk frames)."""
    n, c, hw = x_chw.shape
    wb = _rrdb_tap_weights(rrdb_params, nf, gc, x_chw.dtype)
    masks = jnp.asarray(_tap_masks(w_img, hw))
    kernel = functools.partial(_rrdb_kernel, nf, gc, w_img)
    compiler_params = (
        pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        if big_vmem
        else None
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(wb)),
        out_specs=pl.BlockSpec((1, c, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, hw), x_chw.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(x_chw, masks, *wb)


def _trunk_bytes_per_lane(nf: int, gc: int, itemsize: int) -> int:
    """Forward-kernel working set per lane: the f32 source being rolled,
    the 9-tap stack (9·C_src in the weight dtype), the f32 accumulator
    segments (sum of conv outputs = nf + 4·gc rows), and the x/out blocks.
    Empirically accurate: at bf16 HW=8192 it predicts 19.9 MB vs the
    measured ~19.5 MB overflow boundary of the 16 MB scoped window."""
    acc_rows = nf + 4 * gc
    return (
        9 * nf * itemsize  # tap stack of the widest source
        + nf * 4  # f32 rolled source
        + acc_rows * 4  # f32 accumulators
        + 2 * nf * itemsize  # x block + out block
    )


def pallas_trunk_fits(nf: int, gc: int, hw: int, itemsize: int = 2) -> bool:
    """Whether one kernel instance's working set fits the default scoped
    VMEM window (16 MB). ``itemsize`` is the activation/weight dtype's byte
    width (2 for the bf16 serving/training path, 4 for f32). Measured on
    v5e at bf16: HW=4096 compiles, HW=8192 overflows by ~3.5 MB — the
    estimate reproduces that boundary with ~20% slack.
    """
    return _trunk_bytes_per_lane(nf, gc, itemsize) * hw <= 12 << 20


def pallas_trunk_fits_big(nf: int, gc: int, hw: int, itemsize: int = 2) -> bool:
    """Whether the forward kernel fits the RAISED 100 MB VMEM window
    (``rrdb_pallas(big_vmem=True)``). The production 512² serving shape
    (trunk HW=16384 bf16) estimates ~40 MB — in comfortably; the budget
    leaves the same headroom ratio the scoped-window estimate proved out.
    Measured verdict vs the banded kernel: BENCH_NOTES.md r4 table."""
    return _trunk_bytes_per_lane(nf, gc, itemsize) * hw <= 72 << 20


def rrdb_trunk_pallas(
    x_nhwc: jnp.ndarray,
    rrdbnet_params: dict,
    nb: int,
    nf: int = 64,
    gc: int = 32,
    interpret: bool = False,
    big_vmem: bool = False,
) -> jnp.ndarray:
    """Runs the full nb-block trunk with the fused kernel.

    x_nhwc: (N, H, W, nf) trunk input (the RRDBNet head output). Returns the
    trunk output in NHWC, ready for trunk_conv. The caller is responsible
    for checking :func:`pallas_trunk_fits` (default window) or
    :func:`pallas_trunk_fits_big` (``big_vmem=True``, 100 MB window — the
    512² serving shape); past both, the banded kernel
    (:func:`rrdb_trunk_pallas_banded`) or the XLA trunk
    (:func:`rrdb_trunk_xla`) must be used instead.
    """
    n, h, w, c = x_nhwc.shape
    x = x_nhwc.reshape(n, h * w, c).transpose(0, 2, 1)  # (N, C, HW)
    for i in range(nb):
        x = rrdb_pallas(
            x, rrdbnet_params[f"rrdb_{i}"], nf, gc, w, interpret=interpret,
            big_vmem=big_vmem,
        )
    return x.transpose(0, 2, 1).reshape(n, h, w, c)


def _rdb_fwd_block(x_blk, ws, bs, masks_ref, w_img, bounds, keep_hidden=False):
    """One RDB forward on a VMEM-resident ``(C, HW)`` block.

    Returns ``(out, hidden)`` where hidden = [x1..x4] (pre-residual hidden
    activations, needed by the backward) when ``keep_hidden``.
    """
    hw = x_blk.shape[-1]
    split_at = [int(v) for v in bounds[:-1]]
    p = _accum_taps(
        x_blk, ws[0][:], jnp.zeros((int(bounds[-1]), hw), jnp.float32),
        masks_ref, w_img,
    )
    accs = list(jnp.split(p, split_at, axis=0))
    hidden = []
    for k in range(4):
        xk = _lrelu(accs[k] + bs[k][:])
        if keep_hidden:
            # Stored at the working dtype: the backward casts these to the
            # weight dtype at every use anyway (tap stacks, sign masks).
            hidden.append(xk.astype(x_blk.dtype))
        w = ws[k + 1][:]
        contrib = _accum_taps(
            xk, w, jnp.zeros((w.shape[0], hw), jnp.float32), masks_ref, w_img
        )
        pieces = jnp.split(
            contrib, [int(b - bounds[k]) for b in bounds[k + 1 : -1]], axis=0
        )
        for idx, piece in enumerate(pieces):
            accs[k + 1 + idx] = accs[k + 1 + idx] + piece
    x5 = accs[4] + bs[4][:]
    out = (0.2 * x5 + x_blk.astype(jnp.float32)).astype(x_blk.dtype)
    return out, hidden


def _rdb_bwd_block(x_blk, g_out, ws, bs, adjs, masks_ref, w_img, nf, gc):
    """One RDB backward on VMEM blocks.

    x_blk: ``(C, HW)`` RDB input; g_out: ``(C, HW)`` f32 cotangent of the
    RDB output. Recomputes the hidden activations, then walks the convs in
    reverse. Per conv t the source grads are the *adjoint conv*: the 9
    masked +off rolls of ``dP_t`` stack along the contraction axis (the
    exact transpose of the forward's roll-by--off-then-mask) and ONE
    ``(in_t, 9*out_t) @ (9*out_t, HW)`` matmul — full MXU depth — yields
    every source's contribution at once. Weight grads are K=HW matmuls
    against rebuilt tap stacks of the sources. Returns
    ``(dx (C,HW) f32, dW list[5], db list[5])`` with dW in the forward's
    per-source tap-stacked layout (:func:`_split_rdb_weights`).
    """
    hw = x_blk.shape[-1]
    outs = [gc, gc, gc, gc, nf]
    bounds = np.cumsum(outs)
    _, hidden = _rdb_fwd_block(
        x_blk, ws, bs, masks_ref, w_img, bounds, keep_hidden=True
    )
    xs = [x_blk.astype(jnp.float32)] + [h for h in hidden]  # sources s0..s4
    c_of = [nf, gc, gc, gc, gc]

    wdtype = ws[0].dtype
    dP = [None] * 6  # dP[t] cotangents, stored at the weight dtype (they
    # are only ever consumed through weight-dtype matmuls)
    db = [None] * 5
    dsrc = [jnp.zeros((c_of[s], hw), jnp.float32) for s in range(5)]

    for t in range(5, 0, -1):
        if t == 5:
            dpt_f32 = 0.2 * g_out
        else:
            dxt = dsrc[t]
            # f32 compare: Mosaic rejects bf16 comparisons on this target.
            dpt_f32 = jnp.where(
                xs[t].astype(jnp.float32) >= 0, dxt, 0.2 * dxt
            )
        db[t - 1] = jnp.sum(dpt_f32, axis=1, keepdims=True)
        dpt = dpt_f32.astype(wdtype)
        dP[t] = dpt
        # Adjoint-conv taps of dP_t: dsrc[q] += W·dP[q-off]·mask(q-off)
        # = W·roll(mask ⊙ dP, +off)[q].
        taps = []
        for k, (dy, dx_) in enumerate(_TAPS):
            off = dy * w_img + dx_
            if off == 0:
                taps.append(dpt_f32)
                continue
            taps.append(
                pltpu.roll(dpt_f32 * masks_ref[k: k + 1, :], off % hw, 1)
            )
        stacked = jnp.concatenate(taps, axis=0).astype(wdtype)  # (9out_t,HW)
        z = jax.lax.dot(
            adjs[t - 1][:], stacked, preferred_element_type=jnp.float32
        )  # (in_t, HW) — per-source grads, forward channel layout
        dsrc[0] = dsrc[0] + z[:nf]
        for i in range(1, t):
            dsrc[i] = dsrc[i] + z[nf + (i - 1) * gc: nf + i * gc]

    dW = []
    for s in range(5):
        src_f32 = xs[s].astype(jnp.float32)  # rolls are 32-bit only
        dpcat = jnp.concatenate(
            [dP[t] for t in range(s + 1, 6)], axis=0
        )  # (OUT_s, HW)
        # K=HW weight-grad matmuls in 3-tap groups: full MXU depth with a
        # (3C_s, HW) stack peak instead of the 9x one.
        cols = []
        for g0 in range(0, 9, 3):
            taps = []
            for k in range(g0, g0 + 3):
                dy, dx_ = _TAPS[k]
                off = dy * w_img + dx_
                if off == 0:
                    taps.append(src_f32)
                    continue
                shifted = pltpu.roll(src_f32, (-off) % hw, 1)
                taps.append(shifted * masks_ref[k: k + 1, :])
            stacked = jnp.concatenate(taps, axis=0).astype(wdtype)
            cols.append(
                jax.lax.dot_general(
                    dpcat, stacked,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # (OUT_s, 3C_s)
        dW.append(jnp.concatenate(cols, axis=1))  # (OUT_s, 9C_s)
    dx = g_out + dsrc[0]
    return dx, dW, db


def _rrdb_bwd_kernel(nf, gc, w_img, x_ref, g_ref, masks_ref, *rest):
    """Backward of one RRDB for one frame.

    rest = 3x(5 weights + 5 biases), then 3x5 adjoint matrices
    (:func:`_rrdb_adj_weights`), then outputs: dx_ref, 15 per-frame dW
    refs (rdb-major, source-minor), 15 per-frame db refs (rdb-major,
    conv-minor). dW/db are written per frame and reduced outside the
    kernel — keeping the f32 accumulators OUT of VMEM buys the room the
    backward's working set needs at the production HW=4096.
    """
    n_wb = 30
    wb = rest[:n_wb]
    adj = rest[n_wb: n_wb + 15]
    base = n_wb + 15
    dx_ref = rest[base]
    dw_refs = rest[base + 1: base + 16]
    db_refs = rest[base + 16: base + 31]

    outs = [gc, gc, gc, gc, nf]
    bounds = np.cumsum(outs)
    x0 = x_ref[0]  # (C, HW)
    g = g_ref[0].astype(jnp.float32)

    def rdb_wb(j):
        return wb[j * 10: j * 10 + 5], wb[j * 10 + 5: j * 10 + 10]

    # Forward recompute of the RDB chain inputs.
    ins = [x0]
    for j in range(2):
        ws, bs = rdb_wb(j)
        out, _ = _rdb_fwd_block(ins[-1], ws, bs, masks_ref, w_img, bounds)
        ins.append(out)

    # RRDB residual: out = 0.2 * rdb3(rdb2(rdb1(x))) + x.
    d = 0.2 * g
    for j in range(2, -1, -1):
        ws, bs = rdb_wb(j)
        d, dW, db = _rdb_bwd_block(
            ins[j], d, ws, bs, adj[j * 5: j * 5 + 5], masks_ref, w_img,
            nf, gc,
        )
        for s in range(5):
            dw_refs[j * 5 + s][0] = dW[s]
        for t in range(5):
            db_refs[j * 5 + t][0] = db[t]

    dx_ref[0] = (d + g).astype(dx_ref.dtype)


_BAND_HALO = 5  # one RDB = 5 convs = 5 rows of halo per side


def _band_rows(nf: int, gc: int, w_img: int, itemsize: int = 2) -> int:
    """Largest interior band height whose (band + 2*halo) working set fits
    the forward kernel's VMEM budget (see :func:`pallas_trunk_fits`)."""
    acc_rows = nf + 4 * gc
    bytes_per_lane = (
        9 * nf * itemsize + nf * 4 + acc_rows * 4 + 2 * nf * itemsize
    )
    lanes = (12 << 20) // bytes_per_lane
    return lanes // w_img - 2 * _BAND_HALO


def banded_trunk_fits(nf: int, gc: int, w_img: int, itemsize: int = 2) -> bool:
    """Whether the banded per-RDB path is worthwhile: at least 8 interior
    rows per band (else halo recompute dominates)."""
    return _band_rows(nf, gc, w_img, itemsize) >= 8


def _band_tap_masks(
    w_img: int, br: int, halo: int, n_bands: int, h: int
) -> np.ndarray:
    """(n_bands, 9, BHW) tap-validity planes for the banded RDB kernel.

    Same column/flat logic as :func:`_tap_masks`, plus a frame-row term:
    band ``b``'s row ``r`` holds frame row ``b*br - halo + r``, and a tap
    is valid only if its *source* frame row lies inside ``[0, h)`` — pad
    rows then contribute exactly zero at every conv stage, reproducing the
    full-frame kernel's border semantics per band."""
    rows = br + 2 * halo
    bhw = rows * w_img
    pos = np.arange(bhw)
    col = pos % w_img
    row = pos // w_img
    masks = np.empty((n_bands, 9, bhw), np.float32)
    for b in range(n_bands):
        frame_row = b * br - halo + row
        for k, (dy, dx) in enumerate(_TAPS):
            off = dy * w_img + dx
            valid = (col + dx >= 0) & (col + dx < w_img)
            valid &= (pos + off >= 0) & (pos + off < bhw)
            valid &= (frame_row + dy >= 0) & (frame_row + dy < h)
            masks[b, k] = valid
    return masks


def _rdb_band_kernel(nf, gc, w_img, x_ref, masks_ref, *rest):
    """One (frame, band) RDB step. x_ref: (1, 1, C, BHW); masks_ref:
    (1, 9, BHW) band-specific validity planes; rest = 5 weights + 5 biases
    then out_ref."""
    out_ref = rest[-1]
    ws, bs = rest[:5], rest[5:10]
    bounds = np.cumsum([gc, gc, gc, gc, nf])
    out, _ = _rdb_fwd_block(
        x_ref[0, 0], ws, bs, masks_ref[0], w_img, bounds
    )
    out_ref[0, 0] = out


def rrdb_trunk_pallas_banded(
    x_nhwc: jnp.ndarray,
    rrdbnet_params: dict,
    nb: int,
    nf: int = 64,
    gc: int = 32,
    interpret: bool = False,
    band_rows: int = 0,
) -> jnp.ndarray:
    """Banded-grid trunk for spatial sizes past the full-frame kernel.

    The full-frame kernel needs the whole (C, HW) frame VMEM-resident; at
    512² inputs (trunk HW=16384) that overflows and r2 fell back to the
    XLA trunk — measured at ~25% MXU (HBM-bound conv round-trips,
    BENCH_NOTES). Here each *RDB* (5 convs -> 5-row halo) runs as its own
    kernel over a (frame, band) grid: bands of ``br`` interior rows plus a
    5-row halo each side are sliced out of the (zero-padded) frame, the
    kernel computes the whole RDB in VMEM, and only the interior rows are
    kept — halo recompute costs ``(br+10)/br`` extra FLOPs (~1.3x at
    br=30) but every conv stays VMEM-resident. Band tap masks add a
    frame-row validity term so pad rows contribute exact zeros at every
    stage (the full-frame kernel's border semantics, per band). RDB and
    RRDB residuals and band assembly run in XLA (cheap elementwise /
    slicing)."""
    n, h, w, c = x_nhwc.shape
    halo = _BAND_HALO
    br = band_rows or _band_rows(nf, gc, w, jnp.dtype(x_nhwc.dtype).itemsize)
    br = min(br, h)
    n_bands = -(-h // br)
    rows = br + 2 * halo
    bhw = rows * w
    hp = n_bands * br + 2 * halo

    x = x_nhwc.reshape(n, h * w, c).transpose(0, 2, 1).reshape(n, c, h, w)
    masks = jnp.asarray(_band_tap_masks(w, br, halo, n_bands, h))
    kernel = functools.partial(_rdb_band_kernel, nf, gc, w)

    def rdb_apply(x_chw_img, rdb_params):
        """(N, C, H, W) -> (N, C, H, W) through one banded RDB."""
        ws_, bs_ = _split_rdb_weights(rdb_params, nf, gc)
        wb = [a.astype(x_nhwc.dtype) for a in ws_] + [
            b.astype(jnp.float32) for b in bs_
        ]
        pad = jnp.pad(
            x_chw_img, ((0, 0), (0, 0), (halo, hp - halo - h), (0, 0))
        )
        bands = jnp.stack(
            [pad[:, :, b * br : b * br + rows] for b in range(n_bands)],
            axis=1,
        ).reshape(n, n_bands, c, bhw)
        out = pl.pallas_call(
            kernel,
            grid=(n, n_bands),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, c, bhw), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 9, bhw), lambda i, j: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
            out_specs=pl.BlockSpec(
                (1, 1, c, bhw), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n, n_bands, c, bhw), x_nhwc.dtype),
            interpret=interpret,
        )(bands, masks, *wb)
        interior = out[..., halo * w : (halo + br) * w]  # (N, NB, C, br*W)
        full = interior.transpose(0, 2, 1, 3).reshape(n, c, n_bands * br, w)
        return full[:, :, :h]

    for i in range(nb):
        blk = rrdbnet_params[f"rrdb_{i}"]
        y = x
        for j in (1, 2, 3):
            y = rdb_apply(y, blk[f"rdb{j}"])
        x = (0.2 * y.astype(jnp.float32) + x.astype(jnp.float32)).astype(
            x_nhwc.dtype
        )
    return x.reshape(n, c, h * w).transpose(0, 2, 1).reshape(n, h, w, c)


def rrdb_bwd_pallas(
    x_chw: jnp.ndarray,
    g_chw: jnp.ndarray,
    rrdb_params: dict,
    nf: int,
    gc: int,
    w_img: int,
    interpret: bool = False,
):
    """Backward of one RRDB via the fused kernel.

    x_chw: ``(N, C, HW)`` RRDB input (saved from the forward); g_chw: the
    output cotangent, same shape. Returns ``(dx (N, C, HW), dparams)`` with
    ``dparams`` in the flax RRDB structure (rdb{j}/conv{k}_kernel/bias).
    Weight/bias grads are emitted per frame and summed outside the kernel
    (in-kernel f32 accumulators would evict the backward's working set
    from VMEM at the production HW=4096).
    """
    n, c, hw = x_chw.shape
    wb = _rrdb_tap_weights(rrdb_params, nf, gc, x_chw.dtype) + _rrdb_adj_weights(
        rrdb_params, nf, gc, x_chw.dtype
    )
    masks = jnp.asarray(_tap_masks(w_img, hw))
    kernel = functools.partial(_rrdb_bwd_kernel, nf, gc, w_img)

    outs = [gc, gc, gc, gc, nf]
    c_of = [nf, gc, gc, gc, gc]
    out_of = [sum(outs[s:]) for s in range(5)]  # OUT_s per source
    dw_shapes = [
        jax.ShapeDtypeStruct((n, out_of[s], 9 * c_of[s]), jnp.float32)
        for _ in range(3)
        for s in range(5)
    ]
    db_shapes = [
        jax.ShapeDtypeStruct((n, outs[t], 1), jnp.float32)
        for _ in range(3)
        for t in range(5)
    ]
    frame_spec = pl.BlockSpec(
        (1, c, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    per_frame_specs = [
        pl.BlockSpec(
            (1,) + s.shape[1:], lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        for s in dw_shapes + db_shapes
    ]
    dx, *dwb = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[frame_spec, frame_spec, whole] + [whole] * len(wb),
        out_specs=[frame_spec] + per_frame_specs,
        out_shape=[jax.ShapeDtypeStruct((n, c, hw), x_chw.dtype)]
        + dw_shapes
        + db_shapes,
        # The fully-unrolled reverse sweep's stack exceeds the 16 MB
        # default *scoped* window; v5e VMEM is far larger and the extra
        # room costs nothing here (compute-dense, single-frame blocks).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_chw, g_chw, masks, *wb)
    dws = [v.sum(axis=0) for v in dwb[:15]]
    dbs = [v.sum(axis=0) for v in dwb[15:]]
    dparams = {}
    for j in range(3):
        dparams[f"rdb{j + 1}"] = _unsplit_rdb_weights(
            dws[j * 5 : j * 5 + 5], dbs[j * 5 : j * 5 + 5], nf, gc
        )
    return dx, dparams


def _unsplit_rdb_weights(dws, dbs, nf: int, gc: int) -> dict:
    """Inverse of :func:`_split_rdb_weights`: per-source tap-stacked weight
    grads ``(OUT_s, 9*C_s)`` -> flax conv{k}_kernel/bias grads."""
    outs = [gc, gc, gc, gc, nf]
    widths = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
    c_of = [nf, gc, gc, gc, gc]
    grads = {}
    pieces = {t: [] for t in range(5)}  # conv t's per-source kernel slices
    for s in range(5):
        d = dws[s]  # (OUT_s, 9C_s)
        d = d.reshape(d.shape[0], 9, c_of[s]).transpose(1, 2, 0)
        d = d.reshape(3, 3, c_of[s], d.shape[-1])  # (3,3,C_s,OUT_s)
        lo = 0
        for t in range(s if s else 0, 5):
            if t < s:  # pragma: no cover - loop starts at s
                continue
            seg = d[..., lo : lo + outs[t]]
            pieces[t].append(seg)
            lo += outs[t]
    for t in range(5):
        # Sources 0..t stack along the kernel's input-channel axis in
        # order (x, x1..x_t) — exactly the forward's channel layout.
        grads[f"conv{t + 1}_kernel"] = jnp.concatenate(pieces[t][: t + 1], axis=2)
        grads[f"conv{t + 1}_bias"] = dbs[t].reshape(-1)
    return grads


def pallas_bwd_fits(nf: int, gc: int, hw: int, itemsize: int = 2) -> bool:
    """Whether the backward kernel's working set fits its raised VMEM
    window (``rrdb_bwd_pallas`` requests ``vmem_limit_bytes=100MB``).

    The dominant live set per lane: the 9-tap stacks (dP adjoint stack
    9*nf f32 during source grads; widest source stack 9*nf during weight
    grads), the dsrc accumulators and z planes (f32, nf+4gc rows), the
    stored dP cotangents, recomputed hidden activations, and the x/g/dx
    frame blocks — plus Mosaic's own stack/double-buffering overhead,
    which the measured footprint shows is ~2x the naive sum. Empirical
    anchor (v5e): HW=4096 (the production 256² train shape) compiles and
    runs inside the 100MB window; HW=1024 OOM'd at the default 16MB
    scoped window. The per-lane constant is calibrated to admit HW=4096
    (~70MB estimated) and reject HW >= 8192 (512²+ training falls back
    to the XLA-remat backward).
    """
    per_lane = 17 << 10  # measured-footprint calibration, see docstring
    fixed = 6 << 20  # adjoint + tap weights, per-frame dW/db blocks
    return per_lane * hw + fixed <= 88 << 20


def make_hybrid_trunk(
    nb: int,
    nf: int = 64,
    gc: int = 32,
    dtype=jnp.bfloat16,
    use_pallas: bool = True,
    interpret: bool = False,
    pallas_bwd: bool = True,
):
    """Differentiable trunk: fused Pallas forward AND backward.

    Returns ``trunk(x_nhwc, trunk_params) -> (N, H, W, nf)`` wrapped in a
    ``jax.custom_vjp``:

    - **forward**: the fused Pallas kernel (:func:`rrdb_trunk_pallas`) when
      the per-frame working set fits VMEM, else the regrouped XLA
      formulation. When never differentiated (serving), this is exactly the
      old forward — the custom-vjp wrapper adds nothing to the trace.
    - **backward**: the fused backward kernel (:func:`rrdb_bwd_pallas`) —
      per-RRDB reverse sweep over the saved per-block inputs, hidden
      activations recomputed in VMEM, weight grads accumulated across the
      frame grid — when both kernels fit; otherwise the rematerialized VJP
      of :func:`rrdb_trunk_xla` from the saved ``(x, params)`` residuals
      (exact gradient of the XLA formulation at the same primal point).

    Training the thesis (2000 iters x 100 epochs, reference data.py:364)
    is the dominant compute; the XLA trunk measures ~28% MXU (HBM-bound 15
    conv round-trips) while the fused kernels run VMEM-resident.
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
        if use_pallas and pallas_trunk_fits_big(nf, gc, h * w, itemsize):
            # Large spatial sizes (512² inputs): the full-frame kernel under
            # a raised 100 MB VMEM window beats the banded per-RDB grid —
            # r4 on-chip A/B at N=16 @128² nb=20: 62.2 ms (121 TFLOP/s) vs
            # banded 110.9 (68) vs XLA 150.8 (BENCH_NOTES r4 table).
            return rrdb_trunk_pallas(
                x.astype(dtype), params, nb=nb, nf=nf, gc=gc,
                interpret=interpret, big_vmem=True,
            )
        if use_pallas and banded_trunk_fits(nf, gc, w, itemsize):
            # Past even the raised window: per-RDB banded kernel grid.
            return rrdb_trunk_pallas_banded(
                x.astype(dtype), params, nb=nb, nf=nf, gc=gc, interpret=interpret
            )
        return xla_fn(x, params)

    @jax.custom_vjp
    def trunk(x, params):
        return _impl(x, params)

    def fwd(x, params):
        n, h, w, c = x.shape
        hw = h * w
        kernel_ok = use_pallas and (
            interpret or pallas_trunk_fits(nf, gc, hw, itemsize)
        )
        bwd_ok = kernel_ok and pallas_bwd and (
            interpret or pallas_bwd_fits(nf, gc, hw, itemsize)
        )
        if not bwd_ok:
            return _impl(x, params), (x, params, None)
        xc = x.astype(dtype).reshape(n, hw, c).transpose(0, 2, 1)
        inters = [xc]
        for i in range(nb):
            xc = rrdb_pallas(
                xc, params[f"rrdb_{i}"], nf, gc, w, interpret=interpret
            )
            inters.append(xc)
        out = inters[-1].transpose(0, 2, 1).reshape(n, h, w, c)
        return out, (x, params, tuple(inters[:-1]))

    def bwd(res, g):
        x, params, inters = res
        if inters is None:
            _, vjp = jax.vjp(xla_fn, x, params)
            return vjp(g)
        n, h, w, c = x.shape
        gc_chw = g.astype(dtype).reshape(n, h * w, c).transpose(0, 2, 1)
        dparams = {}
        for i in reversed(range(nb)):
            gc_chw, dp = rrdb_bwd_pallas(
                inters[i], gc_chw, params[f"rrdb_{i}"], nf, gc, w,
                interpret=interpret,
            )
            dparams[f"rrdb_{i}"] = dp
        dx = gc_chw.transpose(0, 2, 1).reshape(n, h, w, c).astype(x.dtype)
        return dx, dparams

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

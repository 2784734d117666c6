"""Fused Pallas kernel for the DFPN separable 4-D conv (serving path).

The reference SeparableConv4d (model_dfpn.py:586-626) runs two 3-conv 2-D
stacks over the cost volume's two 16x16 sub-spaces: stage 1 convolves
q-space with batch (b, f, p), stage 2 convolves p-space with batch
(b, f, q). At config-4 serving shapes that is ~4.6 TFLOP (bf16) spread
over 5120 *tiny* 16x16 images — a shape XLA's conv tiling runs far below
MXU peak on, with 6 full HBM round-trips of the ~670 MB hidden tensor.

This kernel fuses each stage's 3 convs in VMEM over blocks of G tiles:
activations live as ``(C, hw)`` per tile (channels on sublanes, the tile's
flattened 256 pixels on lanes), a 3x3 tap is a lane roll + mask (the RRDB
trunk's trick, ops/pallas_rrdb.py), and taps stack along the contraction
axis in 3-tap groups so every matmul has K = 3*C_in — full MXU depth. One
HBM read and one write per stage instead of six of each.

The p<->q swap between stages stays in XLA (one transpose of the hidden
tensor — inherent to the separable formulation).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from master_thesis_tpu.ops.pallas_rrdb import _tap_masks


def _conv_tap_weight(kernel: jnp.ndarray, dtype) -> jnp.ndarray:
    """(k, k, Cin, Cout) conv kernel -> (Cout, k²*Cin) tap-major matrix.

    Column layout ``t*Cin + c`` (tap-major, dy-major tap order) matches
    the kernel's stacked tap operand, so 3-tap groups slice contiguous
    columns.
    """
    kh, kw, cin, cout = kernel.shape
    w = kernel.reshape(kh * kw, cin, cout)
    return w.transpose(2, 0, 1).reshape(cout, kh * kw * cin).astype(dtype)


def _tap_masks_r(w_img: int, hw: int, r: int) -> np.ndarray:
    """((2r+1)², hw) f32 validity planes for radius-``r`` taps over a flat
    ``hw = h*w_img`` tile (generalizes pallas_rrdb._tap_masks to 5x5+)."""
    pos = np.arange(hw)
    col = pos % w_img
    n = 2 * r + 1
    masks = np.empty((n * n, hw), np.float32)
    for i, dy in enumerate(range(-r, r + 1)):
        for j, dx in enumerate(range(-r, r + 1)):
            off = dy * w_img + dx
            valid = (col + dx >= 0) & (col + dx < w_img)
            valid &= (pos + off >= 0) & (pos + off < hw)
            masks[i * n + j] = valid
    return masks


def _tap_group(cin: int, ksize: int) -> int:
    """Taps stacked per matmul: K = group*Cin. Wide inputs keep the
    3-tap groups (K = 384 at Cin=128); thin inputs (e.g. the flow
    estimator's 10-channel c0, the sep4d stage-1 single channel) fold
    MORE taps so the MXU contraction depth stays near-full instead of
    ~Cin/128 — bounded by the scratch the stack kernels allocate
    (3*cmax rows, cmax >= Cout >= 128 in every caller)."""
    return max(3, min(ksize * ksize, 384 // max(cin, 1)))


def _accum_taps_tile(
    src, w_flat, masks_ref, w_img, ksize=3, mask_r=1, scratch_ref=None
):
    """(Cout, hw) f32 = ``ksize``² conv of one ``(Cin, hw)`` tile via
    tap groups (K = group*Cin per matmul — full MXU contraction depth;
    see :func:`_tap_group`).

    ``masks_ref`` holds radius-``mask_r`` validity planes (dy-major); the
    conv's own radius may be smaller. Rolls run in f32 (Mosaic's rotate is
    32-bit only); each group's stack is cast to the weights' dtype at its
    matmul. The center tap needs no mask.

    ``scratch_ref``: optional ``(>=group*Cin, hw)`` f32 VMEM scratch. When
    given, each group's taps are stored to it and read back instead of
    ``jnp.concatenate``-d: a roll lowers to a *lazily offset* vector
    layout, and Mosaic cannot concatenate operands whose lane offsets
    differ when ``hw`` isn't register-aligned ("result/input offset
    mismatch on non-concat dimension" on real silicon at e.g. hw=1216);
    the store/load round-trip forces a normalized layout.
    """
    cin, hw = src.shape
    r = ksize // 2
    n_m = 2 * mask_r + 1
    taps_all = [
        (dy, dx)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    ]
    src_f32 = src.astype(jnp.float32)
    prec = (
        jax.lax.Precision.HIGHEST if w_flat.dtype == jnp.float32 else None
    )
    gt = _tap_group(cin, ksize)
    acc = None
    for g0 in range(0, len(taps_all), gt):
        group = taps_all[g0 : g0 + gt]
        taps = []
        for dy, dx in group:
            off = dy * w_img + dx
            if off == 0:
                taps.append(src_f32)
                continue
            k_m = (dy + mask_r) * n_m + (dx + mask_r)
            shifted = pltpu.roll(src_f32, (-off) % hw, 1)
            taps.append(shifted * masks_ref[k_m : k_m + 1, :])
        if scratch_ref is None:
            stacked = jnp.concatenate(taps, axis=0).astype(w_flat.dtype)
        else:
            for t_i, tap in enumerate(taps):
                scratch_ref[t_i * cin : (t_i + 1) * cin, :] = tap
            stacked = scratch_ref[: len(taps) * cin, :].astype(w_flat.dtype)
        wg = w_flat[:, g0 * cin : (g0 + len(group)) * cin]
        z = jax.lax.dot(
            wg, stacked, preferred_element_type=jnp.float32, precision=prec
        )
        acc = z if acc is None else acc + z
    return acc


def _conv_stack_kernel(w_img, mask_r, spec, x_ref, masks_ref, *rest):
    """Conv stack over a block of G tiles.

    x_ref: ``(G, Cin, hw)``; masks_ref: ``((2*mask_r+1)², hw)`` in-tile
    tap validity; spec: per conv ``(ksize, relu)``; rest = (W1, b1, W2,
    b2, ..., out_ref) with W in tap-major ``(Cout, k²*Cin)`` layout and
    biases ``(Cout, 1)`` f32.
    """
    out_ref = rest[-1]
    wb = rest[:-1]
    g = x_ref.shape[0]
    for t in range(g):
        x = x_ref[t]
        for i, (ksize, relu) in enumerate(spec):
            w, b = wb[2 * i], wb[2 * i + 1]
            acc = (
                _accum_taps_tile(x, w[:], masks_ref, w_img, ksize, mask_r)
                + b[:]
            )
            if relu:
                acc = jnp.maximum(acc, 0.0)
            x = acc.astype(x_ref.dtype)
        out_ref[t] = x.astype(out_ref.dtype)


def conv_stack_tiles(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    relus: Sequence[bool],
    *,
    tile_side: int,
    grid_tiles: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stack of odd-size same-pad convs over flat tiles.

    Args:
        x: ``(NT, Cin, hw)`` — NT independent ``tile_side``² tiles in
            channel-major layout (``hw = tile_side**2`` flattened pixels).
        kernels/biases: per conv, ``(k, k, Cin_i, Cout_i)`` (odd ``k``)
            and ``(Cout_i,)`` (flax Conv layout).
        relus: per conv, apply ReLU after bias.

    Returns ``(NT, Cout_last, hw)`` in ``x.dtype``.
    """
    nt, cin, hw = x.shape
    assert hw == tile_side * tile_side
    g = grid_tiles
    while nt % g:
        g //= 2
    spec = tuple((k.shape[0], r) for k, r in zip(kernels, relus))
    mask_r = max(k.shape[0] for k in kernels) // 2
    wb = []
    for k, b in zip(kernels, biases):
        wb.append(_conv_tap_weight(k, x.dtype))
        wb.append(b.reshape(-1, 1).astype(jnp.float32))
    masks = jnp.asarray(_tap_masks_r(tile_side, hw, mask_r))
    cout = kernels[-1].shape[-1]
    kernel = functools.partial(_conv_stack_kernel, tile_side, mask_r, spec)
    return pl.pallas_call(
        kernel,
        grid=(nt // g,),
        in_specs=[
            pl.BlockSpec(
                (g, cin, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wb),
        out_specs=pl.BlockSpec(
            (g, cout, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nt, cout, hw), x.dtype),
        interpret=interpret,
    )(x, masks, *wb)


# Backward-compat alias (3x3-only callers).
conv3x3_stack_tiles = conv_stack_tiles


def _band_tap_masks_r(
    w_img: int, br: int, halo: int, n_bands: int, h: int, r: int
) -> np.ndarray:
    """(n_bands, (2r+1)², bhw) radius-``r`` validity planes for row bands
    of a ``h x w_img`` image: in-band flat validity plus the frame-row
    term (band ``b``'s row ``i`` holds frame row ``b*br - halo + i``), so
    pad rows contribute exact zeros at every conv stage."""
    rows = br + 2 * halo
    bhw = rows * w_img
    pos = np.arange(bhw)
    col = pos % w_img
    row = pos // w_img
    n = 2 * r + 1
    masks = np.empty((n_bands, n * n, bhw), np.float32)
    for b in range(n_bands):
        frame_row = b * br - halo + row
        for i, dy in enumerate(range(-r, r + 1)):
            for j, dx in enumerate(range(-r, r + 1)):
                off = dy * w_img + dx
                valid = (col + dx >= 0) & (col + dx < w_img)
                valid &= (pos + off >= 0) & (pos + off < bhw)
                valid &= (frame_row + dy >= 0) & (frame_row + dy < h)
                masks[b, i * n + j] = valid
    return masks


def _conv_stack_band_kernel(w_img, mask_r, spec, x_ref, masks_ref, *rest):
    """One (image, band) step of a banded conv stack. x_ref: (1, 1, Cin,
    BHW); masks_ref: (1, (2*mask_r+1)², BHW) band-specific planes; the
    trailing ref is the tap-group VMEM scratch (see _accum_taps_tile)."""
    out_ref, scratch_ref = rest[-2], rest[-1]
    wb = rest[:-2]
    x = x_ref[0, 0]
    masks = masks_ref[0]
    for i, (ksize, relu) in enumerate(spec):
        w, b = wb[2 * i], wb[2 * i + 1]
        acc = (
            _accum_taps_tile(
                x, w[:], masks, w_img, ksize, mask_r, scratch_ref
            )
            + b[:]
        )
        if relu:
            acc = jnp.maximum(acc, 0.0)
        x = acc.astype(x_ref.dtype)
    out_ref[0, 0] = x.astype(out_ref.dtype)


def _stack_band_rows(cmax: int, w_img: int, itemsize: int = 2) -> int:
    """Interior band height keeping the stack's working set (input +
    f32 accumulator + 3-tap group stack + f32 tap scratch + output,
    widest conv) inside the VMEM window."""
    per_lane = 8 * cmax * itemsize + 4 * cmax + 12 * cmax
    lanes = (64 << 20) // per_lane
    return max(lanes // w_img, 1)


def conv_stack_banded(
    x: jnp.ndarray,
    kernels: Sequence[jnp.ndarray],
    biases: Sequence[jnp.ndarray],
    relus: Sequence[bool],
    *,
    band_rows: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused stack of odd-size same-pad convs over full-size NHWC images,
    processed in row bands with ``halo = sum of radii`` per side — the
    tile-stack kernel's big-image sibling (one HBM read and one write for
    the whole stack instead of one per conv).

    x: ``(N, H, W, Cin)`` -> ``(N, H, W, Cout_last)`` in ``x.dtype``.
    """
    n, h, w, cin = x.shape
    radii = [k.shape[0] // 2 for k in kernels]
    halo = sum(radii)
    mask_r = max(radii)
    spec = tuple((k.shape[0], r) for k, r in zip(kernels, relus))
    cmax = max([cin] + [k.shape[-1] for k in kernels])
    scratch_rows = max(
        [3 * cmax]
        + [_tap_group(k.shape[2], k.shape[0]) * k.shape[2] for k in kernels]
    )
    br = band_rows or (_stack_band_rows(cmax, w) - 2 * halo)
    br = max(min(br, h), 1)
    n_bands = -(-h // br)
    rows = br + 2 * halo
    bhw = rows * w
    hp = n_bands * br + 2 * halo

    wb = []
    for k, b in zip(kernels, biases):
        wb.append(_conv_tap_weight(k, x.dtype))
        wb.append(b.reshape(-1, 1).astype(jnp.float32))
    xc = x.transpose(0, 3, 1, 2)  # (N, C, H, W)
    pad = jnp.pad(xc, ((0, 0), (0, 0), (halo, hp - halo - h), (0, 0)))
    bands = jnp.stack(
        [pad[:, :, b * br : b * br + rows] for b in range(n_bands)], axis=1
    ).reshape(n, n_bands, cin, bhw)
    masks = jnp.asarray(_band_tap_masks_r(w, br, halo, n_bands, h, mask_r))
    cout = kernels[-1].shape[-1]
    kernel = functools.partial(_conv_stack_band_kernel, w, mask_r, spec)
    out = pl.pallas_call(
        kernel,
        grid=(n, n_bands),
        in_specs=[
            pl.BlockSpec(
                (1, 1, cin, bhw), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, masks.shape[1], bhw), lambda i, j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(wb),
        out_specs=pl.BlockSpec(
            (1, 1, cout, bhw), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, n_bands, cout, bhw), x.dtype),
        scratch_shapes=[pltpu.VMEM((scratch_rows, bhw), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(bands, masks, *wb)
    interior = out[..., halo * w : (halo + br) * w]
    full = interior.transpose(0, 2, 1, 3).reshape(n, cout, n_bands * br, w)
    return full[:, :, :h].transpose(0, 2, 3, 1)


def sep4d_apply_pallas(
    params: dict,
    corr: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    grid_tiles: int = 8,
) -> jnp.ndarray:
    """SeparableConv4d forward on the fused kernel (serving path).

    ``params``: the flax module's param subtree (conv1_0..conv2_2).
    ``corr``: ``(B, F, cs, cs, cs, cs)`` cost volume. Matches
    ``SeparableConv4d.__call__`` (models/dfpn.py) — stage 1 over q-space
    with (b, f, p) batched as tiles, transpose, stage 2 over p-space.
    """
    b, f, h, w = corr.shape[:4]
    hw = h * w
    k = lambda n: params[n]["kernel"]
    bi = lambda n: params[n]["bias"]

    # Stage 1: tiles are q-images, one per (b, f, p); channel dim 1.
    x = corr.reshape(b * f * hw, 1, hw).astype(dtype)
    y = conv3x3_stack_tiles(
        x,
        [k("conv1_0"), k("conv1_1"), k("conv1_2")],
        [bi("conv1_0"), bi("conv1_1"), bi("conv1_2")],
        [True, True, False],
        tile_side=h,
        grid_tiles=grid_tiles,
        interpret=interpret,
    )  # (b*f*p, 256, q)

    # p <-> q swap (the reference's permute, model_dfpn.py:607-611).
    c1 = y.shape[1]
    y = y.reshape(b * f, hw, c1, hw).transpose(0, 3, 2, 1)
    y = y.reshape(b * f * hw, c1, hw)  # tiles are p-images, one per (b,f,q)

    y = conv3x3_stack_tiles(
        y,
        [k("conv2_0"), k("conv2_1"), k("conv2_2")],
        [bi("conv2_0"), bi("conv2_1"), bi("conv2_2")],
        [True, True, False],
        tile_side=h,
        grid_tiles=grid_tiles,
        interpret=interpret,
    )  # (b*f*q, 1, p)

    # (b, f, q, p_h, p_w) -> (b, f, p_h, p_w, q_h, q_w).
    out = y.reshape(b * f, hw, hw).transpose(0, 2, 1)
    return out.reshape(b, f, h, w, h, w)


def mixer_apply_pallas(
    params: dict,
    corr: jnp.ndarray,
    corr_size: int = 16,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """AlignmentCorrelationMixer forward on the fused kernel.

    The mixer (models/dfpn.py, reference model_dfpn.py:629-674) is 14
    convs (5x5/3x3 mix, channels 256 -> ... -> 2) over (B·F) tiny
    ``cs``x``cs`` images — the same XLA-hostile shape class as the
    separable 4-D conv. One fused kernel, tiles = (b, f) pairs with
    p-space as channels (the flax module's own layout, so the input needs
    NO transpose: ``corr.reshape(b*f, cs², cs²)`` is already
    channel-major).
    """
    b, f = corr.shape[:2]
    cs = corr_size
    hw = cs * cs
    x = corr.reshape(b * f, cs * cs, hw).astype(dtype)

    schedule = [
        (cs**2, 5, True), (cs**2, 3, True), (cs, 3, True),
        (cs, 5, True), (cs, 3, True), (cs // 2, 3, True),
        (cs // 2, 5, True), (cs // 2, 3, True), (cs // 4, 3, True),
        (cs // 4, 5, True), (cs // 4, 3, True), (2, 3, False),
        (2, 5, False), (2, 3, False),
    ]
    kernels = [params[f"mixer_{i}"]["kernel"] for i in range(len(schedule))]
    biases = [params[f"mixer_{i}"]["bias"] for i in range(len(schedule))]
    relus = [r for (_, _, r) in schedule]
    y = conv_stack_tiles(
        x, kernels, biases, relus, tile_side=cs, grid_tiles=8,
        interpret=interpret,
    )  # (b*f, 2, hw)
    return y.reshape(b, f, 2, cs, cs).transpose(0, 1, 3, 4, 2)

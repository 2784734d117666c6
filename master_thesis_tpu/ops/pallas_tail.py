"""Fused Pallas kernel for the RRDBNet tail (serving path).

The tail (reference model_chn.py:538-555) is two nearest-2x-upsample+conv
stages, an HR conv and the 3-channel output conv. Its FLOPs are tiny
(~11 GFLOP/frame at 256²) but the XLA formulation is layout-bound: every
stage round-trips the growing 128²/256² activations through HBM with a
pixel-shuffle transpose between, measured ~8 TFLOP/s effective.

This kernel computes the WHOLE tail for one frame in VMEM **in phase
space**: nothing is ever materialized at 128²/256². The identity is the
standard subpixel-conv commutation: with the fused 4-phase upsample
kernels (models/nn_ext.py:fused_upsample_conv_kernel, phases packed into
channels), a 3x3 conv at an upsampled resolution decomposes per output
phase ``q`` into 9 taps, each reading ONE input phase at a low-res offset
in {-1,0,1}²:

  ``out_q[Y] = sum_k W[k] * in_{phase(q,k)}[Y + off(q,k)]``

so every stage is a tap-stacked MXU matmul over (C, HW64) planes — the
RRDB trunk's lane-roll trick — with the phase bookkeeping resolved at
trace time. The final 4x4-phase interleave to (256², 3) happens once in
XLA (pixel_unshuffle in reverse, ~3 MB/frame).

Stages (nf=64 channels, working dtype bf16 in production):
  A: fused upconv1 (9 taps of the input, 4nf out = 2x2 phases) + lrelu
  B: upconv2 as a 3x3 conv at 128²: per 2x2 sub-phase, 9 taps of the
     stage-A phase planes -> 4nf out -> 16 final phases + lrelu
  C: hr_conv at 256²: per final phase, 9 taps of stage-B planes + lrelu
  D: conv_last at 256²: same tap pattern, 3 output channels

Parity: exact vs rrdbnet_tail_forward (models/chn.py), tested in
interpret mode (tests/test_pallas_tail.py). Masked rolls are bit-exact in
the working dtype (a roll permutes values; the 0/1-mask product is
exactly representable), so the cross-phase rolled-plane cache stores the
working dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from master_thesis_tpu.ops.pallas_rrdb import _tap_masks
from master_thesis_tpu.ops.pallas_sep4d import _accum_taps_tile


def _lrelu(v):
    return jnp.where(v >= 0, v, 0.2 * v)


def _phase_conv(phases, pick, w_flat, bias, masks_ref, w_img, cache):
    """One output-phase conv step: 9 taps, each a (possibly rolled+masked)
    phase plane chosen by ``pick(k) -> (phase_key, oy, ox)``.

    phases: dict phase_key -> (C, HW) plane (working dtype). Rolled planes
    are cached in ``cache`` across output phases (bit-exact in the working
    dtype). Returns the f32 pre-activation (OUT, HW) incl. bias.
    """
    sample = next(iter(phases.values()))
    cin, hw = sample.shape
    prec = (
        jax.lax.Precision.HIGHEST if w_flat.dtype == jnp.float32 else None
    )
    acc = None
    for g0 in range(0, 9, 3):
        taps = []
        for k in range(g0, g0 + 3):
            key = pick(k)
            if key not in cache:
                p, oy, ox = key
                v = phases[p]
                off = oy * w_img + ox
                if off != 0:
                    k_m = (oy + 1) * 3 + (ox + 1)
                    m = masks_ref[k_m : k_m + 1, :]
                    v = (
                        pltpu.roll(v.astype(jnp.float32), (-off) % hw, 1) * m
                    ).astype(v.dtype)
                cache[key] = v
            taps.append(cache[key])
        stacked = jnp.concatenate(taps, axis=0).astype(w_flat.dtype)
        wg = w_flat[:, g0 * cin : (g0 + 3) * cin]
        z = jax.lax.dot(
            wg, stacked, preferred_element_type=jnp.float32, precision=prec
        )
        acc = z if acc is None else acc + z
    return acc + bias[:]


def _pick_fn(qy, qx, mod):
    """Tap k of a 3x3 conv at the ``mod``-upsampled grid for output phase
    (qy, qx): reads input phase ((qy+dy) % mod, (qx+dx) % mod) at low-res
    offset (floor((qy+dy)/mod), floor((qx+dx)/mod))."""

    def pick(k):
        vy, vx = qy + k // 3 - 1, qx + k % 3 - 1
        return ((vy % mod, vx % mod), vy // mod, vx // mod)

    return pick


def _tail_kernel(
    w_img, nf, x_ref, masks_ref, w1, bias1, w2, bias2, whr, bias_hr, wl,
    bias_l, out_ref,
):
    """Whole tail for one frame. x_ref: (1, nf, HW) 64²-grid input;
    out_ref: (1, 48, HW) = 16 final phases x 3 channels (phase-major)."""
    out_ref[0] = _tail_body(
        w_img, nf, x_ref[0], masks_ref, w1, bias1, w2, bias2, whr, bias_hr,
        wl, bias_l, out_ref.dtype,
    )


def _tail_body(
    w_img, nf, x, masks, w1, bias1, w2, bias2, whr, bias_hr, wl, bias_l,
    out_dtype,
):
    """Tail compute on a VMEM-resident ``(nf, HW)`` block -> (48, HW).

    ``masks`` may be a ref or a loaded (9, HW) array (banded path)."""
    dt = x.dtype
    masks_ref = masks

    # Stage A: fused upconv1 — one 9-tap conv, phases packed in channels.
    h1_full = _lrelu(
        _accum_taps_tile(x, w1[:], masks_ref, w_img) + bias1[:]
    ).astype(dt)
    h1 = {
        (a, b): h1_full[(a * 2 + b) * nf : (a * 2 + b + 1) * nf]
        for a in (0, 1)
        for b in (0, 1)
    }

    # Stage B: upconv2 as a 3x3 conv at 128², per 2x2 output sub-phase;
    # its 4nf output channels are the second shuffle's (a3, b3) phases, so
    # the final 256² phase is (2*a2 + a3, 2*b2 + b3).
    h2 = {}
    cache = {}
    for a2 in (0, 1):
        for b2 in (0, 1):
            ob = _lrelu(
                _phase_conv(
                    h1, _pick_fn(a2, b2, 2), w2[:], bias2, masks_ref,
                    w_img, cache,
                )
            ).astype(dt)
            for a3 in (0, 1):
                for b3 in (0, 1):
                    h2[(2 * a2 + a3, 2 * b2 + b3)] = ob[
                        (a3 * 2 + b3) * nf : (a3 * 2 + b3 + 1) * nf
                    ]

    # Stage C: hr_conv at 256², per final phase.
    h3 = {}
    cache = {}
    for qy in range(4):
        for qx in range(4):
            h3[(qy, qx)] = _lrelu(
                _phase_conv(
                    h2, _pick_fn(qy, qx, 4), whr[:], bias_hr, masks_ref,
                    w_img, cache,
                )
            ).astype(dt)

    # Stage D: conv_last, same tap pattern over h3.
    outs = []
    cache = {}
    for qy in range(4):
        for qx in range(4):
            outs.append(
                _phase_conv(
                    h3, _pick_fn(qy, qx, 4), wl[:], bias_l, masks_ref,
                    w_img, cache,
                )
            )
    return jnp.concatenate(outs, axis=0).astype(out_dtype)


def _tail_band_kernel(w_img, nf, x_ref, masks_ref, *rest):
    """Banded variant: one (frame, band) tail step. x_ref: (1, 1, nf,
    BHW); masks_ref: (1, 9, BHW) band-specific validity planes (frame-row
    term included, pallas_rrdb._band_tap_masks)."""
    out_ref = rest[-1]
    out_ref[0, 0] = _tail_body(
        w_img, nf, x_ref[0, 0], masks_ref[0], *rest[:-1],
        out_ref.dtype,
    )


_TAIL_HALO = 4  # one base-grid row of halo per conv stage (A, B, C, D)


def _tail_band_rows(nf: int, w_img: int, itemsize: int = 2) -> int:
    """Largest interior band height whose phase planes + transients fit
    the kernel's VMEM window (see :func:`tail_pallas_fits`)."""
    lanes = (72 << 20) // (60 * nf * itemsize)
    return max(lanes // w_img - 2 * _TAIL_HALO, 0)


def _tail_tap_weights(params: dict, nf: int, dtype):
    """Kernel weight operands: tap-major flats of the two fused 4-phase
    upsample kernels, hr_conv and conv_last, plus f32 column biases (the
    per-``o`` upconv biases tile across their 4 packed phases)."""
    from master_thesis_tpu.models.nn_ext import fused_upsample_conv_kernel
    from master_thesis_tpu.ops.pallas_sep4d import _conv_tap_weight

    def up(name):
        w = _conv_tap_weight(
            fused_upsample_conv_kernel(params[f"{name}_kernel"]), dtype
        )
        b = jnp.tile(params[f"{name}_bias"], 4).reshape(-1, 1)
        return w, b.astype(jnp.float32)

    w1, b1 = up("upconv1")
    w2, b2 = up("upconv2")
    whr = _conv_tap_weight(params["hr_conv_kernel"], dtype)
    bhr = params["hr_conv_bias"].reshape(-1, 1).astype(jnp.float32)
    wl = _conv_tap_weight(params["conv_last_kernel"], dtype)
    bl = params["conv_last_bias"].reshape(-1, 1).astype(jnp.float32)
    return [w1, b1, w2, b2, whr, bhr, wl, bl]


def rrdbnet_tail_pallas(
    params: dict,
    y: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
    band_rows: int = 0,
) -> jnp.ndarray:
    """Fused tail: ``(N, s, s, nf)`` 64²-grid input -> ``(N, 4s, 4s, 3)``.

    Matches ``rrdbnet_tail_forward`` (models/chn.py) exactly — same fused
    4-phase kernels, upsampled-conv border semantics included (the phase
    offsets' validity masks reproduce the zero pad at every resolution).
    Past the full-frame VMEM window (512² serving: s=128) the frame is
    processed in row bands with a 4-row halo per side (one per conv
    stage); band tap masks add the frame-row validity term so pad rows
    contribute exact zeros (pallas_rrdb._band_tap_masks).
    """
    n, h, w, nf = y.shape
    hw = h * w
    wb = _tail_tap_weights(params, nf, dtype)
    x = y.reshape(n, hw, nf).transpose(0, 2, 1).astype(dtype)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)

    if not band_rows and tail_pallas_fits(nf, hw):
        masks = jnp.asarray(_tap_masks(w, hw))
        kernel = functools.partial(_tail_kernel, w, nf)
        frame_in = pl.BlockSpec(
            (1, nf, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[frame_in, whole] + [whole] * len(wb),
            out_specs=pl.BlockSpec(
                (1, 48, hw), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n, 48, hw), dtype),
            compiler_params=cp,
            interpret=interpret,
        )(x, masks, *wb)
    else:
        from master_thesis_tpu.ops.pallas_rrdb import _band_tap_masks

        halo = _TAIL_HALO
        br = band_rows or _tail_band_rows(nf, w)
        br = min(br, h)
        n_bands = -(-h // br)
        rows = br + 2 * halo
        bhw = rows * w
        hp = n_bands * br + 2 * halo
        xi = x.reshape(n, nf, h, w)
        pad = jnp.pad(xi, ((0, 0), (0, 0), (halo, hp - halo - h), (0, 0)))
        bands = jnp.stack(
            [pad[:, :, b * br : b * br + rows] for b in range(n_bands)],
            axis=1,
        ).reshape(n, n_bands, nf, bhw)
        masks = jnp.asarray(_band_tap_masks(w, br, halo, n_bands, h))
        kernel = functools.partial(_tail_band_kernel, w, nf)
        bout = pl.pallas_call(
            kernel,
            grid=(n, n_bands),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, nf, bhw), lambda i, j: (i, j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 9, bhw), lambda i, j: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [whole] * len(wb),
            out_specs=pl.BlockSpec(
                (1, 1, 48, bhw), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((n, n_bands, 48, bhw), dtype),
            compiler_params=cp,
            interpret=interpret,
        )(bands, masks, *wb)
        interior = bout[..., halo * w : (halo + br) * w]
        out = interior.transpose(0, 2, 1, 3).reshape(n, 48, n_bands * br * w)
        out = out[..., : hw]

    # (N, (qy,qx,c), HW) -> (N, 4h, 4w, 3): one 4x-phase interleave.
    out = out.reshape(n, 4, 4, 3, h, w).transpose(0, 4, 1, 5, 2, 3)
    return out.reshape(n, 4 * h, 4 * w, 3)


def tail_pallas_fits(nf: int, hw: int, itemsize: int = 2) -> bool:
    """Whether the tail kernel's per-frame working set fits the raised
    VMEM window: ~52 nf-row phase planes (h1/h2/h3 + rolled cache) plus
    stack transients. Production 256² serving (tail input 64², HW=4096)
    fits; 512² serving (tail input 128²) falls back to the XLA tail."""
    per_lane = 60 * nf * itemsize
    return per_lane * hw + (4 << 20) <= 88 << 20


def make_hybrid_tail(dtype=jnp.bfloat16, use_pallas: bool = True,
                     interpret: bool = False):
    """Differentiable tail: fused Pallas forward, XLA-remat backward.

    Returns ``tail(y, tail_params) -> (N, 4s, 4s, 3)`` wrapped in a
    ``jax.custom_vjp``: forward runs :func:`rrdbnet_tail_pallas` when the
    working set fits (else the XLA formulation); backward rematerializes
    through the XLA twin (models/chn.py:rrdbnet_tail_forward) at the same
    primal point — the exact gradient of the XLA math, like the trunk's
    fallback (ops/pallas_rrdb.py:make_hybrid_trunk)."""

    def xla_fn(y, params):
        from master_thesis_tpu.models.chn import rrdbnet_tail_forward

        return rrdbnet_tail_forward(params, y, dtype)

    def _impl(y, params):
        n, h, w, nf = y.shape
        if use_pallas and (
            interpret
            or tail_pallas_fits(nf, h * w)
            or _tail_band_rows(nf, w) >= 8
        ):
            return rrdbnet_tail_pallas(params, y, dtype, interpret=interpret)
        return xla_fn(y, params)

    @jax.custom_vjp
    def tail(y, params):
        return _impl(y, params)

    def fwd(y, params):
        return _impl(y, params), (y, params)

    def bwd(res, g):
        y, params = res
        _, vjp = jax.vjp(xla_fn, y, params)
        return vjp(g)

    tail.defvjp(fwd, bwd)
    return tail

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
    out_dtype, keep_hidden=False,
):
    """Tail compute on a VMEM-resident ``(nf, HW)`` block -> (48, HW).

    ``masks`` may be a ref or a loaded (9, HW) array (banded path). With
    ``keep_hidden`` returns ``(out, h1_full, h2, h3)`` — the post-lrelu
    activations the backward needs (lrelu(x) >= 0 iff x >= 0, so their
    signs recover the pre-activation signs)."""
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
    out = jnp.concatenate(outs, axis=0).astype(out_dtype)
    if keep_hidden:
        return out, h1_full, h2, h3
    return out


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
                     interpret: bool = False, pallas_bwd: bool = True):
    """Differentiable tail: fused Pallas forward AND backward.

    Returns ``tail(y, tail_params) -> (N, 4h, 4w, 3)`` wrapped in a
    ``jax.custom_vjp``: forward runs :func:`rrdbnet_tail_pallas` when the
    working set fits (else the XLA formulation); backward runs the fused
    adjoint kernel (:func:`tail_bwd_pallas` — forward recomputed in VMEM,
    adjoint phase-convs, per-frame weight grads) when it fits, else
    rematerializes through the XLA twin (models/chn.py:
    rrdbnet_tail_forward) at the same primal point — the exact gradient of
    the XLA math, like the trunk's fallback
    (ops/pallas_rrdb.py:make_hybrid_trunk)."""

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
        n, h, w, nf = y.shape
        hw = h * w
        bwd_ok = (
            use_pallas
            and pallas_bwd
            and (
                interpret
                or (tail_pallas_fits(nf, hw) and tail_bwd_fits(nf, hw))
            )
        )
        if not bwd_ok:
            _, vjp = jax.vjp(xla_fn, y, params)
            return vjp(g)
        # Adjoint of the forward's final 4x-phase interleave.
        gp = g.astype(dtype).reshape(n, h, 4, w, 4, 3)
        gp = gp.transpose(0, 2, 4, 5, 1, 3).reshape(n, 48, hw)
        xc = y.reshape(n, hw, nf).transpose(0, 2, 1).astype(dtype)
        dx, dparams = tail_bwd_pallas(
            xc, gp, params, nf, w, dtype, interpret=interpret
        )
        dx = dx.transpose(0, 2, 1).reshape(n, h, w, nf).astype(y.dtype)
        dparams = jax.tree_util.tree_map(
            lambda a, b: a.astype(b.dtype), dparams, params
        )
        return dx, dparams

    tail.defvjp(fwd, bwd)
    return tail


# ---------------------------------------------------------------------------
# Fused tail backward: the adjoint of each phase-space stage is itself a
# phase-structured conv (the trunk backward's flipped-conv trick): for input
# phase p, tap k, the output phase that read p was q = (p - d) mod m at the
# forward offset, so dIn[p] is ONE (Cin, 9*OUT) stacked matmul over rolled
# cotangent planes. Weight grads are K=HW matmuls against the recomputed
# forward tap stacks; per-frame dW/db blocks are summed outside the kernel.
# ---------------------------------------------------------------------------


def _adj_pick_fn(py, px, mod):
    """Adjoint tap k for input phase (py, px): the output phase that read
    this phase via tap k in the forward, plus the forward offset."""

    def pick(k):
        dy, dx = k // 3 - 1, k % 3 - 1
        qy, qx = (py - dy) % mod, (px - dx) % mod
        return ((qy, qx), (qy + dy) // mod, (qx + dx) // mod)

    return pick


def _fwd_tap(planes, key, masks_ref, w_img, cache):
    """Forward tap operand: roll(plane, -off) masked at the destination
    (what the forward's matmul consumed) — cached per (plane, off)."""
    if key not in cache:
        p, oy, ox = key
        v = planes[p]
        off = oy * w_img + ox
        if off != 0:
            hw = v.shape[-1]
            k_m = (oy + 1) * 3 + (ox + 1)
            v = (
                pltpu.roll(v.astype(jnp.float32), (-off) % hw, 1)
                * masks_ref[k_m : k_m + 1, :]
            ).astype(v.dtype)
        cache[key] = v
    return cache[key]


def _adj_tap(dps, key, masks_ref, w_img, cache):
    """Adjoint tap operand: roll(mask * dP_q, +off) — the transpose of
    :func:`_fwd_tap`'s mask-at-destination roll."""
    if key not in cache:
        q, oy, ox = key
        v = dps[q]
        off = oy * w_img + ox
        if off != 0:
            hw = v.shape[-1]
            k_m = (oy + 1) * 3 + (ox + 1)
            v = pltpu.roll(
                v.astype(jnp.float32) * masks_ref[k_m : k_m + 1, :],
                off % hw, 1,
            ).astype(v.dtype)
        cache[key] = v
    return cache[key]


def _stacked_matmul(tap_fn, keys, operands_rows, a_flat, prec):
    """3-tap-group stacked matmuls: sum_g A[:, g] @ concat(taps_g)."""
    acc = None
    for g0 in range(0, 9, 3):
        taps = [tap_fn(keys[k]) for k in range(g0, g0 + 3)]
        stacked = jnp.concatenate(taps, axis=0).astype(a_flat.dtype)
        wg = a_flat[:, g0 * operands_rows : (g0 + 3) * operands_rows]
        z = jax.lax.dot(
            wg, stacked, preferred_element_type=jnp.float32, precision=prec
        )
        acc = z if acc is None else acc + z
    return acc


def _dw_cols(dp, tap_fn, keys):
    """dW flat (OUT, 9*Cin): per 3-tap group, dp @ stacked_src^T."""
    cols = []
    for g0 in range(0, 9, 3):
        taps = [tap_fn(keys[k]) for k in range(g0, g0 + 3)]
        stacked = jnp.concatenate(taps, axis=0).astype(dp.dtype)
        cols.append(
            jax.lax.dot_general(
                dp, stacked, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    return jnp.concatenate(cols, axis=1)


def _tail_bwd_kernel(
    w_img, nf, x_ref, g_ref, masks_ref, w1, bias1, w2, bias2, whr, bias_hr,
    wl, bias_l, a1, a2, ahr, al, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    dwhr_ref, dbhr_ref, dwl_ref, dbl_ref,
):
    """Backward of the whole tail for one frame.

    x_ref: (1, nf, HW) tail input; g_ref: (1, 48, HW) phase-major output
    cotangent. Forward activations are recomputed in VMEM; lrelu masks
    come from the post-activation signs (lrelu(x) >= 0 iff x >= 0).
    a*: adjoint matrices (Cin, 9*OUT) of each stage's tap-major flat.
    """
    x = x_ref[0]
    dt = x_ref.dtype
    prec = jax.lax.Precision.HIGHEST if dt == jnp.float32 else None
    _, h1_full, h2, h3 = _tail_body(
        w_img, nf, x, masks_ref, w1, bias1, w2, bias2, whr, bias_hr, wl,
        bias_l, dt, keep_hidden=True,
    )
    h1 = {
        (a, b): h1_full[(a * 2 + b) * nf : (a * 2 + b + 1) * nf]
        for a in (0, 1)
        for b in (0, 1)
    }
    g = g_ref[0]

    # ---- Stage D adjoint (conv_last, 16 final phases) ----
    dP_D = {}
    dbl = None
    for qy in range(4):
        for qx in range(4):
            v = g[(qy * 4 + qx) * 3 : (qy * 4 + qx) * 3 + 3].astype(
                jnp.float32
            )
            dP_D[(qy, qx)] = v.astype(dt)
            s = jnp.sum(v, axis=1, keepdims=True)
            dbl = s if dbl is None else dbl + s
    dbl_ref[0] = dbl
    cache_f = {}
    dwl = None
    for q in dP_D:
        keys = [_pick_fn(q[0], q[1], 4)(k) for k in range(9)]
        dw = _dw_cols(
            dP_D[q], lambda key: _fwd_tap(h3, key, masks_ref, w_img, cache_f),
            keys,
        )
        dwl = dw if dwl is None else dwl + dw
    dwl_ref[0] = dwl
    cache_a = {}
    dh3 = {}
    for py in range(4):
        for px in range(4):
            keys = [_adj_pick_fn(py, px, 4)(k) for k in range(9)]
            dh3[(py, px)] = _stacked_matmul(
                lambda key: _adj_tap(dP_D, key, masks_ref, w_img, cache_a),
                keys, 3, al[:], prec,
            )

    # ---- Stage C adjoint (hr_conv) ----
    dP_C = {}
    dbhr = None
    for q in dh3:
        v = jnp.where(
            h3[q].astype(jnp.float32) >= 0, dh3[q], 0.2 * dh3[q]
        )
        dP_C[q] = v.astype(dt)
        s = jnp.sum(v, axis=1, keepdims=True)
        dbhr = s if dbhr is None else dbhr + s
    dbhr_ref[0] = dbhr
    cache_f = {}
    dwhr = None
    for q in dP_C:
        keys = [_pick_fn(q[0], q[1], 4)(k) for k in range(9)]
        dw = _dw_cols(
            dP_C[q], lambda key: _fwd_tap(h2, key, masks_ref, w_img, cache_f),
            keys,
        )
        dwhr = dw if dwhr is None else dwhr + dw
    dwhr_ref[0] = dwhr
    cache_a = {}
    dh2 = {}
    for py in range(4):
        for px in range(4):
            keys = [_adj_pick_fn(py, px, 4)(k) for k in range(9)]
            dh2[(py, px)] = _stacked_matmul(
                lambda key: _adj_tap(dP_C, key, masks_ref, w_img, cache_a),
                keys, nf, ahr[:], prec,
            )

    # ---- Stage B adjoint (upconv2, 2x2 sub-phases) ----
    dP_B = {}
    db2 = None
    for s2y in (0, 1):
        for s2x in (0, 1):
            dob = jnp.concatenate(
                [
                    dh2[(2 * s2y + a3, 2 * s2x + b3)]
                    for a3 in (0, 1)
                    for b3 in (0, 1)
                ],
                axis=0,
            )
            sign = jnp.concatenate(
                [
                    h2[(2 * s2y + a3, 2 * s2x + b3)]
                    for a3 in (0, 1)
                    for b3 in (0, 1)
                ],
                axis=0,
            )
            v = jnp.where(sign.astype(jnp.float32) >= 0, dob, 0.2 * dob)
            dP_B[(s2y, s2x)] = v.astype(dt)
            s = jnp.sum(v, axis=1, keepdims=True)
            db2 = s if db2 is None else db2 + s
    db2_ref[0] = db2
    cache_f = {}
    dw2 = None
    for q in dP_B:
        keys = [_pick_fn(q[0], q[1], 2)(k) for k in range(9)]
        dw = _dw_cols(
            dP_B[q], lambda key: _fwd_tap(h1, key, masks_ref, w_img, cache_f),
            keys,
        )
        dw2 = dw if dw2 is None else dw2 + dw
    dw2_ref[0] = dw2
    cache_a = {}
    dh1 = {}
    for py in (0, 1):
        for px in (0, 1):
            keys = [_adj_pick_fn(py, px, 2)(k) for k in range(9)]
            dh1[(py, px)] = _stacked_matmul(
                lambda key: _adj_tap(dP_B, key, masks_ref, w_img, cache_a),
                keys, 4 * nf, a2[:], prec,
            )

    # ---- Stage A adjoint (fused upconv1; trivial single "phase") ----
    dh1_full = jnp.concatenate(
        [dh1[(a, b)] for a in (0, 1) for b in (0, 1)], axis=0
    )
    dpre1 = jnp.where(
        h1_full.astype(jnp.float32) >= 0, dh1_full, 0.2 * dh1_full
    )
    db1_ref[0] = jnp.sum(dpre1, axis=1, keepdims=True)
    dpre1_dt = dpre1.astype(dt)
    keys = [_pick_fn(0, 0, 1)(k) for k in range(9)]
    cache_f = {}
    dw1_ref[0] = _dw_cols(
        dpre1_dt,
        lambda key: _fwd_tap({(0, 0): x}, key, masks_ref, w_img, cache_f),
        keys,
    )
    cache_a = {}
    akeys = [_adj_pick_fn(0, 0, 1)(k) for k in range(9)]
    dx = _stacked_matmul(
        lambda key: _adj_tap({(0, 0): dpre1_dt}, key, masks_ref, w_img, cache_a),
        akeys, 4 * nf, a1[:], prec,
    )
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _adj_from_flat(w_flat: jnp.ndarray, cin: int) -> jnp.ndarray:
    """Tap-major forward flat (OUT, 9*Cin) -> adjoint matrix (Cin, 9*OUT)
    with tap-major columns (the stacked adjoint operand's layout)."""
    out_c = w_flat.shape[0]
    w = w_flat.reshape(out_c, 9, cin).transpose(2, 1, 0)
    return w.reshape(cin, 9 * out_c)


def _unflat_tap_weight(dw_flat: jnp.ndarray, cin: int) -> jnp.ndarray:
    """Inverse of pallas_sep4d._conv_tap_weight: (OUT, 9*Cin) -> HWIO."""
    out_c = dw_flat.shape[0]
    w = dw_flat.reshape(out_c, 9, cin).transpose(1, 2, 0)
    return w.reshape(3, 3, cin, out_c)


def fused_upsample_conv_kernel_adjoint(dw4: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of models/nn_ext.py:fused_upsample_conv_kernel: gradient
    w.r.t. the original (3, 3, C, O) kernel from the 4-phase kernel's
    gradient (3, 3, C, 4*O) — the transpose of its .add scatter."""
    c, o4 = dw4.shape[2], dw4.shape[3]
    o = o4 // 4
    d = dw4.reshape(3, 3, c, 2, 2, o)
    out = jnp.zeros((3, 3, c, o), dw4.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for ki in range(3):
                for kj in range(3):
                    di = (a + ki - 1) // 2
                    dj = (b + kj - 1) // 2
                    out = out.at[ki, kj].add(d[di + 1, dj + 1, :, a, b, :])
    return out


def tail_bwd_fits(nf: int, hw: int, itemsize: int = 2) -> bool:
    """Whether the backward's working set (forward recompute's 36 phase
    planes + cotangent dicts + adjoint stacks + per-frame dW blocks) fits
    the VMEM window. Calibrated like the trunk backward: admits the
    production 256² train shape (tail grid HW=4096), rejects past it."""
    per_lane = 120 * nf * itemsize
    return per_lane * hw + (8 << 20) <= 88 << 20


def tail_bwd_pallas(
    x_chw: jnp.ndarray,
    g_phase: jnp.ndarray,
    params: dict,
    nf: int,
    w_img: int,
    dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Backward of the whole tail via the fused kernel.

    x_chw: ``(N, nf, HW)`` tail input (saved from the forward); g_phase:
    ``(N, 48, HW)`` phase-major output cotangent. Returns ``(dx, dparams)``
    with dparams keyed like the tail's param subset. Per-frame dW/db
    blocks are summed outside the kernel (the trunk backward's pattern).
    """
    n, _, hw = x_chw.shape
    wb = _tail_tap_weights(params, nf, dtype)
    w1, b1, w2, b2, whr, bhr, wl, bl = wb
    adj = [
        _adj_from_flat(w1, nf),        # a1: (nf, 9*4nf)
        _adj_from_flat(w2, nf),        # a2: (nf, 9*4nf)
        _adj_from_flat(whr, nf),       # ahr: (nf, 9*nf)
        _adj_from_flat(wl, nf),        # al: (nf, 9*3)
    ]
    masks = jnp.asarray(_tap_masks(w_img, hw))
    kernel = functools.partial(_tail_bwd_kernel, w_img, nf)
    frame = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_shapes = [
        jax.ShapeDtypeStruct((n, nf, hw), dtype),            # dx
        jax.ShapeDtypeStruct((n, 4 * nf, 9 * nf), jnp.float32),   # dw1
        jax.ShapeDtypeStruct((n, 4 * nf, 1), jnp.float32),        # db1
        jax.ShapeDtypeStruct((n, 4 * nf, 9 * nf), jnp.float32),   # dw2
        jax.ShapeDtypeStruct((n, 4 * nf, 1), jnp.float32),        # db2
        jax.ShapeDtypeStruct((n, nf, 9 * nf), jnp.float32),       # dwhr
        jax.ShapeDtypeStruct((n, nf, 1), jnp.float32),            # dbhr
        jax.ShapeDtypeStruct((n, 3, 9 * nf), jnp.float32),        # dwl
        jax.ShapeDtypeStruct((n, 3, 1), jnp.float32),             # dbl
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[frame((nf, hw)), frame((48, hw)), whole]
        + [whole] * (len(wb) + len(adj)),
        out_specs=[frame(s.shape[1:]) for s in out_shapes],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_chw, g_phase, masks, *wb, *adj)
    dx = outs[0]
    dw1, db1, dw2, db2, dwhr, dbhr, dwl, dbl = [
        v.sum(axis=0) for v in outs[1:]
    ]
    dparams = {
        "upconv1_kernel": fused_upsample_conv_kernel_adjoint(
            _unflat_tap_weight(dw1, nf)
        ),
        "upconv1_bias": db1.reshape(4, nf).sum(axis=0),
        "upconv2_kernel": fused_upsample_conv_kernel_adjoint(
            _unflat_tap_weight(dw2, nf)
        ),
        "upconv2_bias": db2.reshape(4, nf).sum(axis=0),
        "hr_conv_kernel": _unflat_tap_weight(dwhr, nf),
        "hr_conv_bias": dbhr.reshape(-1),
        "conv_last_kernel": _unflat_tap_weight(dwl, nf),
        "conv_last_bias": dbl.reshape(-1),
    }
    return dx, dparams

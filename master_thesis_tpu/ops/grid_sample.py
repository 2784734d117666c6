"""Differentiable image warping (the ``F.grid_sample`` analog), NHWC.

This is the framework's hottest op: the reference calls it five times per
DFPN training step to align reference frames (reference:
master_thesis/utils.py:77-104 ``align_set``), inside the affine movement
simulator (utils.py:314-316), and in the CPN aligner (model_cpn.py:79-88).

Semantics match torch exactly (verified in tests/test_grid_sample.py):

- ``grid``: ``(N, H', W', 2)``, last dim ``(x, y)`` in ``[-1, 1]``.
- ``align_corners=True``: ``pix = (g + 1) / 2 * (size - 1)``.
- ``align_corners=False``: ``pix = ((g + 1) * size - 1) / 2``.
- padding_mode='zeros': out-of-bounds taps contribute zero.
- ``nearest`` rounds half-to-even (torch uses ``std::nearbyint``).

Two implementations, selected by backend (``_use_mm_impl``): a gather+lerp
version for CPU, and a matmul formulation for TPU-class backends that
expresses the bilinear warp as two small dense matmuls with tent-weight
matrices (no per-pixel gathers — see ``grid_sample_mm`` below), which XLA
tiles onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def _use_mm_impl() -> bool:
    """Matmul warp on TPU-class backends; gather warp elsewhere (CPU)."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
    impl: str = "auto",
    precision=None,
) -> jnp.ndarray:
    """Samples ``x`` ``(N,H,W,C)`` at ``grid`` ``(N,H',W',2)`` -> ``(N,H',W',C)``.

    Two implementations with identical semantics (tested against each other
    and against torch):

    - ``gather``: 4 corner gathers + lerp. Fine on CPU; slow on TPU (XLA
      lowers per-pixel gathers to scalar slice loops).
    - ``mm``: tent-weight matmul contraction (:func:`grid_sample_mm`) — the
      TPU-native formulation; all the work lands on the MXU.

    ``precision`` (mm impl only): ``None`` = full f32 (HIGHEST, the
    parity-default per CLAUDE.md); ``jax.lax.Precision.DEFAULT`` = bf16
    multiplies with f32 accumulation — 3.4x faster on the MXU with ~4e-3
    max abs error, appropriate when the warp output only feeds a bf16
    network (the serving path).
    """
    if impl == "auto":
        impl = "mm" if _use_mm_impl() else "gather"
    if impl == "mm":
        return grid_sample_mm(
            x, grid, mode=mode, align_corners=align_corners, precision=precision
        )
    return grid_sample_gather(x, grid, mode=mode, align_corners=align_corners)


def _round8(v: int) -> int:
    return -(-int(v) // 8) * 8


def _tent_weight(pts, f):
    return jnp.maximum(0.0, 1.0 - jnp.abs(pts - f))


def _dtent_weight(pts, f):
    """d tent(pts - f) / d f with torch's subgradient convention.

    torch's bilinear grid grad uses corners x0 = floor(g), x1 = x0 + 1
    with d/dg = -src[x0] + src[x1] everywhere (including integer g), i.e.
    tap weight -1 on pts - f in (-1, 0] and +1 on (0, 1]. Out-of-range
    taps don't exist, which reproduces torch's zeros-padding gradient
    (out-of-bounds corners dropped).
    """
    d = pts - f
    return jnp.where((d > -1.0) & (d <= 0.0), -1.0, 0.0) + jnp.where(
        (d > 0.0) & (d <= 1.0), 1.0, 0.0
    )


def _nearest_weight(pts, f):
    return (pts == jnp.round(f)).astype(jnp.float32)


_WEIGHT_FNS = {
    "tent": _tent_weight,
    "dtent": _dtent_weight,
    "nearest": _nearest_weight,
}


def grid_sample_mm(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
    row_chunk: int = 0,
    col_chunk: int = 0,
    precision=None,
) -> jnp.ndarray:
    """Warp as two tent-weight contractions on the MXU, tiled in 2-D.

    Key identity: bilinear sampling with zeros padding is

        out[i,j] = sum_y sum_x tent(y - fy[i,j]) * tent(x - fx[i,j]) * src[y,x]

    with ``tent(d) = max(0, 1 - |d|)`` — the tent automatically reproduces
    torch's edge semantics (an out-of-range tap simply has no grid point
    within distance 1, i.e. contributes zero). ``nearest`` swaps the tent
    for a one-hot indicator at the rounded coordinate.

    The output is processed in ``(T x TC)`` row/column tiles (a lax.scan,
    one tile per step). For each tile the tent support is located in BOTH
    axes (per-item min/max of the tile's grid coordinates) and the
    contraction runs over a ``(BY, BX)`` source band fetched with a dynamic
    slice — for alignment-like warps (regressed affine thetas, DFPN flows:
    scale ~1, mild rotation) that band is a small neighborhood of the tile,
    so the materialized tent weights are ``(N,T,BX,TC)`` instead of
    ``(N,T,W,W')``. This op is HBM-bound, not MXU-bound: the tent-weight
    and intermediate traffic is what the tiling cuts (~5x at 256²). Tiers
    of growing bands and a final full-frame tier keep the result exact for
    EVERY grid via lax.cond — a tile whose support exceeds a band falls
    through to the next tier.

    ``precision=None`` = full f32 (HIGHEST, the parity default);
    ``Precision.DEFAULT`` = the serving path — operands are materialized in
    bf16 (halving the dominant HBM traffic) and accumulated in f32 on the
    MXU, ~4e-3 max abs error (below the bf16 network's own rounding).

    Gradients run through a ``custom_vjp``: the auto-transpose of the
    tiled scan/cond structure measured 49-153 ms at 256² B=4 on v5e for
    the GRID cotangent alone (the DFPN train-step regression), while the
    analytic grid gradient is just two more tent contractions with the
    derivative tent — ``d out/d gx = Σ src·ty·tent'`` — at forward cost
    each (see ``_grid_sample_mm_bwd``).
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    if mode not in ("bilinear", "nearest"):
        raise ValueError(f"unknown grid_sample mode: {mode}")
    return _grid_sample_mm_vjp(
        x, grid, mode, align_corners, int(row_chunk), int(col_chunk),
        precision,
    )


def _mm_impl(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    wx_kind: str,
    wy_kind: str,
    align_corners: bool,
    row_chunk: int,
    col_chunk: int,
    precision,
) -> jnp.ndarray:
    """Tiled two-axis weighted contraction (see :func:`grid_sample_mm`).

    ``wx_kind``/``wy_kind`` select the per-axis weight function (tent /
    derivative tent / nearest one-hot) so the same machinery computes the
    forward warp AND the two analytic grid-gradient contractions.
    """
    serve_bf16 = precision == jax.lax.Precision.DEFAULT
    opd = jnp.bfloat16 if serve_bf16 else jnp.float32
    n, h, w, c = x.shape
    _, ho, wo, _ = grid.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    weight_x = _WEIGHT_FNS[wx_kind]
    weight_y = _WEIGHT_FNS[wy_kind]

    # Pad the output grid to a multiple of the tile size (zeros sample the
    # source center; the padded rows/cols are sliced off at the end).
    # Defaults from a v5e sweep (scripts/sweep_warp.py, alignment-like
    # grids): 16 output rows per step, full-width columns up to 256 — at
    # 256² that is full-frame-width (column tiling only serializes the
    # scan there); at 512²+ two-or-more column tiles beat full width
    # because the per-step tent-weight block stays cache-sized.
    t = min(row_chunk if row_chunk > 0 else 16, ho)
    tc = min(col_chunk if col_chunk > 0 else 256, wo)
    pad_r, pad_c = (-ho) % t, (-wo) % tc
    if pad_r or pad_c:
        gx = jnp.pad(gx, ((0, 0), (0, pad_r), (0, pad_c)))
        gy = jnp.pad(gy, ((0, 0), (0, pad_r), (0, pad_c)))
    nr, nc = (ho + pad_r) // t, (wo + pad_c) // tc

    # (nr*nc, N, T, TC) tile-major for the scan.
    def tile_major(g):
        g = g.reshape(n, nr, t, nc, tc).transpose(1, 3, 0, 2, 4)
        return g.reshape(nr * nc, n, t, tc)

    gx_c, gy_c = tile_major(gx), tile_major(gy)
    xf = x.astype(jnp.float32)

    # (BY, BX) band tiers, tightest first, ending with the exact full-frame
    # tier (band == axis extent, start pinned to 0 by the clip). A tier
    # whose band covers a whole axis keeps banding on the other axis.
    by_tiers = [b for b in (max(16, _round8(2 * t)), 64) if b < h]
    bx_tiers = [b for b in (_round8(tc + 16), _round8(2 * tc + 32)) if b < w]
    depth = max(len(by_tiers), len(bx_tiers), 0)
    tiers = [
        (
            by_tiers[i] if i < len(by_tiers) else h,
            bx_tiers[i] if i < len(bx_tiers) else w,
        )
        for i in range(depth)
    ]
    tiers.append((h, w))  # exact dense fallback

    def body(_, inp):
        gxc, gyc = inp  # (N, T, TC)
        gx_min, gx_max = jnp.min(gxc, axis=(1, 2)), jnp.max(gxc, axis=(1, 2))
        gy_min, gy_max = jnp.min(gyc, axis=(1, 2)), jnp.max(gyc, axis=(1, 2))
        # Highest in-range source row/col any tap can touch must lie in the
        # band (taps below 0 need no coverage: those rows don't exist and
        # contribute zero by the tent identity).
        hi_y = jnp.minimum(jnp.floor(gy_max) + 1.0, float(h - 1))
        hi_x = jnp.minimum(jnp.floor(gx_max) + 1.0, float(w - 1))

        def tiered(by, bx):
            sy = jnp.clip(jnp.floor(gy_min).astype(jnp.int32) - 1, 0, h - by)
            sx = jnp.clip(jnp.floor(gx_min).astype(jnp.int32) - 1, 0, w - bx)

            def run(_):
                zero = jnp.zeros((), sy.dtype)  # match dtype under x64
                xb = jax.vmap(
                    lambda img, r0, c0: jax.lax.dynamic_slice(
                        img, (r0, c0, zero), (by, bx, c)
                    )
                )(xf, sy, sx)  # (N, BY, BX, C)
                xs_b = (sx[:, None] + jnp.arange(bx)).astype(jnp.float32)
                ys_b = (sy[:, None] + jnp.arange(by)).astype(jnp.float32)
                wx = weight_x(xs_b[:, None, :, None], gxc[:, :, None, :])
                wy = weight_y(ys_b[:, None, :, None], gyc[:, :, None, :])
                r = jnp.einsum(
                    "nyxc,ntxj->ntyjc", xb.astype(opd), wx.astype(opd),
                    precision=precision, preferred_element_type=opd,
                )  # (N, T, BY, TC, C)
                return jnp.einsum(
                    "ntyjc,ntyj->ntjc", r, wy.astype(opd),
                    precision=precision, preferred_element_type=jnp.float32,
                )

            fits = jnp.all(
                (hi_y <= (sy + by - 1).astype(jnp.float32))
                & (hi_x <= (sx + bx - 1).astype(jnp.float32))
            )
            return fits, run

        out = None
        for by, bx in reversed(tiers):
            fits, run = tiered(by, bx)
            if out is None:
                out = run  # the full-frame tier always fits
                continue
            out = functools.partial(
                lambda fits, run, prev, _: jax.lax.cond(fits, run, prev, None),
                fits, run, out,
            )
        return None, out(None)

    _, outs = jax.lax.scan(body, None, (gx_c, gy_c))  # (nr*nc, N, T, TC, C)
    out = outs.reshape(nr, nc, n, t, tc, c).transpose(2, 0, 3, 1, 4, 5)
    out = out.reshape(n, nr * t, nc * tc, c)
    return out[:, :ho, :wo].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _grid_sample_mm_vjp(x, grid, mode, align_corners, row_chunk, col_chunk, precision):
    kind = "nearest" if mode == "nearest" else "tent"
    return _mm_impl(
        x, grid, kind, kind, align_corners, row_chunk, col_chunk, precision
    )


def _grid_sample_mm_fwd(x, grid, mode, align_corners, row_chunk, col_chunk, precision):
    out = _grid_sample_mm_vjp(
        x, grid, mode, align_corners, row_chunk, col_chunk, precision
    )
    return out, (x, grid)


def _grid_sample_mm_bwd(
    mode, align_corners, row_chunk, col_chunk, precision, res, cot
):
    """Analytic warp gradients.

    - d/d src: the auto-transpose of the tiled contraction restricted to
      ``x`` (band-local dynamic_update_slice adds — measured cheap).
    - d/d grid (bilinear): ``out = Σ src·ty(y-gy)·tx(x-gx)`` gives
      ``d out/d gx = Σ src·ty·tent'(x-gx)`` — the SAME contraction with the
      x-tent swapped for its derivative (torch's subgradient convention,
      :func:`_dtent_weight`), then a channel reduction against the
      cotangent and the grid-unnormalization scale. ``nearest`` takes zero
      grid gradient (torch semantics).
    """
    x, grid = res
    kind = "nearest" if mode == "nearest" else "tent"
    _, pull_x = jax.vjp(
        lambda xx: _mm_impl(
            xx, grid, kind, kind, align_corners, row_chunk, col_chunk,
            precision,
        ),
        x,
    )
    (dx,) = pull_x(cot.astype(x.dtype))
    if mode == "nearest":
        return dx, jnp.zeros_like(grid)

    gx_term = _mm_impl(
        x, grid, "dtent", "tent", align_corners, row_chunk, col_chunk,
        precision,
    )
    gy_term = _mm_impl(
        x, grid, "tent", "dtent", align_corners, row_chunk, col_chunk,
        precision,
    )
    n, h, w, _ = x.shape
    cot32 = cot.astype(jnp.float32)
    scale_x = 0.5 * (w - 1) if align_corners else 0.5 * w
    scale_y = 0.5 * (h - 1) if align_corners else 0.5 * h
    dgx = (cot32 * gx_term.astype(jnp.float32)).sum(-1) * scale_x
    dgy = (cot32 * gy_term.astype(jnp.float32)).sum(-1) * scale_y
    dgrid = jnp.stack([dgx, dgy], axis=-1).astype(grid.dtype)
    return dx, dgrid


_grid_sample_mm_vjp.defvjp(_grid_sample_mm_fwd, _grid_sample_mm_bwd)


def grid_sample_gather(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
) -> jnp.ndarray:
    """Gather-based warp (4 corner gathers + lerp)."""
    n, h, w, c = x.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    x_flat = x.reshape(n, h * w, c)

    def gather(iy, ix):
        """Gathers pixels at integer (iy, ix), zeroing out-of-bounds taps."""
        valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
        iy_c = jnp.clip(iy, 0, h - 1)
        ix_c = jnp.clip(ix, 0, w - 1)
        flat = (iy_c * w + ix_c).reshape(n, -1)
        vals = jnp.take_along_axis(x_flat, flat[..., None], axis=1)
        vals = vals.reshape(*iy.shape, c)
        return jnp.where(valid[..., None], vals, 0.0)

    if mode == "nearest":
        ix = jnp.round(gx).astype(jnp.int32)
        iy = jnp.round(gy).astype(jnp.int32)
        return gather(iy, ix).astype(x.dtype)

    if mode != "bilinear":
        raise ValueError(f"unknown grid_sample mode: {mode}")

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return (top * (1 - wy) + bot * wy).astype(x.dtype)


def affine_grid(
    theta: jnp.ndarray, size_hw: tuple, align_corners: bool = True
) -> jnp.ndarray:
    """Generates sampling grids from 2x3 affine matrices (torch semantics).

    Args:
        theta: ``(N, 2, 3)`` row-major affine maps acting on normalized
            ``(x, y, 1)`` coordinates.
        size_hw: output spatial size ``(H, W)``.

    Returns:
        ``(N, H, W, 2)`` grid with ``(x, y)`` in the last axis.
    """
    h, w = size_hw
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, w)
        ys = jnp.linspace(-1.0, 1.0, h)
    else:
        xs = (jnp.arange(w) * 2 + 1) / w - 1.0
        ys = (jnp.arange(h) * 2 + 1) / h - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W) each
    t = theta.astype(jnp.float32)
    # Elementwise broadcast (not a matmul) so precision is full f32 even
    # where the backend's default matmul precision is bf16.
    out_x = t[:, None, None, 0, 0] * gx + t[:, None, None, 0, 1] * gy + t[:, None, None, 0, 2]
    out_y = t[:, None, None, 1, 0] * gx + t[:, None, None, 1, 1] * gy + t[:, None, None, 1, 2]
    return jnp.stack([out_x, out_y], axis=-1)

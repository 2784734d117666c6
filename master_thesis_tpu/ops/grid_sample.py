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


def _auto_row_chunk(n: int, h: int, wo: int, c: int, budget_bytes: int = 512 << 20) -> int:
    """Chunk size keeping the scan's (N, T, H, W', C) f32 intermediate under
    a fixed budget. Too-small chunks are the dominant cost (each scan step
    re-reads the full source from HBM, so halving T doubles that traffic);
    the budget only guards the multi-hundred-MB blowups at 512²+."""
    per_row = n * h * wo * max(c, 1) * 4
    t = max(1, budget_bytes // max(per_row, 1))
    return int(min(8, t))


def grid_sample_mm(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    align_corners: bool = True,
    row_chunk: int = 0,
    precision=None,
) -> jnp.ndarray:
    """Warp as two tent-weight contractions on the MXU.

    Key identity: bilinear sampling with zeros padding is

        out[i,j] = sum_y sum_x tent(y - fy[i,j]) * tent(x - fx[i,j]) * src[y,x]

    with ``tent(d) = max(0, 1 - |d|)`` — the tent automatically reproduces
    torch's edge semantics (an out-of-range tap simply has no grid point
    within distance 1, i.e. contributes zero). Factored per output-row chunk:
    an x-contraction as one batched matmul, then a y-contraction fused with
    the tent mask. Per-pixel gathers never appear, which on TPU is worth
    ~10x over the gather lowering. ``nearest`` mode swaps the tent for a
    one-hot indicator at the rounded coordinate.

    Cost is O(H'·W'·(H + W)·C) MACs — more arithmetic than the O(H'·W')
    gather, but it runs at MXU rate instead of scalar-loop rate.
    """
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    n, h, w, c = x.shape
    _, ho, wo, _ = grid.shape
    gx = _unnormalize(grid[..., 0].astype(jnp.float32), w, align_corners)
    gy = _unnormalize(grid[..., 1].astype(jnp.float32), h, align_corners)

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)

    if mode == "bilinear":
        weight = lambda pts, f: jnp.maximum(0.0, 1.0 - jnp.abs(pts - f))
    elif mode == "nearest":
        weight = lambda pts, f: (pts == jnp.round(f)).astype(jnp.float32)
    else:
        raise ValueError(f"unknown grid_sample mode: {mode}")

    # Pad output rows to a multiple of the chunk size.
    if row_chunk <= 0:
        row_chunk = _auto_row_chunk(n, h, wo, c)
    t = min(row_chunk, ho)
    pad = (-ho) % t
    if pad:
        gx = jnp.concatenate([gx, jnp.zeros((n, pad, wo))], axis=1)
        gy = jnp.concatenate([gy, jnp.zeros((n, pad, wo))], axis=1)
    nch = (ho + pad) // t

    # (nch, N, T, W') chunk-major for the scan.
    gx_c = gx.reshape(n, nch, t, wo).transpose(1, 0, 2, 3)
    gy_c = gy.reshape(n, nch, t, wo).transpose(1, 0, 2, 3)
    xf = x.astype(jnp.float32)

    # Banded y-contraction: a warp tap at output row block [i, i+T) only
    # touches source rows within 1 of that block's gy values — for
    # alignment-like warps (scale ~1, mild rotation) that's a ~T+rot·W'
    # row band, not all H. Each chunk locates its per-item band start with
    # a dynamic slice and contracts B rows instead of H (~H/B fewer MACs);
    # a lax.cond falls back to the dense contraction for any chunk whose
    # tent support doesn't fit the static band, so the result is exact for
    # EVERY grid. Band fit is the common case: regressed affine thetas and
    # DFPN flows are near-identity maps.
    bands = [b for b in (max(16, 2 * t), 64) if b < h]
    bands = sorted(set(bands))

    def x_contract(src, wx):
        return jnp.einsum("nyxc,ntxj->ntyjc", src, wx, precision=precision)

    def y_contract(r, wy):
        return jnp.einsum("ntyjc,ntyj->ntjc", r, wy, precision=precision)

    def body(_, inp):
        gxc, gyc = inp  # (N, T, W')
        wx = weight(xs[None, None, :, None], gxc[:, :, None, :])  # (N,T,W,W')

        def dense(_):
            r = jnp.einsum(
                "nyxc,ntxj->ntyjc", xf, wx, precision=precision
            )  # (N,T,H,W',C)
            wy = weight(ys[None, None, :, None], gyc[:, :, None, :])  # (N,T,H,W')
            return y_contract(r, wy)

        if not bands:
            return None, dense(None)

        gy_min = jnp.min(gyc, axis=(1, 2))  # (N,)
        gy_max = jnp.max(gyc, axis=(1, 2))
        # Highest in-range source row any tap can touch must lie in the band.
        hi_tap = jnp.minimum(jnp.floor(gy_max) + 1.0, float(h - 1))

        def banded(band):
            start = jnp.clip(jnp.floor(gy_min).astype(jnp.int32) - 1, 0, h - band)

            def run(_):
                zero = jnp.zeros((), start.dtype)  # match s0 under jax_enable_x64
                xb = jax.vmap(
                    lambda img, s0: jax.lax.dynamic_slice(
                        img, (s0, zero, zero), (band, w, c)
                    )
                )(xf, start)  # (N, B, W, C)
                r = x_contract(xb, wx)  # (N,T,B,W',C)
                ys_b = (start[:, None] + jnp.arange(band)).astype(jnp.float32)
                wy = weight(ys_b[:, None, :, None], gyc[:, :, None, :])
                return y_contract(r, wy)

            fits = jnp.all(hi_tap <= (start + band - 1).astype(jnp.float32))
            return fits, run

        # Tiered bands, tightest first; any chunk whose tent support
        # exceeds every tier falls back to the dense contraction — exact
        # for every grid, fast for the alignment-like common case.
        out = dense
        for b in reversed(bands):
            fits, run = banded(b)
            out = functools.partial(
                lambda fits, run, prev, _: jax.lax.cond(fits, run, prev, None),
                fits, run, out,
            )
        return None, out(None)

    _, outs = jax.lax.scan(body, None, (gx_c, gy_c))  # (nch, N, T, W', C)
    out = outs.transpose(1, 0, 2, 3, 4).reshape(n, nch * t, wo, c)
    return out[:, :ho].astype(x.dtype)


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

"""Parity of ops.grid_sample with torch F.grid_sample / F.affine_grid."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from master_thesis_tpu.ops import movements
from master_thesis_tpu.ops.grid_sample import affine_grid, grid_sample


def _rand_grid(rng, n, h, w, scale=1.3):
    return (rng.rand(n, h, w, 2).astype(np.float32) * 2 - 1) * scale


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, align, mode):
    x = rng.rand(2, 13, 17, 3).astype(np.float32)
    grid = _rand_grid(rng, 2, 9, 11)
    got = np.asarray(
        grid_sample(jnp.asarray(x), jnp.asarray(grid), mode=mode, align_corners=align)
    )
    want = (
        F.grid_sample(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid),
            mode=mode,
            align_corners=align,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
def test_affine_grid_matches_torch(rng, align):
    theta = rng.randn(3, 2, 3).astype(np.float32) * 0.3
    got = np.asarray(affine_grid(jnp.asarray(theta), (8, 12), align_corners=align))
    want = F.affine_grid(
        torch.from_numpy(theta), [3, 1, 8, 12], align_corners=align
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_numpy_twin_matches_jnp(rng):
    x = rng.rand(2, 10, 14, 3).astype(np.float32)
    grid = _rand_grid(rng, 2, 10, 14)
    a = movements.grid_sample_bilinear_np(x, grid, align_corners=True)
    b = np.asarray(
        grid_sample(jnp.asarray(x), jnp.asarray(grid), align_corners=True)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)
    ga = movements.affine_grid_np(
        rng.randn(2, 2, 3).astype(np.float32), (6, 7), align_corners=True
    )
    assert ga.shape == (2, 6, 7, 2)


def test_mm_impl_matches_gather(rng):
    """The TPU matmul warp must agree with the gather warp bit-for-bit-ish."""
    from master_thesis_tpu.ops.grid_sample import grid_sample_gather, grid_sample_mm

    x = rng.rand(2, 20, 24, 3).astype(np.float32)
    grid = (rng.rand(2, 20, 24, 2).astype(np.float32) * 2 - 1) * 1.3
    for mode in ("bilinear", "nearest"):
        for align in (True, False):
            a = np.asarray(
                grid_sample_mm(jnp.asarray(x), jnp.asarray(grid), mode=mode, align_corners=align)
            )
            b = np.asarray(
                grid_sample_gather(jnp.asarray(x), jnp.asarray(grid), mode=mode, align_corners=align)
            )
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f"{mode}/{align}")


def test_mm_impl_nonsquare_and_padding(rng):
    from master_thesis_tpu.ops.grid_sample import grid_sample_gather, grid_sample_mm

    x = rng.rand(1, 13, 17, 2).astype(np.float32)
    grid = (rng.rand(1, 9, 11, 2).astype(np.float32) * 2 - 1) * 1.5
    a = np.asarray(grid_sample_mm(jnp.asarray(x), jnp.asarray(grid), row_chunk=4))
    b = np.asarray(grid_sample_gather(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_mm_banded_y_contraction_matches_gather(rng):
    """Images tall enough for the banded path (h > 64): near-identity
    affines take the banded branch, a 126-degree rotation forces the dense
    lax.cond fallback — both must be exact; grads flow through the band's
    dynamic slice."""
    import jax

    from master_thesis_tpu.ops.grid_sample import (
        affine_grid, grid_sample_gather, grid_sample_mm,
    )

    h = w = 96
    x = jnp.asarray(rng.rand(3, h, w, 2).astype(np.float32))
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (3, 1, 1))
    near = jnp.asarray(ident + rng.randn(3, 2, 3).astype(np.float32) * 0.05)
    a = 2.2
    rot = jnp.asarray(np.tile(np.asarray(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0]], np.float32
    ), (3, 1, 1)))
    shift = jnp.asarray(ident + np.asarray([[[0, 0, 0.9], [0, 0, -0.9]]], np.float32))
    for name, theta in (("near", near), ("rot", rot), ("edge-shift", shift)):
        g = affine_grid(theta, (h, w), align_corners=False)
        for mode in ("bilinear", "nearest"):
            mm = np.asarray(grid_sample_mm(x, g, mode=mode, align_corners=False))
            ga = np.asarray(grid_sample_gather(x, g, mode=mode, align_corners=False))
            np.testing.assert_allclose(mm, ga, atol=1e-5, err_msg=f"{name}/{mode}")

    g = affine_grid(near, (h, w), align_corners=False)
    grad = jax.grad(lambda xx: grid_sample_mm(xx, g, align_corners=False).sum())(x)
    assert bool(jnp.isfinite(grad).all())


@pytest.mark.parametrize("align", [True, False])
def test_mm_custom_vjp_grads_match_torch(rng, align):
    """The warp's custom_vjp (analytic grid gradient as two derivative-tent
    contractions, ops/grid_sample.py:_grid_sample_mm_bwd) == torch's
    grid_sample backward for BOTH cotangents — source and grid — including
    out-of-range taps (zeros padding drops out-of-bounds corners) and
    non-uniform upstream cotangents."""
    import jax

    from master_thesis_tpu.ops.grid_sample import grid_sample_mm

    n, h, w, c = 2, 13, 17, 3
    ho, wo = 9, 11
    x = rng.rand(n, h, w, c).astype(np.float32)
    grid = _rand_grid(rng, n, ho, wo, scale=1.2)
    cot = rng.randn(n, ho, wo, c).astype(np.float32)

    def loss_j(xx, gg):
        out = grid_sample_mm(xx, gg, align_corners=align)
        return (out * jnp.asarray(cot)).sum()

    dx_j, dg_j = jax.grad(loss_j, argnums=(0, 1))(
        jnp.asarray(x), jnp.asarray(grid)
    )

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    gt = torch.from_numpy(grid).requires_grad_(True)
    out_t = F.grid_sample(xt, gt, mode="bilinear", align_corners=align)
    out_t.backward(torch.from_numpy(cot.transpose(0, 3, 1, 2)))

    np.testing.assert_allclose(
        np.asarray(dx_j),
        xt.grad.numpy().transpose(0, 2, 3, 1),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(dg_j), gt.grad.numpy(), atol=1e-4)


def test_mm_nearest_grid_grad_is_zero(rng):
    """nearest mode: zero grid gradient (torch semantics), source grad
    finite."""
    import jax

    from master_thesis_tpu.ops.grid_sample import grid_sample_mm

    x = jnp.asarray(rng.rand(1, 8, 8, 2).astype(np.float32))
    g = jnp.asarray(_rand_grid(rng, 1, 6, 6, scale=1.0))
    dg = jax.grad(
        lambda gg: grid_sample_mm(x, gg, mode="nearest").sum()
    )(g)
    assert np.asarray(jnp.abs(dg)).max() == 0.0


def test_mm_custom_vjp_grid_grad_banded_path(rng):
    """Grid gradient on a banded-tier image (h > 64, near-identity
    affine): analytic custom_vjp == torch on the band path too."""
    import jax

    from master_thesis_tpu.ops.grid_sample import affine_grid, grid_sample_mm

    h = w = 96
    x = rng.rand(2, h, w, 3).astype(np.float32)
    ident = np.tile(np.asarray([[1, 0, 0], [0, 1, 0]], np.float32), (2, 1, 1))
    theta = ident + rng.randn(2, 2, 3).astype(np.float32) * 0.03
    g = np.asarray(affine_grid(jnp.asarray(theta), (h, w), align_corners=True))
    cot = rng.randn(2, h, w, 3).astype(np.float32)

    dg_j = jax.grad(
        lambda gg: (
            grid_sample_mm(jnp.asarray(x), gg, align_corners=True)
            * jnp.asarray(cot)
        ).sum()
    )(jnp.asarray(g))

    gt = torch.from_numpy(g).requires_grad_(True)
    out_t = F.grid_sample(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), gt, mode="bilinear",
        align_corners=True,
    )
    out_t.backward(torch.from_numpy(cot.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(dg_j), gt.grad.numpy(), atol=2e-3, rtol=1e-4
    )

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

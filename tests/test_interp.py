"""Parity of ops.interp with torch F.interpolate conventions."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from master_thesis_tpu.ops import interp


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
    if mode == "nearest":
        out = F.interpolate(t, size, mode="nearest")
    else:
        out = F.interpolate(t, size, mode=mode, align_corners=align_corners)
    return out.numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("in_size,out_size", [((17, 31), (64, 64)), ((256, 256), (64, 64)), ((240, 480), (16, 16)), ((13, 9), (29, 57))])
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.rand(2, *in_size, 3).astype(np.float32)
    got = np.asarray(interp.resize_hw(jnp.asarray(x), out_size, mode="nearest"))
    want = _torch_resize(x, out_size, "nearest")
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("in_size,out_size", [((17, 31), (64, 64)), ((256, 256), (64, 64)), ((64, 64), (256, 256)), ((240, 480), (256, 256))])
def test_bilinear_matches_torch(rng, align, in_size, out_size):
    x = rng.rand(2, *in_size, 3).astype(np.float32)
    got = np.asarray(
        interp.resize_hw(jnp.asarray(x), out_size, mode="bilinear", align_corners=align)
    )
    want = _torch_resize(x, out_size, "bilinear", align_corners=align)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_extra_leading_dims(rng):
    x = rng.rand(2, 3, 10, 12, 2).astype(np.float32)  # (B, F, H, W, C)
    out = interp.resize_hw(jnp.asarray(x), (20, 24), mode="bilinear")
    assert out.shape == (2, 3, 20, 24, 2)
    flat = interp.resize_hw(jnp.asarray(x.reshape(6, 10, 12, 2)), (20, 24), mode="bilinear")
    np.testing.assert_allclose(np.asarray(out).reshape(6, 20, 24, 2), np.asarray(flat), atol=1e-6)


def test_mm_resize_matches_take(rng):
    """The TPU matmul resize must agree with the take-based resize."""
    from master_thesis_tpu.ops.interp import (
        _linear_matrix,
        _nearest_matrix,
        _resize_axis_mm,
        resize_hw,
    )

    x = rng.rand(2, 31, 17, 3).astype(np.float32)
    xj = jnp.asarray(x)
    for out_size, axis in ((64, 1), (9, 2)):
        got = np.asarray(
            _resize_axis_mm(xj, _linear_matrix(x.shape[axis], out_size, False), axis)
        )
        import master_thesis_tpu.ops.interp as interp_mod

        want = np.asarray(interp_mod._take(xj, interp_mod._linear_taps(x.shape[axis], out_size, False)[0], axis)) * 0
        # compare against the lerp formulation directly
        idx0, idx1, w1 = interp_mod._linear_taps(x.shape[axis], out_size, False)
        x0 = np.take(x, idx0, axis=axis)
        x1 = np.take(x, idx1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
        want = x0 * (1 - w1.reshape(shape)) + x1 * w1.reshape(shape)
        np.testing.assert_allclose(got, want, atol=1e-6)

        got_n = np.asarray(_resize_axis_mm(xj, _nearest_matrix(x.shape[axis], out_size), axis))
        want_n = np.take(x, interp_mod._nearest_indices(x.shape[axis], out_size), axis=axis)
        np.testing.assert_array_equal(got_n, want_n)

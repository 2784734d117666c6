"""Transforms: dilate parity with cv2, resize-set behavior."""

import cv2
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.ops import transforms


def test_dilate_matches_cv2(rng):
    m = (rng.rand(24, 24) > 0.9).astype(np.float32)
    for iters in [1, 4]:
        got = np.asarray(
            transforms.dilate(jnp.asarray(m[None, :, :, None]), (3, 3), iters)
        )[0, :, :, 0]
        want = cv2.dilate(
            m, cv2.getStructuringElement(cv2.MORPH_CROSS, (3, 3)), iterations=iters
        )
        np.testing.assert_array_equal(got, want)


def test_resize_set_shapes(rng):
    b, f, h, w = 2, 3, 32, 32
    x = jnp.asarray(rng.rand(b, f, h, w, 3).astype(np.float32))
    v = jnp.asarray((rng.rand(b, f, h, w, 1) > 0.5).astype(np.float32))
    y = jnp.asarray(rng.rand(b, f, h, w, 3).astype(np.float32))
    x2, v2, y2 = transforms.resize_set(x, v, y, 16)
    assert x2.shape == (b, f, 16, 16, 3)
    assert v2.shape == (b, f, 16, 16, 1)
    assert set(np.unique(np.asarray(v2))) <= {0.0, 1.0}  # nearest keeps binary


def test_resize_set_bis_noop_when_same_size(rng):
    xt = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    mt = jnp.asarray(rng.rand(2, 16, 16, 1).astype(np.float32))
    xr = jnp.asarray(rng.rand(2, 3, 16, 16, 3).astype(np.float32))
    mr = jnp.asarray(rng.rand(2, 3, 16, 16, 1).astype(np.float32))
    out = transforms.resize_set_bis(xt, mt, xr, mr, (16, 16))
    assert out[0] is xt and out[2] is xr


def test_keep_ratio_resize_minus_one_drops_last_column(rng):
    img = jnp.asarray(rng.rand(1, 10, 20, 3).astype(np.float32))
    out = transforms.resize(img, (20, -1))
    # new width = round(20 * 20 / 10) = 40, then [:, :-1] -> 39
    assert out.shape == (1, 20, 39, 3)


def test_crop(rng):
    img = jnp.asarray(rng.rand(2, 16, 16, 3).astype(np.float32))
    out = transforms.crop(img, (8, 4), (2, 3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img)[:, 2:10, 3:7])

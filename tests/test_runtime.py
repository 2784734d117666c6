"""Native C++ decode runtime: builds, decodes, and matches cv2."""

import os

import numpy as np
import pytest

from master_thesis_tpu.runtime import native


@pytest.fixture(scope="module")
def images(tmp_path_factory, ):
    import cv2

    rng = np.random.RandomState(0)
    d = tmp_path_factory.mktemp("imgs")
    jpg = str(d / "img.jpg")
    png = str(d / "mask.png")
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)
    cv2.imwrite(jpg, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
    m = np.zeros((41, 29), np.uint8)
    cv2.circle(m, (14, 20), 9, 37, -1)  # non-255 values still count as mask
    cv2.imwrite(png, m)
    return jpg, png


def test_native_available():
    assert native.is_available(), "native runtime failed to build/load"


def test_jpeg_decode_matches_cv2(images):
    import cv2

    jpg, _ = images
    got = native.decode_jpeg(jpg)
    want = cv2.imread(jpg, cv2.IMREAD_COLOR)[:, :, ::-1].astype(np.float32) / 255.0
    assert got.shape == want.shape
    # Same libjpeg under both; allow 1-level differences from DCT config.
    assert np.abs(got - want).max() <= (1.5 / 255.0)


def test_png_mask_decode_matches_cv2(images):
    import cv2

    _, png = images
    got = native.decode_mask_png(png)
    want = (cv2.imread(png, cv2.IMREAD_GRAYSCALE) > 0).astype(np.float32)[..., None]
    np.testing.assert_array_equal(got, want)


def test_jpeg_decode_missing_file():
    with pytest.raises(IOError):
        native.decode_jpeg("/nonexistent/file.jpg")


@pytest.mark.parametrize(
    "n,h,w,c,oh,ow,ac",
    [
        (5, 96, 171, 3, 64, 64, True),   # bg warp shape class (C=3)
        (3, 64, 48, 1, 32, 40, False),   # mask warp (C=1), align_corners=False
        (2, 17, 23, 4, 19, 11, True),    # generic channel fallback path
    ],
)
def test_grid_sample_native_bitexact(n, h, w, c, oh, ow, ac):
    """The native warp kernel is bit-exact with the numpy twin it replaces
    (the fast-simulator hot loop routes through it; ops/movements.py).
    Grid range ±1.3 exercises the zeros-padding out-of-bounds taps."""
    from master_thesis_tpu.ops.movements import grid_sample_bilinear_np

    rng = np.random.RandomState(1)
    x = rng.rand(n, h, w, c).astype(np.float32)
    g = (rng.rand(n, oh, ow, 2) * 2.6 - 1.3).astype(np.float32)
    got = native.grid_sample_bilinear(x, g, ac)
    # f64 grid forces the numpy reference path (the native route only takes
    # all-f32 inputs); coordinates are computed in f64 on both sides, so the
    # comparison is exact, not approximate.
    want = grid_sample_bilinear_np(x, g.astype(np.float64), ac)
    np.testing.assert_array_equal(got, want)

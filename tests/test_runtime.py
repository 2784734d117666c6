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


def test_jpeg_scale_num_selection():
    """Smallest n/8 whose ceil-scaled dims still cover the target (so the
    downstream resize stays a shrink); 8 = no reduction possible."""
    # The production case: 480x854 stored, 256x256 target -> 5/8 (300x534).
    assert native.jpeg_scale_num(480, 854, 256, 256) == 5
    # Exactly half on both axes -> 4/8.
    assert native.jpeg_scale_num(512, 512, 256, 256) == 4
    # 7/8 would cover (ceil(300*7/8)=263 >= 256) but the 6x6/7x7 scaled
    # IDCTs decode slower than the SIMD full path -> capped to full decode.
    assert native.jpeg_scale_num(300, 854, 256, 256) == 8
    # Huge source -> deep reduction bounded at 1/8.
    assert native.jpeg_scale_num(4096, 4096, 256, 256) == 1
    # CLI test geometry: 480x854 -> (240, 480): 5/8 (W limits: 854*4/8=427<480).
    assert native.jpeg_scale_num(480, 854, 240, 480) == 5


def test_jpeg_scaled_decode_resize_equivalence(tmp_path):
    """DCT-scaled decode + resize tracks full decode + resize (VERDICT r4
    task 6): the two paths differ only in how detail destined to be thrown
    away is low-passed. Smooth content at production-like geometry; the
    tolerance bounds the deviation the training pipeline inherits with
    ``fast_decode`` (default)."""
    import cv2

    from master_thesis_tpu.ops import interp

    rng = np.random.RandomState(7)
    h, w, th, tw = 480, 854, 256, 256
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack(
        [
            127 + 90 * np.sin(yy / 37 + c) * np.cos(xx / 53 - c)
            + rng.randn(h, w) * 4
            for c in range(3)
        ],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    jpg = str(tmp_path / "big.jpg")
    cv2.imwrite(jpg, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])

    full = native.decode_jpeg(jpg)
    scaled = native.decode_jpeg(jpg, min_hw=(th, tw))
    assert full.shape == (h, w, 3)
    assert scaled.shape == (300, 534, 3)  # 5/8 scale still covers 256²

    a = interp.resize_hw_np(full[None], (th, tw), mode="bilinear")[0]
    b = interp.resize_hw_np(scaled[None], (th, tw), mode="bilinear")[0]
    err = np.abs(a - b)
    assert err.mean() < 0.01 and err.max() < 0.08, (err.mean(), err.max())


def test_jpeg_scaled_decode_noop_when_target_large():
    """min_hw above half the stored size: the wrapper must return the
    exact full-size decode (no scaling applied)."""
    import cv2

    rng = np.random.RandomState(3)
    import tempfile, os as _os

    with tempfile.TemporaryDirectory() as d:
        jpg = _os.path.join(d, "s.jpg")
        cv2.imwrite(jpg, rng.randint(0, 255, (64, 80, 3), np.uint8))
        full = native.decode_jpeg(jpg)
        hinted = native.decode_jpeg(jpg, min_hw=(60, 60))
        np.testing.assert_array_equal(full, hinted)


@pytest.mark.parametrize("c", [1, 3])
@pytest.mark.parametrize(
    "orig",
    [
        (None, None),   # identity to_orig both axes (rsize is None)
        (200, 120),     # keep-ratio back-map both axes
        (None, 96),     # mixed; 96 == h also hits the rsize == osize branch
    ],
)
def test_affine_warp_native_bitexact(c, orig):
    """The fused simulator warp (mtt_affine_warp_f32) is bit-exact with the
    numpy chain it replaces: apply_theta (f64) -> to_orig (f64) ->
    astype(f32) -> grid_sample_bilinear align_corners=True."""
    rng = np.random.RandomState(4)
    h, w, oh, ow, n = 96, 128, 40, 56, 4
    x = rng.rand(h, w, c).astype(np.float32)
    theta = np.stack(
        [
            np.asarray([[1.0, 0.02, 0.1], [-0.03, 0.98, -0.2]])
            + rng.uniform(-0.1, 0.1, (2, 3))
            for _ in range(n)
        ]
    ).astype(np.float64)
    rw, rh = orig
    ws, hs = int(w * 1.5), int(h * 1.5)  # virtual warp resolution
    sx = np.clip((np.arange(ow) + 0.5) * (ws / ow) - 0.5, 0.0, ws - 1)
    sy = np.clip((np.arange(oh) + 0.5) * (hs / oh) - 0.5, 0.0, hs - 1)
    gx1 = 2.0 * sx / (ws - 1) - 1.0
    gy1 = 2.0 * sy / (hs - 1) - 1.0

    got = native.affine_warp(
        x, theta, gx1, gy1,
        (ws, -1.0 if rw is None else rw, w),
        (hs, -1.0 if rh is None else rh, h),
    )

    def to_orig(pn, vsize, rsize, osize):
        if rsize is None or rsize == osize:
            return pn
        pv = (pn + 1.0) * 0.5 * (vsize - 1)
        po = (pv + 0.5) * (osize / rsize) - 0.5
        return 2.0 * po / (osize - 1) - 1.0 if osize > 1 else pv * 0.0

    gy_v, gx_v = np.meshgrid(gy1, gx1, indexing="ij")
    ox = (
        theta[:, None, None, 0, 0] * gx_v
        + theta[:, None, None, 0, 1] * gy_v
        + theta[:, None, None, 0, 2]
    )
    oy = (
        theta[:, None, None, 1, 0] * gx_v
        + theta[:, None, None, 1, 1] * gy_v
        + theta[:, None, None, 1, 2]
    )
    flow = np.stack(
        [to_orig(ox, ws, rw, w), to_orig(oy, hs, rh, h)], axis=-1
    ).astype(np.float32)
    want = native.grid_sample_bilinear(
        np.repeat(x[None], n, axis=0), flow, True
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize(
    "shape,size,ac",
    [
        ((5, 480, 854, 3), (256, 256), False),  # pipeline hot shape
        ((3, 50, 61, 1), (97, 33), False),      # mixed up/downscale, C=1
        ((40, 30, 2), (17, 19), True),          # no batch dim, align_corners
    ],
)
def test_resize_native_bitexact(shape, size, ac):
    """resize_hw_np routes its bilinear branch through the native per-axis
    kernel for f32 inputs; it must be bit-exact with the pure-numpy
    expression (same tap tables, same f32 op order)."""
    from master_thesis_tpu.ops import interp

    rng = np.random.RandomState(2)
    x = rng.rand(*shape).astype(np.float32)
    got = interp.resize_hw_np(x, size, mode="bilinear", align_corners=ac)

    # Pure-numpy twin (the routed expression, native path bypassed).
    ref = x
    h_axis, w_axis = x.ndim - 3, x.ndim - 2
    for axis, out_size in ((h_axis, size[0]), (w_axis, size[1])):
        in_size = ref.shape[axis]
        if in_size == out_size:
            continue
        idx0, idx1, w1 = interp._linear_taps(in_size, out_size, ac)
        sh = [1] * ref.ndim
        sh[axis] = out_size
        w1 = w1.astype(ref.dtype).reshape(sh)
        ref = (
            np.take(ref, idx0, axis=axis) * (1 - w1)
            + np.take(ref, idx1, axis=axis) * w1
        )
    np.testing.assert_array_equal(got, ref)


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

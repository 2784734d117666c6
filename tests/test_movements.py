"""Movement simulator: warp parity with torch and algebraic properties."""

import numpy as np
import torch
import torch.nn.functional as F

from master_thesis_tpu.ops import movements


def test_identity_movement_is_noop(rng):
    x = rng.rand(12, 14, 3).astype(np.float32)
    sim = movements.MovementSimulator(0, 0.0, 0.0, rng=np.random.RandomState(1))
    mats = [movements.identity_affine() for _ in range(5)]
    y, flow_inv, _ = sim.simulate_movement(x, 5, mats)
    assert y.shape == (5, 12, 14, 3)
    np.testing.assert_allclose(y, np.repeat(x[None], 5, 0), atol=1e-5)
    ident = movements.affine_grid_np(
        np.repeat(np.array([[[1.0, 0, 0], [0, 1, 0]]], np.float32), 5, 0), (12, 14)
    )
    np.testing.assert_allclose(flow_inv, ident, atol=1e-5)


def test_warp_matches_torch_grid_sample(rng):
    """The numpy warp chain equals torch affine_grid+grid_sample on our thetas."""
    x = rng.rand(20, 24, 3).astype(np.float32)
    sim = movements.MovementSimulator(3, 0.05, 0.1, rng=np.random.RandomState(2))
    n = 3
    y, flow_inv, mats = sim.simulate_movement(x, n)

    stacked = movements.stack_transformations(np.stack(mats), t=n // 2)
    theta = np.stack([movements.affine2theta(m, 20, 24) for m in stacked])
    grid = F.affine_grid(torch.from_numpy(theta), [n, 3, 20, 24], align_corners=True)
    want = (
        F.grid_sample(
            torch.from_numpy(np.repeat(x[None], n, 0).transpose(0, 3, 1, 2)),
            grid,
            align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_stack_transformations_composition():
    rs = np.random.RandomState(3)
    mats = np.stack([np.eye(3) + 0.01 * rs.randn(3, 3) for _ in range(5)])
    t = 2
    out = movements.stack_transformations(mats, t)
    np.testing.assert_allclose(out[t], mats[t])
    np.testing.assert_allclose(out[3], mats[3] @ out[2], atol=1e-12)
    np.testing.assert_allclose(out[1], np.linalg.inv(mats[1]) @ out[2], atol=1e-12)


def test_random_affine_respects_bounds():
    sim = movements.MovementSimulator(50, 0.10, 0.20, rng=np.random.RandomState(4))
    for _ in range(20):
        m = sim.random_affine()
        assert abs(m[0, 2]) <= 50 and abs(m[1, 2]) <= 50
        sx = np.hypot(m[0, 0], m[1, 0])
        assert 0.85 <= sx <= 1.15


def _exact_pipeline(x, n, mats, min_height, out_size, value_mode):
    """The reference composite the fast path replaces: optional keep-ratio
    upscale -> warp -> (threshold-free) resize of values and nearest resize
    of flows, mirroring data/pipeline.py's exact branches."""
    from master_thesis_tpu.ops import interp

    sim = movements.MovementSimulator(0, 0, 0)
    if min_height is not None and x.shape[0] < min_height:
        h, w = x.shape[0], x.shape[1]
        new = (min_height, round(w * min_height / h))
        x = interp.resize_hw_np(x, new, mode="bilinear")[:, :-1]
    y, flow_inv, _ = sim.simulate_movement(x, n, mats)
    y = interp.resize_hw_np(y, out_size, mode=value_mode)
    flow_inv = interp.resize_hw_np(flow_inv, out_size, mode="nearest")
    return y, flow_inv


def test_simulate_movement_resized_flows_exact(rng):
    """Fast-path ground-truth flows == warp-at-virtual-size + nearest
    resize, bit-close (both evaluate the same analytic affine)."""
    x = rng.rand(48, 88, 3).astype(np.float32)
    sim = movements.MovementSimulator(5, 0.05, 0.1, rng=np.random.RandomState(7))
    mats = [sim.random_affine() for _ in range(2)]
    mats = mats[:1] + [movements.identity_affine()] + mats[1:]
    mh, out = 96, (40, 56)
    rw = round(88 * mh / 48)
    _, want_flow = _exact_pipeline(x, 3, mats, mh, out, "bilinear")
    _, got_flow, _ = sim.simulate_movement_resized(
        x, 3, out, (mh, rw - 1), mats, value_mode="bilinear",
        resized_hw=(mh, rw),
    )
    np.testing.assert_allclose(got_flow, want_flow, atol=1e-5)


def test_simulate_movement_resized_mask_exact(rng):
    """No upscale + nearest back-projection (the mask path) is EXACT:
    nearest-resize-of-warp == warp evaluated at the picked positions."""
    m = (rng.rand(37, 61, 1) > 0.7).astype(np.float32)
    sim = movements.MovementSimulator(4, 0.08, 0.15, rng=np.random.RandomState(8))
    mats = [sim.random_affine() for _ in range(4)]
    mats = mats[:2] + [movements.identity_affine()] + mats[2:]
    out = (24, 40)
    want, want_flow = _exact_pipeline(m, 5, mats, None, out, "nearest")
    got, got_flow, _ = sim.simulate_movement_resized(
        m, 5, out, None, mats, value_mode="nearest"
    )
    np.testing.assert_allclose(got, want, atol=1e-6)
    np.testing.assert_allclose(got_flow, want_flow, atol=1e-5)


def test_simulate_movement_resized_values_close_on_smooth(rng):
    """Background values: double-bilinear vs composed single-bilinear is a
    low-pass difference — tight on a smooth image."""
    gy, gx = np.meshgrid(np.linspace(0, 1, 48), np.linspace(0, 1, 80), indexing="ij")
    x = np.stack([gy, gx, 0.5 * (gx + gy)], -1).astype(np.float32)
    sim = movements.MovementSimulator(3, 0.03, 0.05, rng=np.random.RandomState(9))
    mats = [sim.random_affine() for _ in range(2)]
    mats = mats[:1] + [movements.identity_affine()] + mats[1:]
    mh, out = 96, (32, 48)
    rw = round(80 * mh / 48)
    want, _ = _exact_pipeline(x, 3, mats, mh, out, "bilinear")
    got, _, _ = sim.simulate_movement_resized(
        x, 3, out, (mh, rw - 1), mats, value_mode="bilinear",
        resized_hw=(mh, rw),
    )
    # Interior parity is tight on a (piecewise-)linear image; the border
    # rolloff region differs at sub-virtual-pixel scale.
    assert np.abs(got[:, 2:-2, 2:-2] - want[:, 2:-2, 2:-2]).max() < 2e-2


def test_simulate_movement_resized_draws_match_exact_path():
    """With no explicit matrices both paths draw the same transforms from
    the same stream (RNG order preserved by the fast path)."""
    x = np.random.RandomState(0).rand(40, 40, 1).astype(np.float32)
    a = movements.MovementSimulator(5, 0.05, 0.1, rng=np.random.RandomState(11))
    _, _, mats_a = a.simulate_movement(x, 3)
    b = movements.MovementSimulator(5, 0.05, 0.1, rng=np.random.RandomState(11))
    _, _, mats_b = b.simulate_movement_resized(x, 3, (24, 24))
    for ma, mb in zip(mats_a, mats_b):
        np.testing.assert_allclose(ma, mb)

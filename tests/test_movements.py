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

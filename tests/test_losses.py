"""Loss parity with the reference's torch formulations."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from master_thesis_tpu.ops import losses


def _torch_masked_l1(y_hat, y, mask, batch_mask=None, reduction="mean", weight=1.0):
    y_hat, y, mask = map(torch.from_numpy, (y_hat, y, mask))
    if batch_mask is not None:
        bm = torch.from_numpy(batch_mask)
        if not bm.any():
            return 0.0
        y_hat, y, mask = y_hat[bm], y[bm], mask[bm]
    loss = F.l1_loss(y_hat * mask, y * mask, reduction=reduction)
    denom = torch.sum(mask) + 1e-9 if reduction == "sum" else 1
    return float(weight * loss / denom)


def test_masked_l1_mean(rng):
    y_hat = rng.rand(4, 8, 8, 3).astype(np.float32)
    y = rng.rand(4, 8, 8, 3).astype(np.float32)
    m = (rng.rand(4, 8, 8, 1) > 0.5).astype(np.float32)
    got = float(losses.masked_l1(jnp.asarray(y_hat), jnp.asarray(y), jnp.asarray(m)))
    want = _torch_masked_l1(y_hat, y, m)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_l1_sum_normalized(rng):
    y_hat = rng.rand(4, 8, 8, 3).astype(np.float32)
    y = rng.rand(4, 8, 8, 3).astype(np.float32)
    m = (rng.rand(4, 8, 8, 1) > 0.5).astype(np.float32)
    got = float(
        losses.masked_l1(
            jnp.asarray(y_hat), jnp.asarray(y), jnp.asarray(m), reduction="sum", weight=2.0
        )
    )
    want = _torch_masked_l1(y_hat, y, m, reduction="sum", weight=2.0)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_masked_l1_batch_mask(rng):
    y_hat = rng.rand(4, 8, 8, 2).astype(np.float32)
    y = rng.rand(4, 8, 8, 2).astype(np.float32)
    m = np.ones((4, 8, 8, 2), np.float32)
    for bm in [np.array([True, False, True, False]), np.zeros(4, bool)]:
        got = float(
            losses.masked_l1(
                jnp.asarray(y_hat), jnp.asarray(y), jnp.asarray(m), batch_mask=jnp.asarray(bm)
            )
        )
        want = _torch_masked_l1(y_hat, y, m, batch_mask=bm)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-8)


def test_sobel_grad_matches_torch(rng):
    y_hat = rng.rand(2, 16, 16, 3).astype(np.float32)
    y = rng.rand(2, 16, 16, 3).astype(np.float32)
    got = float(losses.grad(jnp.asarray(y_hat), jnp.asarray(y), reduction="mean"))

    gh = torch.tensor([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]]).view(1, 1, 3, 3).repeat(3, 1, 1, 1)
    gv = torch.tensor([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]).view(1, 1, 3, 3).repeat(3, 1, 1, 1)

    def grads(t):
        t = torch.from_numpy(t.transpose(0, 3, 1, 2))
        return torch.cat(
            (F.conv2d(t, gh, padding=1, groups=3), F.conv2d(t, gv, padding=1, groups=3)), dim=1
        )

    want = float(F.l1_loss(grads(y_hat), grads(y), reduction="mean"))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_perceptual_is_mean_of_l1s(rng):
    f1 = [rng.rand(2, 8, 8, 4).astype(np.float32) for _ in range(5)]
    f2 = [rng.rand(2, 8, 8, 4).astype(np.float32) for _ in range(5)]
    got = float(losses.perceptual([jnp.asarray(a) for a in f1], [jnp.asarray(a) for a in f2], weight=0.5))
    want = 0.5 * np.mean([np.abs(a - b).mean() for a, b in zip(f1, f2)])
    np.testing.assert_allclose(got, want, rtol=1e-5)

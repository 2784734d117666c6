"""PSNR/SSIM sanity and closed-form checks."""

import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.ops import measures


def test_psnr_closed_form(rng):
    y = rng.rand(3, 16, 16, 3).astype(np.float32)
    noise = rng.randn(3, 16, 16, 3).astype(np.float32) * 0.05
    y_hat = y + noise
    got = float(measures.psnr(jnp.asarray(y_hat), jnp.asarray(y)))
    per = [10 * np.log10(1.0 / np.mean((y_hat[f] - y[f]) ** 2)) for f in range(3)]
    np.testing.assert_allclose(got, np.mean(per), rtol=1e-4)


def test_psnr_skips_perfect_frames(rng):
    y = rng.rand(2, 8, 8, 3).astype(np.float32)
    y_hat = y.copy()
    y_hat[1] += 0.1
    got = float(measures.psnr(jnp.asarray(y_hat), jnp.asarray(y)))
    want = 10 * np.log10(1.0 / np.mean((y_hat[1] - y[1]) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_identity_is_one(rng):
    y = rng.rand(2, 16, 16, 3).astype(np.float32)
    assert abs(float(measures.ssim(jnp.asarray(y), jnp.asarray(y))) - 1.0) < 1e-5


def test_ssim_decreases_with_noise(rng):
    y = rng.rand(2, 32, 32, 3).astype(np.float32)
    s1 = float(measures.ssim(jnp.asarray(y + 0.01 * rng.randn(*y.shape).astype(np.float32)), jnp.asarray(y)))
    s2 = float(measures.ssim(jnp.asarray(y + 0.2 * rng.randn(*y.shape).astype(np.float32)), jnp.asarray(y)))
    assert 1 > s1 > s2 > 0

"""Parity tests for the fused phase-space tail kernel (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from master_thesis_tpu.models.chn import rrdbnet_tail_forward
from master_thesis_tpu.ops.pallas_tail import (
    make_hybrid_tail,
    rrdbnet_tail_pallas,
    tail_pallas_fits,
)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _tail_params(rng, nf):
    def conv(cin, cout):
        return (
            jnp.asarray(rng.randn(3, 3, cin, cout).astype(np.float32) * 0.2),
            jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1),
        )

    p = {}
    for name, cout in (("upconv1", nf), ("upconv2", nf), ("hr_conv", nf)):
        k, b = conv(nf, cout)
        p[f"{name}_kernel"], p[f"{name}_bias"] = k, b
    k, b = conv(nf, 3)
    p["conv_last_kernel"], p["conv_last_bias"] = k, b
    return p


def test_tail_pallas_matches_xla(rng):
    """The phase-space kernel == rrdbnet_tail_forward (f32, interpret) —
    borders of every virtual resolution included (s=8 -> phases hit every
    edge combination)."""
    nf, s, n = 16, 8, 2
    params = _tail_params(rng, nf)
    y = jnp.asarray(rng.randn(n, s, s, nf).astype(np.float32))
    want = rrdbnet_tail_forward(params, y, jnp.float32)
    got = rrdbnet_tail_pallas(params, y, jnp.float32, interpret=True)
    assert got.shape == (n, 4 * s, 4 * s, 3) == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_hybrid_tail_grads_match_xla(rng):
    """make_hybrid_tail: value (Pallas fwd) and gradients (XLA-remat bwd)
    vs differentiating the XLA tail directly."""
    nf, s, n = 16, 8, 1
    params = _tail_params(rng, nf)
    y = jnp.asarray(rng.randn(n, s, s, nf).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, 4 * s, 4 * s, 3).astype(np.float32))

    tail = make_hybrid_tail(jnp.float32, interpret=True)

    def loss_h(y, p):
        return jnp.vdot(tail(y, p), cot)

    def loss_x(y, p):
        return jnp.vdot(rrdbnet_tail_forward(p, y, jnp.float32), cot)

    got_v, got_g = jax.value_and_grad(loss_h, argnums=(0, 1))(y, params)
    want_v, want_g = jax.value_and_grad(loss_x, argnums=(0, 1))(y, params)
    np.testing.assert_allclose(float(got_v), float(want_v), rtol=1e-5)
    # rtol for the large weight-grad magnitudes: the fused backward sums
    # contributions in a different order than XLA's vjp (f32 noise).
    np.testing.assert_allclose(
        np.asarray(got_g[0]), np.asarray(want_g[0]), rtol=1e-4, atol=1e-4
    )
    for k in want_g[1]:
        np.testing.assert_allclose(
            np.asarray(got_g[1][k]), np.asarray(want_g[1][k]), rtol=1e-4,
            atol=1e-4, err_msg=k,
        )


def test_tail_pallas_rectangular(rng):
    """Non-square tail inputs (the reference tests at 240x480 -> tail grid
    60x120): full-frame and banded paths both match the XLA tail."""
    nf, h, w, n = 16, 6, 10, 1
    params = _tail_params(rng, nf)
    y = jnp.asarray(rng.randn(n, h, w, nf).astype(np.float32))
    want = rrdbnet_tail_forward(params, y, jnp.float32)
    got = rrdbnet_tail_pallas(params, y, jnp.float32, interpret=True)
    assert got.shape == (n, 4 * h, 4 * w, 3) == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)
    banded = rrdbnet_tail_pallas(
        params, y, jnp.float32, interpret=True, band_rows=2
    )
    np.testing.assert_allclose(np.asarray(banded), np.asarray(want), atol=5e-5)


def test_tail_banded_matches_xla(rng):
    """Forced multi-band tail (3 bands of 4 interior rows, 4-row halos
    crossing both frame borders) == rrdbnet_tail_forward."""
    nf, s, n = 16, 12, 2
    params = _tail_params(rng, nf)
    y = jnp.asarray(rng.randn(n, s, s, nf).astype(np.float32))
    want = rrdbnet_tail_forward(params, y, jnp.float32)
    got = rrdbnet_tail_pallas(
        params, y, jnp.float32, interpret=True, band_rows=4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_hybrid_tail_remat_fallback_grads(rng):
    """pallas_bwd=False keeps the XLA-remat backward path working (the
    fallback when the bwd kernel's working set exceeds VMEM)."""
    nf, s, n = 16, 8, 1
    params = _tail_params(rng, nf)
    y = jnp.asarray(rng.randn(n, s, s, nf).astype(np.float32))
    cot = jnp.asarray(rng.randn(n, 4 * s, 4 * s, 3).astype(np.float32))
    tail = make_hybrid_tail(jnp.float32, interpret=True, pallas_bwd=False)
    got = jax.grad(lambda a, p: jnp.vdot(tail(a, p), cot), argnums=(0, 1))(y, params)
    want = jax.grad(
        lambda a, p: jnp.vdot(rrdbnet_tail_forward(p, a, jnp.float32), cot),
        argnums=(0, 1),
    )(y, params)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-4)
    for k in want[1]:
        np.testing.assert_allclose(
            np.asarray(got[1][k]), np.asarray(want[1][k]), rtol=1e-4,
            atol=1e-4, err_msg=k,
        )


def test_tail_fits_thresholds():
    """256² serving (tail input 64²) takes the full-frame kernel; 512²
    (tail input 128²) exceeds it but stays on the kernel via row bands.
    Training at 256² engages the fused backward; larger grids fall back
    to XLA-remat."""
    from master_thesis_tpu.ops.pallas_tail import _tail_band_rows, tail_bwd_fits

    assert tail_pallas_fits(64, 64 * 64)
    assert not tail_pallas_fits(64, 128 * 128)
    assert _tail_band_rows(64, 128) >= 8
    assert tail_bwd_fits(64, 64 * 64)
    assert not tail_bwd_fits(64, 128 * 128)

"""Parity tests for the fused SeparableConv4d kernel (interpret mode) and
the DFPN serving twin against the flax modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from master_thesis_tpu.models.dfpn import DFPN, SeparableConv4d, dfpn_infer_apply
from master_thesis_tpu.ops.pallas_sep4d import conv3x3_stack_tiles


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_conv3x3_stack_matches_flax_convs(rng):
    """The generic fused conv stack equals a chain of flax Convs — odd
    channel counts, multiple tiles, non-divisible grid fallback."""
    from flax import linen as nn

    from master_thesis_tpu.models.nn_ext import Conv

    nt, s, cin = 6, 8, 3
    feats = [5, 7, 4]
    x = jnp.asarray(rng.randn(nt, s, s, cin).astype(np.float32))

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, f in enumerate(feats):
                x = Conv(
                    features=f, kernel_size=(3, 3), padding=(1, 1),
                    name=f"c{i}",
                )(x)
                if i < 2:
                    x = nn.relu(x)
            return x

    mod = Stack()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = mod.apply({"params": params}, x)

    xc = x.reshape(nt, s * s, cin).transpose(0, 2, 1)  # (NT, Cin, hw)
    got = conv3x3_stack_tiles(
        xc,
        [params[f"c{i}"]["kernel"] for i in range(3)],
        [params[f"c{i}"]["bias"] for i in range(3)],
        [True, True, False],
        tile_side=s,
        grid_tiles=4,  # 6 % 4 != 0 -> falls back to 2
        interpret=True,
    )
    got = got.transpose(0, 2, 1).reshape(nt, s, s, feats[-1])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_sep4d_pallas_matches_module(rng):
    """sep4d_apply_pallas == SeparableConv4d.apply (f32, interpret)."""
    from master_thesis_tpu.ops.pallas_sep4d import sep4d_apply_pallas

    b, f, cs = 1, 2, 8
    corr = jnp.asarray(rng.randn(b, f, cs, cs, cs, cs).astype(np.float32))
    mod = SeparableConv4d(dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), corr)["params"]
    want = mod.apply({"params": params}, corr)
    got = sep4d_apply_pallas(
        params, corr, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_mixer_pallas_matches_module(rng):
    """mixer_apply_pallas == AlignmentCorrelationMixer.apply (f32,
    interpret) at production corr_size=16 — exercises the 5x5 taps and
    the narrow-channel stages."""
    from master_thesis_tpu.models.dfpn import AlignmentCorrelationMixer
    from master_thesis_tpu.ops.pallas_sep4d import mixer_apply_pallas

    b, f, cs = 1, 2, 16
    corr = jnp.asarray(
        rng.randn(b, f, cs, cs, cs, cs).astype(np.float32) * 0.5
    )
    mod = AlignmentCorrelationMixer(corr_size=cs, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), corr)["params"]
    want = mod.apply({"params": params}, corr)
    got = mixer_apply_pallas(
        params, corr, corr_size=cs, dtype=jnp.float32, interpret=True
    )
    assert got.shape == want.shape == (b, f, cs, cs, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-5)


def test_conv_stack_banded_matches_flax(rng):
    """The banded big-image conv stack == chained flax Convs — mixed
    5x5/3x3, forced multi-band (halo 3 crossing both borders)."""
    from flax import linen as nn

    from master_thesis_tpu.models.nn_ext import Conv
    from master_thesis_tpu.ops.pallas_sep4d import conv_stack_banded

    n, h, w, cin = 2, 14, 10, 3
    spec = [(5, 6, True), (3, 4, False)]
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32))

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i, (k, feats, relu) in enumerate(spec):
                x = Conv(
                    features=feats, kernel_size=(k, k),
                    padding=(k // 2, k // 2), name=f"c{i}",
                )(x)
                if relu:
                    x = nn.relu(x)
            return x

    mod = Stack()
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    want = mod.apply({"params": params}, x)
    got = conv_stack_banded(
        x,
        [params[f"c{i}"]["kernel"] for i in range(2)],
        [params[f"c{i}"]["bias"] for i in range(2)],
        [True, False],
        band_rows=4,  # 4 bands of a 14-row image, halo 3
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_flow_estimator_pallas_matches_module(rng):
    """flow_estimator_apply_pallas == FlowEstimator.apply at 32² (all
    three downs, all three phase-conv ups, banded segments)."""
    from master_thesis_tpu.models.dfpn import (
        FlowEstimator,
        flow_estimator_apply_pallas,
    )

    b, f, h, w = 1, 2, 32, 32
    mod = FlowEstimator(dtype=jnp.float32)
    x_t = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    m_t = jnp.asarray((rng.rand(b, h, w, 1) > 0.8).astype(np.float32))
    x_r = jnp.asarray(rng.rand(b, f, h, w, 3).astype(np.float32))
    m_r = jnp.asarray((rng.rand(b, f, h, w, 1) > 0.8).astype(np.float32))
    fp = jnp.asarray(rng.randn(b, f, h, w, 2).astype(np.float32) * 0.1)
    params = mod.init(jax.random.PRNGKey(0), x_t, m_t, x_r, m_r, fp)["params"]
    want = mod.apply({"params": params}, x_t, m_t, x_r, m_r, fp)
    got = flow_estimator_apply_pallas(
        params, x_t, m_t, x_r, m_r, fp, dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


@pytest.mark.parametrize(
    "kw",
    [
        dict(),  # r4 default schedule: Pallas c0 + fused mids
        dict(fuse_mids=False, c0_mode="pallas"),
        dict(fuse_mids=False, c0_mode="im2col"),
        dict(fuse_mids=False, c0_mode="xla"),
    ],
    ids=["mids+c0P", "c0-pallas", "c0-im2col", "c0-xla"],
)
def test_flow_estimator_hybrid_matches_module(rng, kw):
    """flow_estimator_apply_hybrid == FlowEstimator.apply at 128² — large
    enough that the fused segments engage (c0 at 128², c6-c7 and c11-c12
    at 32² ≥ the hw=1024 threshold) while c9-c10 at 16² keep XLA,
    exercising both sides of the per-resolution split; parameterized over
    the c0 fusion modes (the in-graph A/B's candidates,
    scripts/measure/dfpn_serving_ab.py)."""
    from master_thesis_tpu.models.dfpn import (
        FlowEstimator,
        flow_estimator_apply_hybrid,
    )

    b, f, h, w = 1, 1, 128, 128
    mod = FlowEstimator(dtype=jnp.float32)
    x_t = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    m_t = jnp.asarray((rng.rand(b, h, w, 1) > 0.8).astype(np.float32))
    x_r = jnp.asarray(rng.rand(b, f, h, w, 3).astype(np.float32))
    m_r = jnp.asarray((rng.rand(b, f, h, w, 1) > 0.8).astype(np.float32))
    fp = jnp.asarray(rng.randn(b, f, h, w, 2).astype(np.float32) * 0.1)
    params = mod.init(jax.random.PRNGKey(0), x_t, m_t, x_r, m_r, fp)["params"]
    want = mod.apply({"params": params}, x_t, m_t, x_r, m_r, fp)
    got = flow_estimator_apply_hybrid(
        params, x_t, m_t, x_r, m_r, fp, dtype=jnp.float32, interpret=True,
        **kw,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_vgg_pool4_hybrid_matches_module(rng):
    """vgg_pool4_hybrid (block-1 fused, blocks 2-4 XLA) == the module's
    pool-4 map (f32, interpret)."""
    from master_thesis_tpu.models.vgg import VGGFeatures, vgg_pool4_hybrid

    vgg = VGGFeatures(dtype=jnp.float32)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    vp = vgg.init(jax.random.PRNGKey(1), x)
    want = vgg.apply(vp, x, normalize_input=False)[3]
    got = vgg_pool4_hybrid(vp["params"], x, dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_vgg_pool4_pallas_matches_module(rng):
    """vgg_pool4_pallas == VGGFeatures.apply(...)[3] (f32, interpret) —
    four banded conv segments + XLA max-pools."""
    from master_thesis_tpu.models.vgg import VGGFeatures, vgg_pool4_pallas

    n, h, w = 1, 64, 64
    x = jnp.asarray(rng.rand(n, h, w, 3).astype(np.float32))
    mod = VGGFeatures()
    variables = mod.init(jax.random.PRNGKey(0), x)
    want = mod.apply(variables, x, normalize_input=False)[3]
    got = vgg_pool4_pallas(
        variables["params"], x, dtype=jnp.float32, interpret=True
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_dfpn_infer_apply_matches_module(rng):
    """The DFPN serving twin (Pallas sep4d, interpret) == DFPN.apply on all
    four outputs at the scaled-down 64 base."""
    base, h, w, b, f = 64, 64, 64, 1, 2
    model = DFPN(dtype=jnp.float32, base_size=base)
    x_t = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
    m_t = jnp.asarray((rng.rand(b, h, w, 1) > 0.8).astype(np.float32))
    x_r = jnp.asarray(rng.rand(b, f, h, w, 3).astype(np.float32))
    m_r = jnp.asarray((rng.rand(b, f, h, w, 1) > 0.8).astype(np.float32))
    cs = base // 16
    f_t = jnp.asarray(rng.randn(b, cs, cs, 512).astype(np.float32))
    f_r = jnp.asarray(rng.randn(b, f, cs, cs, 512).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), x_t, m_t, x_r, m_r, f_t, f_r)
    want = model.apply(variables, x_t, m_t, x_r, m_r, f_t, f_r)
    # Exercise every fused kernel through the twin (the serving defaults
    # keep only the measured winners — the mixer — but the losing kernels
    # stay available behind the flags and must stay correct).
    got = dfpn_infer_apply(
        variables, x_t, m_t, x_r, m_r, f_t, f_r,
        dtype=jnp.float32, base_size=base, interpret=True,
        pallas_sep4d=True, pallas_flow=True,
    )
    assert len(got) == len(want) == 4
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt), atol=2e-4)

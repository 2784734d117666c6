"""DFPN sub-module parity with functional torch forwards."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from master_thesis_tpu.models import convert
from master_thesis_tpu.models.dfpn import (
    AlignmentCorrelationMixer,
    FlowEstimator,
    SeparableConv4d,
    correlation_masked_4d,
)
from tests import torch_ref

CS = 8  # reduced correlation size for test speed (16 in production)


def test_correlation_masked_4d_matches_torch(rng):
    b, f, h, w, c = 2, 3, 6, 6, 12
    t_feats = rng.randn(b, h, w, c).astype(np.float32)
    r_feats = rng.randn(b, f, h, w, c).astype(np.float32)
    v_t = (rng.rand(b, h, w, 1) > 0.3).astype(np.float32)
    v_r = (rng.rand(b, f, h, w, 1) > 0.3).astype(np.float32)

    got = np.asarray(
        correlation_masked_4d(
            jnp.asarray(t_feats), jnp.asarray(v_t), jnp.asarray(r_feats), jnp.asarray(v_r)
        )
    )

    # Torch reference formulation (model_dfpn.py:534-565).
    tt = torch.from_numpy(t_feats.transpose(0, 3, 1, 2)) * torch.from_numpy(
        v_t.transpose(0, 3, 1, 2)
    )
    rr = torch.from_numpy(r_feats.transpose(0, 4, 1, 2, 3)) * torch.from_numpy(
        v_r.transpose(0, 4, 1, 2, 3)
    )
    corr_1 = tt.reshape(b, c, -1).transpose(-1, -2).unsqueeze(1)
    corr_1 = corr_1 / (torch.norm(corr_1, dim=3).unsqueeze(3) + 1e-9)
    corr_2 = rr.reshape(b, c, f, -1).permute(0, 2, 1, 3)
    corr_2 = corr_2 / (torch.norm(corr_2, dim=2).unsqueeze(2) + 1e-9)
    want = torch.matmul(corr_1, corr_2).reshape(b, f, h, w, h, w).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_separable_conv4d_matches_torch(rng):
    sd = {}
    widths_1 = [(128, 1), (256, 128), (256, 256)]
    widths_2 = [(256, 256), (128, 256), (1, 128)]
    for i, (o, ic) in enumerate(widths_1):
        torch_ref.rand_conv_sd(rng, f"corr.conv.conv_1.{2 * i}", o, ic, 3, sd)
    for i, (o, ic) in enumerate(widths_2):
        torch_ref.rand_conv_sd(rng, f"corr.conv.conv_2.{2 * i}", o, ic, 3, sd)

    b, f = 1, 2
    corr = rng.randn(b, f, CS, CS, CS, CS).astype(np.float32) * 0.1
    sep = {m: convert.conv_params(sd, f"corr.{t}") for m, t in convert._SEP4D_MAP.items()}
    got = np.asarray(SeparableConv4d().apply({"params": sep}, jnp.asarray(corr)))

    # Torch forward (model_dfpn.py:607-626).
    x = torch.from_numpy(corr).unsqueeze(4)
    bb, t, h, w, c, *_ = x.size()
    conv = lambda pre, i, v: torch_ref.conv(sd, f"corr.conv.{pre}.{i}", v, padding=1)
    v = x.reshape(-1, c, h, w)
    v = conv("conv_1", 0, v).relu()
    v = conv("conv_1", 2, v).relu()
    v = conv("conv_1", 4, v)
    v = v.reshape(bb, t, h * w, v.size(1), h * w).permute(0, 1, 4, 3, 2)
    v = v.reshape(-1, v.size(3), h, w)
    v = conv("conv_2", 0, v).relu()
    v = conv("conv_2", 2, v).relu()
    v = conv("conv_2", 4, v)
    v = v.reshape(bb, t, h, w, v.size(1), h, w).squeeze(4)
    want = v.permute(0, 1, 4, 5, 2, 3).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_mixer_matches_torch(rng):
    cs = 16  # the mixer's channel schedule requires the production size
    schedule = [
        (cs * cs, cs * cs, 5), (cs * cs, cs * cs, 3), (cs, cs * cs, 3),
        (cs, cs, 5), (cs, cs, 3), (cs // 2, cs, 3),
        (cs // 2, cs // 2, 5), (cs // 2, cs // 2, 3), (cs // 4, cs // 2, 3),
        (cs // 4, cs // 4, 5), (cs // 4, cs // 4, 3), (cs // 8, cs // 4, 3),
        (cs // 8, cs // 8, 5), (cs // 8, cs // 8, 3),
    ]
    sd = {}
    idx = convert._MIXER_IDX
    for j, (o, ic, k) in enumerate(schedule):
        torch_ref.rand_conv_sd(rng, f"corr_mixer.mixer.{idx[j]}", o, ic, k, sd)

    b, f = 1, 2
    corr = rng.randn(b, f, cs, cs, cs, cs).astype(np.float32) * 0.1
    params = {
        f"mixer_{j}": convert.conv_params(sd, f"corr_mixer.mixer.{i}")
        for j, i in enumerate(idx)
    }
    got = np.asarray(
        AlignmentCorrelationMixer(corr_size=cs).apply({"params": params}, jnp.asarray(corr))
    )

    x = torch.from_numpy(corr).reshape(b * f, -1, cs, cs)
    for j, (o, ic, k) in enumerate(schedule):
        x = torch_ref.conv(sd, f"corr_mixer.mixer.{idx[j]}", x, padding=k // 2)
        if j < 11:
            x = x.relu()
    want = x.reshape(b, f, 2, cs, cs).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_flow_estimator_matches_torch(rng):
    sd = {}
    for name, i, kind in convert._FLOWEST_IDX:
        k = 5 if name in ("c0", "c2", "c3", "c6", "c9", "c11", "c13", "c15", "t2") else 3
        in_c = 10 if name == "c0" else 128
        out_c = 2 if name == "c17" else 128
        if kind == "conv":
            torch_ref.rand_conv_sd(rng, f"fe.nn.{i}", out_c, in_c, k, sd)
        else:
            torch_ref.rand_tconv_sd(rng, f"fe.nn.{i}", in_c, out_c, k, sd)
        # Keep per-layer gain ~1 so 21 stacked convs don't blow up the
        # activation scale (and with it the fp32 comparison tolerance).
        sd[f"fe.nn.{i}.weight"] *= 0.3

    b, f, h, w = 1, 2, 16, 16
    x_t = rng.rand(b, h, w, 3).astype(np.float32)
    m_t = (rng.rand(b, h, w, 1) > 0.8).astype(np.float32)
    x_r = rng.rand(b, f, h, w, 3).astype(np.float32)
    m_r = (rng.rand(b, f, h, w, 1) > 0.8).astype(np.float32)
    flow_pre = rng.randn(b, f, h, w, 2).astype(np.float32) * 0.5

    params = convert._flow_estimator_from_torch(sd, "fe")
    got = np.asarray(
        FlowEstimator().apply(
            {"params": params}, jnp.asarray(x_t), jnp.asarray(m_t),
            jnp.asarray(x_r), jnp.asarray(m_r), jnp.asarray(flow_pre),
        )
    )

    # Torch forward (model_dfpn.py:713-743).
    nn_input = torch.cat(
        [
            torch.from_numpy(x_r.reshape(b * f, h, w, 3).transpose(0, 3, 1, 2)),
            torch_ref.nchw(x_t).repeat(f, 1, 1, 1),
            torch.from_numpy(m_r.reshape(b * f, h, w, 1).transpose(0, 3, 1, 2)),
            torch_ref.nchw(m_t).repeat(f, 1, 1, 1),
            torch.from_numpy(flow_pre.reshape(b * f, h, w, 2).transpose(0, 3, 1, 2)),
        ],
        dim=1,
    )
    x = nn_input
    for name, i, kind in convert._FLOWEST_IDX:
        if kind == "conv":
            k = sd[f"fe.nn.{i}.weight"].shape[-1]
            s = 2 if name in ("c2", "c5", "c8") else 1
            x = torch_ref.conv(sd, f"fe.nn.{i}", x, stride=s, padding=k // 2)
        else:
            k = sd[f"fe.nn.{i}.weight"].shape[-1]
            x = torch_ref.tconv(sd, f"fe.nn.{i}", x, stride=2, padding=k // 2, output_padding=1)
        if name != "c17":
            x = x.relu()
    want = x.reshape(b, f, 2, h, w).permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_softmax_3d_matches_torch(rng):
    from master_thesis_tpu.models.dfpn import softmax_3d

    b, f, h = 2, 3, 4
    x = rng.randn(b, f, h, h, h, h).astype(np.float32)
    got = np.asarray(softmax_3d(jnp.asarray(x)))
    # Torch formulation (model_dfpn.py:567-583).
    t = torch.from_numpy(x)
    tt = t.permute(0, 2, 3, 4, 5, 1).reshape(b, h, h, -1)
    tt = F.softmax(tt, dim=3)
    want = tt.reshape(b, h, h, h, h, f).permute(0, 5, 1, 2, 3, 4).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)
    # It is a distribution over (q, f) per target pixel.
    s = got.transpose(0, 2, 3, 1, 4, 5).reshape(b, h, h, -1).sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-5)

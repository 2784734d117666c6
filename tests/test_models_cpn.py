"""CPN aligner parity with a functional torch forward on converted weights."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from master_thesis_tpu.models import convert
from master_thesis_tpu.models.cpn import CPN
from tests import torch_ref

_MEAN = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
_STD = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)


def make_cpn_sd(rng):
    sd = {}
    enc = [("conv12", 64, 4, 5), ("conv2", 64, 64, 3), ("conv23", 128, 64, 3),
           ("conv3", 128, 128, 3), ("conv34", 256, 128, 3), ("conv4a", 256, 256, 3),
           ("conv4b", 256, 256, 3)]
    for name, o, i, k in enc:
        torch_ref.rand_conv_sd(rng, f"module.A_Encoder.{name}.conv.0", o, i, k, sd)
    reg = [("conv45", 512, 512, 3), ("conv5a", 512, 512, 3), ("conv5b", 512, 512, 3),
           ("conv56", 512, 512, 3), ("conv6a", 512, 512, 3), ("conv6b", 512, 512, 3)]
    for name, o, i, k in reg:
        torch_ref.rand_conv_sd(rng, f"module.A_Regressor.{name}.conv.0", o, i, k, sd)
    torch_ref.rand_linear_sd(rng, "module.A_Regressor.fc", 6, 512, sd)
    # Make thetas near-identity so sampling stays mostly in-frame.
    sd["module.A_Regressor.fc.weight"] *= 0.01
    sd["module.A_Regressor.fc.bias"] = torch.tensor([1.0, 0, 0, 0, 1.0, 0])
    return sd


def torch_a_encoder(sd, in_f, in_v):
    x = torch.cat([(in_f - _MEAN) / _STD, in_v], dim=1)
    x = F.interpolate(x, size=(224, 224), mode="bilinear", align_corners=False)
    p = "A_Encoder"
    x = F.relu(torch_ref.conv(sd, f"{p}.conv12.conv.0", x, stride=2, padding=2))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv2.conv.0", x, stride=1, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv23.conv.0", x, stride=2, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv3.conv.0", x, stride=1, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv34.conv.0", x, stride=2, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv4a.conv.0", x, stride=1, padding=1))
    return F.relu(torch_ref.conv(sd, f"{p}.conv4b.conv.0", x, stride=1, padding=1))


def torch_a_regressor(sd, f1, f2):
    p = "A_Regressor"
    x = torch.cat([f1, f2], dim=1)
    x = F.relu(torch_ref.conv(sd, f"{p}.conv45.conv.0", x, stride=2, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv5a.conv.0", x, stride=1, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv5b.conv.0", x, stride=1, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv56.conv.0", x, stride=2, padding=1))
    # Reference quirk: conv5a/conv5b applied again instead of conv6a/conv6b.
    x = F.relu(torch_ref.conv(sd, f"{p}.conv5a.conv.0", x, stride=1, padding=1))
    x = F.relu(torch_ref.conv(sd, f"{p}.conv5b.conv.0", x, stride=1, padding=1))
    x = F.avg_pool2d(x, x.shape[2]).view(-1, x.shape[1])
    return (x @ sd[f"{p}.fc.weight"].T + sd[f"{p}.fc.bias"]).view(-1, 2, 3)


def torch_align(sd, x_target, m_target, x_refs, m_refs):
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    b, c, f, h, w = x_refs.shape
    feat_t = torch_a_encoder(sd, x_target, m_target)
    refs_flat = x_refs.transpose(1, 2).reshape(-1, c, h, w)
    m_flat = m_refs.transpose(1, 2).reshape(-1, 1, h, w)
    feat_r = torch_a_encoder(sd, refs_flat, m_flat)
    feat_t_rep = (
        feat_t.unsqueeze(1).repeat(1, f, 1, 1, 1).reshape(-1, *feat_t.shape[1:])
    )
    theta = torch_a_regressor(sd, feat_t_rep, feat_r)
    grid = F.affine_grid(theta, [theta.size(0), c, h, w], align_corners=False)
    x_aligned = F.grid_sample(refs_flat, grid, align_corners=False)
    v_aligned = (
        F.grid_sample(1 - m_flat, grid, align_corners=False) > 0.5
    ).float()
    v_maps = (
        v_aligned.reshape(b, f, 1, h, w) - (1 - m_target.unsqueeze(1))
    ).clamp(0, 1)
    return (
        x_aligned.reshape(b, f, c, h, w),
        v_aligned.reshape(b, f, 1, h, w),
        v_maps,
    )


def test_cpn_align_matches_torch(rng):
    sd = make_cpn_sd(rng)
    params = {"params": convert.cpn_from_torch(sd)}
    mod = CPN()

    b, f, h, w = 1, 2, 64, 64
    x_t = rng.rand(b, h, w, 3).astype(np.float32)
    m_t = (rng.rand(b, h, w, 1) > 0.8).astype(np.float32)
    x_r = rng.rand(b, f, h, w, 3).astype(np.float32)
    m_r = (rng.rand(b, f, h, w, 1) > 0.8).astype(np.float32)

    xa, va, vm = mod.apply(
        params, jnp.asarray(x_t), jnp.asarray(m_t), jnp.asarray(x_r),
        jnp.asarray(m_r), method=CPN.align,
    )

    t_xa, t_va, t_vm = torch_align(
        sd,
        torch_ref.nchw(x_t),
        torch_ref.nchw(m_t),
        torch.from_numpy(x_r.transpose(0, 4, 1, 2, 3)),
        torch.from_numpy(m_r.transpose(0, 4, 1, 2, 3)),
    )
    np.testing.assert_allclose(
        np.asarray(xa), t_xa.numpy().transpose(0, 1, 3, 4, 2), atol=5e-4
    )
    # Binary maps must agree except possibly at threshold-boundary pixels.
    va_diff = np.abs(np.asarray(va) - t_va.numpy().transpose(0, 1, 3, 4, 2))
    assert va_diff.mean() < 1e-3
    vm_diff = np.abs(np.asarray(vm) - t_vm.numpy().transpose(0, 1, 3, 4, 2))
    assert vm_diff.mean() < 1e-3

"""CHN / RRDBNet parity with a functional torch forward on converted weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from master_thesis_tpu.models import convert
from master_thesis_tpu.models.chn import CHN, RRDBNet
from tests import torch_ref


def make_rrdbnet_sd(rng, in_nc=9, out_nc=3, nb=2, nf=16, gc=8, prefix=""):
    sd = {}
    widths = [in_nc, nf, nf, nf, nf]
    for i in range(5):
        torch_ref.rand_conv_sd(rng, f"{prefix}conv_first.{i}", nf, widths[i], 3, sd)
    for i in range(nb):
        for j in (1, 2, 3):
            ins = [nf, nf + gc, nf + 2 * gc, nf + 3 * gc, nf + 4 * gc]
            outs = [gc, gc, gc, gc, nf]
            for k in range(1, 6):
                torch_ref.rand_conv_sd(
                    rng, f"{prefix}rrdb_trunk.{i}.rdb{j}.conv{k}", outs[k - 1], ins[k - 1], 3, sd
                )
    for name in ("trunk_conv", "upconv1", "upconv2", "hr_conv"):
        torch_ref.rand_conv_sd(rng, f"{prefix}{name}", nf, nf, 3, sd)
    torch_ref.rand_conv_sd(rng, f"{prefix}conv_last", out_nc, nf, 3, sd)
    return sd


def torch_rrdbnet(sd, x, nb=2, prefix=""):
    lrelu = lambda t: F.leaky_relu(t, 0.2)
    c = lambda name, t, s=1: torch_ref.conv(sd, prefix + name, t, stride=s, padding=1)

    y = c("conv_first.0", x)
    y = c("conv_first.1", y)
    y = c("conv_first.2", y, s=2)
    y = c("conv_first.3", y)
    y = c("conv_first.4", y, s=2)

    def rdb(t, pre):
        x1 = lrelu(c(f"{pre}.conv1", t))
        x2 = lrelu(c(f"{pre}.conv2", torch.cat((t, x1), 1)))
        x3 = lrelu(c(f"{pre}.conv3", torch.cat((t, x1, x2), 1)))
        x4 = lrelu(c(f"{pre}.conv4", torch.cat((t, x1, x2, x3), 1)))
        x5 = c(f"{pre}.conv5", torch.cat((t, x1, x2, x3, x4), 1))
        return 0.2 * x5 + t

    trunk = y
    for i in range(nb):
        t = trunk
        for j in (1, 2, 3):
            t = rdb(t, f"rrdb_trunk.{i}.rdb{j}")
        trunk = 0.2 * t + trunk
    y = y + c("trunk_conv", trunk)
    y = lrelu(c("upconv1", F.interpolate(y, scale_factor=2, mode="nearest")))
    y = lrelu(c("upconv2", F.interpolate(y, scale_factor=2, mode="nearest")))
    return c("conv_last", lrelu(c("hr_conv", y)))


def test_rrdbnet_matches_torch(rng):
    nb = 2
    sd = make_rrdbnet_sd(rng, nb=nb)
    x = rng.rand(2, 16, 16, 9).astype(np.float32)
    params = {"params": convert.rrdbnet_from_torch(sd, nb=nb)}
    mod = RRDBNet(out_nc=3, nb=nb, nf=16, gc=8)
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch_ref.nhwc(torch_rrdbnet(sd, torch_ref.nchw(x), nb=nb))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_rrdbnet_matches_torch_composed_head_path(rng):
    """Input large enough to exercise the composed-head + strip path
    (32x32 -> 8x8 trunk: interior + border bands both present)."""
    nb = 1
    sd = make_rrdbnet_sd(rng, nb=nb)
    x = rng.rand(2, 32, 32, 9).astype(np.float32)
    params = {"params": convert.rrdbnet_from_torch(sd, nb=nb)}
    mod = RRDBNet(out_nc=3, nb=nb, nf=16, gc=8)
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch_ref.nhwc(torch_rrdbnet(sd, torch_ref.nchw(x), nb=nb))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_chn_forward_composite(rng):
    """y_hat_comp keeps visible pixels, fills holes with network output."""
    nb = 1
    sd = make_rrdbnet_sd(rng, nb=nb, prefix="nn.")
    params = {"params": convert.chn_from_torch(sd, nb=nb)}
    mod = CHN(nb=nb, nf=16, gc=8)

    b, f, h, w = 1, 2, 16, 16
    x_t = rng.rand(b, h, w, 3).astype(np.float32)
    v_t = np.ones((b, h, w, 1), np.float32)
    v_t[:, 4:8, 4:8] = 0
    x_r = rng.rand(b, f, h, w, 3).astype(np.float32)
    v_r = np.ones((b, f, h, w, 1), np.float32)
    v_m = np.zeros((b, f, h, w, 1), np.float32)

    y_hat, y_hat_comp = mod.apply(
        {"params": params["params"]}, jnp.asarray(x_t), jnp.asarray(v_t),
        jnp.asarray(x_r), jnp.asarray(v_r), jnp.asarray(v_m),
    )
    assert y_hat.shape == (b, f, h, w, 3)
    got = np.asarray(y_hat_comp)
    # Visible region comes straight from the target frame.
    np.testing.assert_allclose(got[0, 0][v_t[0, :, :, 0] == 1], x_t[0][v_t[0, :, :, 0] == 1], atol=1e-6)
    # y_hat is clamped to [0, 1].
    assert np.asarray(y_hat).min() >= 0 and np.asarray(y_hat).max() <= 1

"""Functional torch helpers used by parity tests.

These build random *torch-layout* state dicts and run compact functional
forwards, so flax modules + converters can be validated end-to-end without
torchvision or the reference package.
"""

import numpy as np
import torch
import torch.nn.functional as F


def rand_conv_sd(rng, prefix, out_c, in_c, k, sd=None, bias=True):
    sd = {} if sd is None else sd
    sd[f"{prefix}.weight"] = torch.from_numpy(
        (rng.randn(out_c, in_c, k, k) * 0.1).astype(np.float32)
    )
    if bias:
        sd[f"{prefix}.bias"] = torch.from_numpy(
            (rng.randn(out_c) * 0.1).astype(np.float32)
        )
    return sd


def rand_tconv_sd(rng, prefix, in_c, out_c, k, sd=None):
    sd = {} if sd is None else sd
    sd[f"{prefix}.weight"] = torch.from_numpy(
        (rng.randn(in_c, out_c, k, k) * 0.1).astype(np.float32)
    )
    sd[f"{prefix}.bias"] = torch.from_numpy(
        (rng.randn(out_c) * 0.1).astype(np.float32)
    )
    return sd


def rand_linear_sd(rng, prefix, out_c, in_c, sd=None):
    sd = {} if sd is None else sd
    sd[f"{prefix}.weight"] = torch.from_numpy(
        (rng.randn(out_c, in_c) * 0.1).astype(np.float32)
    )
    sd[f"{prefix}.bias"] = torch.from_numpy(
        (rng.randn(out_c) * 0.1).astype(np.float32)
    )
    return sd


def conv(sd, prefix, x, stride=1, padding=1, dilation=1):
    return F.conv2d(
        x, sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"), stride=stride,
        padding=padding, dilation=dilation,
    )


def tconv(sd, prefix, x, stride=2, padding=1, output_padding=1):
    return F.conv_transpose2d(
        x, sd[f"{prefix}.weight"], sd.get(f"{prefix}.bias"), stride=stride,
        padding=padding, output_padding=output_padding,
    )


def nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def nchw(a):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a).transpose(0, 3, 1, 2)))

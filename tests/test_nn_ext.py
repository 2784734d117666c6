"""Conv / ConvTranspose layer parity with torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch.nn.functional as F

from master_thesis_tpu.models import convert
from master_thesis_tpu.models.nn_ext import Conv, ConvTranspose2dTorch
from tests import torch_ref


@pytest.mark.parametrize("k,s,p", [(3, 1, 1), (5, 2, 2), (3, 2, 1), (5, 1, 2)])
def test_conv_matches_torch(rng, k, s, p):
    sd = torch_ref.rand_conv_sd(rng, "c", 8, 4, k)
    x = rng.rand(2, 16, 16, 4).astype(np.float32)
    mod = Conv(features=8, kernel_size=(k, k), strides=(s, s), padding=(p, p))
    params = {"params": convert.conv_params(sd, "c")}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch_ref.nhwc(torch_ref.conv(sd, "c", torch_ref.nchw(x), stride=s, padding=p))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_conv_dilated_matches_torch(rng):
    sd = torch_ref.rand_conv_sd(rng, "c", 4, 4, 3)
    x = rng.rand(1, 20, 20, 4).astype(np.float32)
    mod = Conv(features=4, kernel_size=(3, 3), padding=(4, 4), dilation=(4, 4))
    params = {"params": convert.conv_params(sd, "c")}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch_ref.nhwc(
        torch_ref.conv(sd, "c", torch_ref.nchw(x), padding=4, dilation=4)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


# (3,1,1) and (5,2,1) are the DFPN geometries (exact-2x -> phase-conv path);
# (3,1,0) is not an exact 2x upsample and keeps the dilated fallback covered.
@pytest.mark.parametrize("k,p,op", [(3, 1, 1), (5, 2, 1), (3, 1, 0)])
def test_conv_transpose_matches_torch(rng, k, p, op):
    sd = torch_ref.rand_tconv_sd(rng, "t", 6, 5, k)
    x = rng.rand(2, 9, 11, 6).astype(np.float32)
    mod = ConvTranspose2dTorch(
        features=5, kernel_size=(k, k), strides=(2, 2), padding=(p, p),
        output_padding=(op, op),
    )
    params = {"params": convert.conv_transpose_params(sd, "t")}
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch_ref.nhwc(
        torch_ref.tconv(sd, "t", torch_ref.nchw(x), stride=2, padding=p, output_padding=op)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)

"""LPIPS perceptual metric in flax (TPU analog of the ``lpips`` package the
reference uses for evaluation, utils.py:450-463, __main__.py:27).

AlexNet variant: 5 conv-feature slices, per-channel unit normalization,
learned 1x1 linear heads, spatial mean, summed across slices. Inputs are
images in [0, 1]; the reference feeds ``2*y - 1`` (utils.py:461) and this
module does that internally via :func:`lpips_distance`.

Weights convert from the torch ecosystem: the AlexNet trunk from a
torchvision ``alexnet`` state dict, the linear heads from the lpips
package's ``alex.pth`` (keys ``lin{i}.model.1.weight``). Without converted
weights the metric still runs (random heads) for pipeline plumbing, but its
values are meaningless — the trainer logs it only when weights are given.
"""

from __future__ import annotations

from typing import Dict, List, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from master_thesis_tpu.models.nn_ext import Conv

# lpips.ScalingLayer constants (inputs in [-1, 1]).
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

_ALEX_CHANNELS = (64, 192, 384, 256, 256)


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet ``features`` tower, returning the 5 post-ReLU maps."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        c = lambda f, k, s, p, name: Conv(
            features=f, kernel_size=(k, k), strides=(s, s), padding=(p, p),
            dtype=self.dtype, name=name,
        )
        feats = []
        x = nn.relu(c(64, 11, 4, 2, "conv0")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(c(192, 5, 1, 2, "conv1")(x))
        feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(c(384, 3, 1, 1, "conv2")(x))
        feats.append(x)
        x = nn.relu(c(256, 3, 1, 1, "conv3")(x))
        feats.append(x)
        x = nn.relu(c(256, 3, 1, 1, "conv4")(x))
        feats.append(x)
        return feats


class LPIPS(nn.Module):
    """Learned perceptual distance between two image batches (NHWC, [-1, 1])."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, dtype=x.dtype)
        scale = jnp.asarray(_SCALE, dtype=x.dtype)
        net = AlexNetFeatures(dtype=self.dtype, name="net")
        fx = net((x - shift) / scale)
        fy = net((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a.astype(jnp.float32), axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b.astype(jnp.float32), axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2  # (N, h, w, C)
            lin = Conv(
                features=1, kernel_size=(1, 1), use_bias=False,
                dtype=jnp.float32, name=f"lin{i}",
            )
            total = total + jnp.mean(lin(d), axis=(1, 2, 3))  # spatial mean
        return total  # (N,)


def lpips_distance(apply_fn, params, y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean LPIPS over a batch of [0, 1] images (reference utils.py:450-463)."""
    d = apply_fn(params, 2 * y_hat - 1, 2 * y - 1)
    return jnp.mean(d)


def lpips_from_torch(alexnet_sd: Mapping, lins_sd: Mapping) -> Dict:
    """Builds LPIPS params from a torchvision alexnet state dict + the lpips
    package's linear-head state dict (``lin{i}.model.1.weight``)."""
    from master_thesis_tpu.models.convert import conv_params

    net = {
        f"conv{i}": conv_params(alexnet_sd, f"features.{idx}")
        for i, idx in enumerate((0, 3, 6, 8, 10))
    }
    lins = {}
    for i in range(5):
        key = f"lin{i}.model.1.weight"
        w = lins_sd[key]
        w = w.detach().cpu().numpy() if hasattr(w, "detach") else w
        lins[f"lin{i}"] = {"kernel": w.transpose(2, 3, 1, 0).astype("float32")}
    return {"net": net, **lins}

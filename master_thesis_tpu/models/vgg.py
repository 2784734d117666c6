"""VGG-16 pool-feature extractor in flax (TPU analog of reference
model_vgg.py:11-67).

Returns the five post-MaxPool feature maps; pool-4 (index 3) feeds DFPN's
correlation volume (reference model_dfpn.py:516-517) and all five feed the
CHN perceptual loss (reference utils.py:171-191). Features are treated as
frozen: callers wrap calls in ``jax.lax.stop_gradient`` where the reference
detaches (the extractor itself holds no trainable state in any train step).

Weights convert 1:1 from a torchvision ``vgg16`` state dict via
``models.convert.vgg16_from_torch`` (conv kernels OIHW -> HWIO).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
from flax import linen as nn

from master_thesis_tpu.models.nn_ext import Conv

# torchvision cfg 'D': conv widths with 'M' max-pool separators.
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std over the trailing RGB channel axis."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return (x - mean) / std


def denormalize_imagenet(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
    std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
    return x * std + mean


class VGGFeatures(nn.Module):
    """VGG-16 feature tower returning the 5 post-pool maps (NHWC)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, normalize_input: bool = True
    ) -> List[jnp.ndarray]:
        if normalize_input:
            x = normalize_imagenet(x)
        x = x.astype(self.dtype)
        pool_feats = []
        conv_idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                pool_feats.append(x)
            else:
                x = Conv(
                    features=v,
                    kernel_size=(3, 3),
                    padding=(1, 1),
                    dtype=self.dtype,
                    name=f"conv_{conv_idx}",
                )(x)
                x = nn.relu(x)
                conv_idx += 1
        return pool_feats

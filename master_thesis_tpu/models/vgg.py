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


def vgg_pool4_pallas(
    params: dict,
    x: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """VGG-16 features through pool-4 on fused banded conv stacks — the
    DFPN correlation's feature extractor (reference model_dfpn.py:516).

    ``x``: ``(N, H, W, 3)`` ALREADY ImageNet-normalized (the align path
    normalizes via ``prepare_vgg_input`` and calls with
    ``normalize_input=False``). Each between-pools conv segment runs as
    one banded Pallas stack (ops/pallas_sep4d.py:conv_stack_banded);
    max-pools stay XLA. Returns the ``(N, H/16, W/16, 512)`` pool-4 map.
    """
    from master_thesis_tpu.ops.pallas_sep4d import conv_stack_banded

    x = x.astype(dtype)
    for lo, hi in ((0, 2), (2, 4), (4, 7), (7, 10)):
        ks = [params[f"conv_{i}"]["kernel"] for i in range(lo, hi)]
        bs = [params[f"conv_{i}"]["bias"] for i in range(lo, hi)]
        x = conv_stack_banded(
            x, ks, bs, [True] * len(ks), interpret=interpret
        )
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
    return x


def vgg_pool4_hybrid(
    params: dict,
    x: jnp.ndarray,
    dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pool-4 features with block 1 rewritten as a phase-s2d conv +
    phase max; blocks 2-4 stay plain XLA convs. A measured r4 CANDIDATE,
    NOT production: in-graph it LOST (full align 75.8 vs 67.2 ms,
    scripts/measure/dfpn_serving_ab.py), like every other block-1
    candidate — the standalone attribution that showed block 1 at
    4.18 ms / ~29 TFLOP/s (align_inner_decomp.py) was a jit-boundary
    artifact; in context XLA already runs it near its floor. Kept
    in-tree, parity-tested, for future compiler/silicon re-flips.

    The rewrite itself: conv1_2 as an exact phase-s2d regrouping
    (``nn_ext.conv_phase_s2d``: Cin 64→256, Cout 64→256 at 128²) whose
    phase-packed output makes the following 2×2 max-pool a free max over
    the phase groups — no un-shuffle, no 256²·64 map materialized.
    ``x`` ALREADY ImageNet-normalized. ``interpret`` is accepted for
    signature parity with ``vgg_pool4_pallas`` (no Pallas here).
    """
    from master_thesis_tpu.models.nn_ext import conv_phase_s2d

    x = x.astype(dtype)
    x = nn.relu(
        Conv(
            features=64, kernel_size=(3, 3), padding=(1, 1), dtype=dtype
        ).apply({"params": params["conv_0"]}, x)
    )
    y4 = conv_phase_s2d(
        x, params["conv_1"]["kernel"], 2, 1, 1, dtype, shuffle_out=False
    )
    y4 = nn.relu(y4 + jnp.tile(params["conv_1"]["bias"], 4))
    n, h4, w4, _ = y4.shape
    x = jnp.max(y4.reshape(n, h4, w4, 4, 64), axis=3)
    conv_idx = 2
    for v in VGG16_CFG[3:14]:  # blocks 2-4 of cfg 'D' (through the 4th 'M')
        if v == "M":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        else:
            x = nn.relu(
                Conv(
                    features=v, kernel_size=(3, 3), padding=(1, 1),
                    dtype=dtype,
                ).apply({"params": params[f"conv_{conv_idx}"]}, x)
            )
            conv_idx += 1
    return x


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

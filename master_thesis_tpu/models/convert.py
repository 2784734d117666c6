"""Checkpoint converters: torch state dicts -> flax param trees.

One-time converters for the three external weight sources the reference
loads (SURVEY §5.4): torchvision VGG-16 (model_vgg.py:56-65), the CPN
``weight.pth`` with its ``module.`` DataParallel prefixes
(model_cpn.py:105-118), and LPIPS-AlexNet. Also converts full reference
DFPN/CHN Lightning checkpoints so torch-trained models run here unchanged.

Torch is imported lazily — it is only needed when actually converting.

Layout rules:
    - Conv2d weight ``(O, I, kh, kw)`` -> HWIO ``(kh, kw, I, O)``.
    - ConvTranspose2d weight ``(I, O, kh, kw)`` -> ``(kh, kw, I, O)``.
    - Linear weight ``(O, I)`` -> ``(I, O)``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def conv_params(sd: Mapping, prefix: str, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Torch Conv2d ``{prefix}.weight/bias`` -> flax Conv params.

    ``dtype``: checkpoints convert to float32 (the default); the f64
    backward/trajectory parity tests pass ``np.float64`` to keep the torch
    doubles lossless."""
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    out = {"kernel": w.astype(dtype)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(dtype)
    return out


def conv_transpose_params(sd: Mapping, prefix: str, dtype=np.float32) -> Dict[str, np.ndarray]:
    """Torch ConvTranspose2d -> ConvTranspose2dTorch params (I kept on axis 2)."""
    w = _np(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)
    out = {"kernel": w.astype(dtype)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(dtype)
    return out


def dense_params(sd: Mapping, prefix: str, dtype=np.float32) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T.astype(dtype)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"]).astype(dtype)
    return out


def strip_module_prefix(sd: Mapping) -> Dict:
    """Removes DataParallel ``module.`` prefixes (reference model_cpn.py:111-113)."""
    return {k.replace("module.", ""): v for k, v in sd.items()}


# ---------------------------------------------------------------------------
# VGG-16
# ---------------------------------------------------------------------------

# Conv positions inside torchvision's vgg16 ``features`` Sequential.
_VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]


def vgg16_from_torch(sd: Mapping, dtype=np.float32) -> Dict:
    """torchvision vgg16 state dict -> VGGFeatures params."""
    return {
        f"conv_{j}": conv_params(sd, f"features.{idx}", dtype=dtype)
        for j, idx in enumerate(_VGG16_CONV_IDX)
    }


# ---------------------------------------------------------------------------
# CPN
# ---------------------------------------------------------------------------

_CPN_AENC = ["conv12", "conv2", "conv23", "conv3", "conv34", "conv4a", "conv4b"]
_CPN_AREG = ["conv45", "conv5a", "conv5b", "conv56"]
_CPN_ENC = ["conv12", "conv2", "conv23", "conv3", "value3"]
_CPN_DEC = [
    "conv4", "conv5_1", "conv5_2", "convA4_1", "convA4_2", "convA4_3",
    "convA4_4", "conv3c", "conv3b", "conv3a", "conv32", "conv2", "conv21",
]


def cpn_from_torch(sd: Mapping) -> Dict:
    """CPN ``weight.pth`` -> flax CPN params (A_Encoder + A_Regressor).

    The torch modules wrap each conv in ``Conv2d(...).conv`` Sequential, so
    keys look like ``A_Encoder.conv12.conv.0.weight``. Dead conv6a/conv6b
    regressor weights are dropped (see models/cpn.py docstring).
    """
    sd = strip_module_prefix(sd)
    a_enc = {
        name: conv_params(sd, f"A_Encoder.{name}.conv.0") for name in _CPN_AENC
    }
    a_reg = {
        name: conv_params(sd, f"A_Regressor.{name}.conv.0") for name in _CPN_AREG
    }
    a_reg["fc"] = dense_params(sd, "A_Regressor.fc")
    return {"A_Encoder": a_enc, "A_Regressor": a_reg}


def cpn_aux_from_torch(sd: Mapping) -> Dict:
    """The unused CPN context-matching weights (Encoder/Decoder), if wanted."""
    sd = strip_module_prefix(sd)
    enc = {name: conv_params(sd, f"Encoder.{name}.conv.0") for name in _CPN_ENC}
    dec = {name: conv_params(sd, f"Decoder.{name}.conv.0") for name in _CPN_DEC}
    return {"Encoder": enc, "Decoder": dec}


# ---------------------------------------------------------------------------
# CHN / RRDBNet
# ---------------------------------------------------------------------------


def rrdbnet_from_torch(sd: Mapping, prefix: str = "", nb: int = 20, dtype=np.float32) -> Dict:
    """Torch RRDBNet (reference model_chn.py:506-555) -> flax RRDBNet params."""
    p = prefix
    out: Dict = {}
    for i in range(5):
        cp = conv_params(sd, f"{p}conv_first.{i}", dtype=dtype)
        out[f"conv_first_{i}_kernel"] = cp["kernel"]
        out[f"conv_first_{i}_bias"] = cp["bias"]
    for i in range(nb):
        blk = {}
        for j in (1, 2, 3):
            rdb = {}
            for k in range(1, 6):
                cp = conv_params(sd, f"{p}rrdb_trunk.{i}.rdb{j}.conv{k}", dtype=dtype)
                rdb[f"conv{k}_kernel"] = cp["kernel"]
                rdb[f"conv{k}_bias"] = cp["bias"]
            blk[f"rdb{j}"] = rdb
        out[f"rrdb_{i}"] = blk
    for name in ("trunk_conv", "upconv1", "upconv2", "hr_conv", "conv_last"):
        cp = conv_params(sd, f"{p}{name}", dtype=dtype)
        out[f"{name}_kernel"] = cp["kernel"]
        out[f"{name}_bias"] = cp["bias"]
    return out


def chn_from_torch(sd: Mapping, nb: int = 20, dtype=np.float32) -> Dict:
    """Reference CHN Lightning checkpoint state dict -> flax CHN params."""
    return {"nn": rrdbnet_from_torch(sd, prefix="nn.", nb=nb, dtype=dtype)}


# ---------------------------------------------------------------------------
# DFPN
# ---------------------------------------------------------------------------

_SEP4D_MAP = {
    "conv1_0": "conv.conv_1.0",
    "conv1_1": "conv.conv_1.2",
    "conv1_2": "conv.conv_1.4",
    "conv2_0": "conv.conv_2.0",
    "conv2_1": "conv.conv_2.2",
    "conv2_2": "conv.conv_2.4",
}

# Conv positions inside the reference mixer Sequential (model_dfpn.py:638-660):
# 11 convs each followed by ReLU, then 3 bare convs.
_MIXER_IDX = [0, 2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 23, 24]

# FlowEstimator Sequential (model_dfpn.py:686-711): conv/transpose positions.
_FLOWEST_IDX = [
    ("c0", 0, "conv"), ("c1", 2, "conv"), ("c2", 4, "conv"), ("c3", 6, "conv"),
    ("c4", 8, "conv"), ("c5", 10, "conv"), ("c6", 12, "conv"), ("c7", 14, "conv"),
    ("c8", 16, "conv"), ("c9", 18, "conv"), ("c10", 20, "conv"),
    ("t0", 22, "tconv"), ("c11", 24, "conv"), ("c12", 26, "conv"),
    ("t1", 28, "tconv"), ("c13", 30, "conv"), ("c14", 32, "conv"),
    ("t2", 34, "tconv"), ("c15", 36, "conv"), ("c16", 38, "conv"),
    ("c17", 40, "conv"),
]


def _flow_estimator_from_torch(sd: Mapping, prefix: str) -> Dict:
    out = {}
    for name, idx, kind in _FLOWEST_IDX:
        fn = conv_params if kind == "conv" else conv_transpose_params
        out[name] = fn(sd, f"{prefix}.nn.{idx}")
    return out


def dfpn_from_torch(sd: Mapping) -> Dict:
    """Reference DFPN Lightning checkpoint state dict -> flax DFPN params."""
    sep4d = {mine: conv_params(sd, f"corr.{theirs}") for mine, theirs in _SEP4D_MAP.items()}
    mixer = {
        f"mixer_{j}": conv_params(sd, f"corr_mixer.mixer.{idx}")
        for j, idx in enumerate(_MIXER_IDX)
    }
    return {
        "separable4d": sep4d,
        "mixer": mixer,
        "flow_64": _flow_estimator_from_torch(sd, "flow_64"),
        "flow_256": _flow_estimator_from_torch(sd, "flow_256"),
    }


def load_torch_checkpoint(path: str) -> Dict:
    """Loads a ``.pth``/``.ckpt`` file into a flat numpy state dict."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    return {k: _np(v) for k, v in dict(data).items()}

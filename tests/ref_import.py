"""Imports the ACTUAL reference package (/root/reference/master_thesis) for
end-to-end parity tests.

The image lacks some of the reference's dependencies (pytorch_lightning,
torchvision, skimage, jpeg4py). Parity tests only exercise forward paths
(CPN.align / CHN.forward / DFPN.forward), so the missing packages are
registered as minimal import-time stubs:

- ``pytorch_lightning``: LightningModule == nn.Module (the reference models
  only use it as a base class on the forward paths).
- ``torchvision.models.vgg``: just enough to build the torch VGG-16 feature
  Sequential (the standard cfg-D layer recipe) that
  reference model_vgg.py:47-67 constructs via ``make_layers(cfgs['D'])``.
- ``skimage`` / ``jpeg4py``: import-time placeholders (only reached by the
  movement simulator / data loader, which these tests don't run).
"""

from __future__ import annotations

import os
import sys
import types

REF_PATH = "/root/reference"

VGG16_CFG_D = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512, "M"]


def _stub(name: str) -> types.ModuleType:
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REF_PATH, "master_thesis"))


def load_reference():
    if "master_thesis" in sys.modules:
        return sys.modules["master_thesis"]

    import torch.nn as nn

    try:
        import pytorch_lightning  # noqa: F401
    except ImportError:
        pl = _stub("pytorch_lightning")

        class LightningModule(nn.Module):
            pass

        class LightningDataModule:
            pass

        pl.LightningModule = LightningModule
        pl.LightningDataModule = LightningDataModule

    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = _stub("torchvision")
        tvm = _stub("torchvision.models")
        tvv = _stub("torchvision.models.vgg")
        tv.models = tvm
        tvm.vgg = tvv

        class VGG(nn.Module):
            def __init__(self, features, **kwargs):
                super().__init__()
                self.features = features

        def make_layers(cfg, batch_norm=False):
            layers, in_c = [], 3
            for v in cfg:
                if v == "M":
                    layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
                else:
                    layers.append(nn.Conv2d(in_c, v, kernel_size=3, padding=1))
                    if batch_norm:
                        layers.append(nn.BatchNorm2d(v))
                    layers.append(nn.ReLU(inplace=True))
                    in_c = v
            return nn.Sequential(*layers)

        for mod in (tvm, tvv):
            mod.VGG = VGG
            mod.make_layers = make_layers
            mod.cfgs = {"D": list(VGG16_CFG_D)}
            mod.model_urls = {"vgg16": ""}

    try:
        import skimage  # noqa: F401
    except ImportError:
        sk = _stub("skimage")
        sk.metrics = _stub("skimage.metrics")
        sk.transform = _stub("skimage.transform")

    try:
        import jpeg4py  # noqa: F401
    except ImportError:
        _stub("jpeg4py").JPEG = None

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import master_thesis  # noqa: E402

    return master_thesis

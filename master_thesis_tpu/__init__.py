"""TPU-native video-inpainting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``davidalvarezdlt/master_thesis`` ("Temporal copying and local hallucination
for video inpainting"): the DFPN dense-flow aligner, the CHN
copy-and-hallucinate network, the frozen CPN affine aligner, the
GOT-10k/YouTube-VOS/DAVIS data pipeline, and the three full-video inpainting
algorithms — all TPU-first (NHWC layouts, jitted train steps, device meshes,
fused Pallas kernels for the warp/correlation hot loops).

Public API mirrors the reference's re-exports (reference:
master_thesis/__init__.py:1-12) while exposing the TPU-native components.
"""

from master_thesis_tpu.config import Config
from master_thesis_tpu.ops import flows, interp, losses, measures, movements, transforms
from master_thesis_tpu.ops.grid_sample import grid_sample

__all__ = [
    "Config",
    "flows",
    "interp",
    "losses",
    "measures",
    "movements",
    "transforms",
    "grid_sample",
    # models / data / infer are importable as subpackages:
    #   from master_thesis_tpu.models import CHN, CPN, DFPN, VGGFeatures
    #   from master_thesis_tpu.data import prepare_data, Loader
    #   from master_thesis_tpu.infer import Inpainter
]

__version__ = "0.1.0"

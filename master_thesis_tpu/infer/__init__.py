"""Full-video inference: the three inpainting algorithms + video writing."""

from master_thesis_tpu.infer.algorithms import (  # noqa: F401
    Inpainter,
    get_indexes_ff,
    get_indexes_ip,
)
from master_thesis_tpu.infer.video import write_video  # noqa: F401

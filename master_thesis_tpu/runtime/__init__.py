"""Native host runtime (C++): JPEG/PNG decode for the data pipeline."""

from master_thesis_tpu.runtime.native import (  # noqa: F401
    decode_jpeg,
    decode_mask_png,
    is_available,
    jpeg_scale_num,
)

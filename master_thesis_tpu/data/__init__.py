"""Host-side data subsystem: metadata scanners + prefetching pipeline."""

from master_thesis_tpu.data.meta import (  # noqa: F401
    clean_masks_meta,
    get_meta_davis,
    get_meta_got10k,
    get_meta_youtube_vos,
    load_data_checkpoint,
    prepare_data,
    save_data_checkpoint,
)
from master_thesis_tpu.data.pipeline import (  # noqa: F401
    ContentProvider,
    InpaintingDataset,
    Loader,
)

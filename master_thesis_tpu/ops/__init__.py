"""Pure-function ops library (the TPU-native analog of reference utils.py)."""

from master_thesis_tpu.ops import (  # noqa: F401
    flows,
    interp,
    losses,
    measures,
    movements,
    pallas_rrdb,
    pallas_sep4d,
    pallas_tail,
    transforms,
)

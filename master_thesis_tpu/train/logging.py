"""TensorBoard logging + per-step timing (SURVEY §5.1/§5.5).

The reference logs scalars/images through Lightning's TensorBoard logger
(model_dfpn.py:396-456, model_chn.py:393-422). Here a thin tensorboardX
writer does the same, plus a step-time tracker and optional
``jax.profiler`` traces — the profiling subsystem the reference lacks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


class Logger:
    def __init__(self, version_dir: str):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(version_dir)

    def log_scalars(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        for k, v in scalars.items():
            self.writer.add_scalar(f"{prefix}{k}", float(v), step)

    def log_images(self, tag: str, images: np.ndarray, step: int):
        """images: (N, H, W, C) float in [0, 1]."""
        self.writer.add_images(tag, images, step, dataformats="NHWC")

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()


class StepTimer:
    """Tracks steady-state step time (compile excluded via warmup skips)."""

    def __init__(self, skip_first: int = 2):
        self.skip_first = skip_first
        self.times = []
        self._last = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.skip_first:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")


@contextlib.contextmanager
def maybe_profile(profile_dir: Optional[str]):
    """jax.profiler trace around a region when a directory is configured."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

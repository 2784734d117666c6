"""Logging/profiling subsystem: TB writer, step timer, profiler hook."""

import glob
import os

import numpy as np

from master_thesis_tpu.train.logging import Logger, StepTimer, maybe_profile


def test_logger_writes_event_files(tmp_path):
    logger = Logger(str(tmp_path))
    logger.log_scalars({"loss": 1.5, "psnr": 30.0}, step=1, prefix="training/")
    logger.log_images("frames/1", np.random.rand(2, 8, 8, 3).astype(np.float32), 1)
    logger.flush()
    logger.close()
    assert glob.glob(os.path.join(str(tmp_path), "events.out*"))


def test_step_timer_skips_warmup():
    import time

    t = StepTimer(skip_first=1)
    for _ in range(4):
        t.tick()
        time.sleep(0.01)
    # Lower bound is semantic (sleep floor); no tight upper bound — a loaded
    # machine can stretch a 10 ms sleep arbitrarily and this test is about
    # warmup skipping, not wall-clock accuracy.
    assert 0.005 < t.mean < 5.0
    assert len(t.times) == 2  # 4 ticks -> 3 intervals, first skipped


def test_maybe_profile_noop_and_trace(tmp_path):
    with maybe_profile(None):
        pass  # no-op path
    import jax
    import jax.numpy as jnp

    with maybe_profile(str(tmp_path)):
        jnp.ones(4).sum().block_until_ready()
    # jax profiler writes a plugins/profile tree
    assert glob.glob(os.path.join(str(tmp_path), "**", "*"), recursive=True)

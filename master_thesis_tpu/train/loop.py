"""Training loop (TPU analog of ``trainer.fit`` in the reference,
__main__.py:49/:58).

Epoch structure matches the reference schedule: ``train_max_iterations``
train steps + ``validation_max_iterations`` validation steps per epoch
(reference data.py:364-366), TensorBoard scalars per step group, an orbax
checkpoint per epoch, and StepLR decay handled inside the optimizer
schedule (train/state.py).

TPU specifics: batches are device_put with DP(+SP) shardings before the
jitted step (parallel/mesh.py); the loop overlaps host prefetch with device
compute (the Loader threads decode batch k+1 while the TPU runs step k, and
dispatch is async — we only block on the scalar fetch for logging).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import numpy as np

from master_thesis_tpu.parallel import make_mesh, shard_batch
from master_thesis_tpu.train.checkpoint import Checkpointer, next_version_dir
from master_thesis_tpu.train.logging import Logger, StepTimer, maybe_profile


class Trainer:
    """Generic epoch loop; tasks supply jitted steps + batch adapters."""

    def __init__(self, cfg, task_name: str):
        self.cfg = cfg
        self.version_dir = next_version_dir(cfg.default_root_dir)
        self.logger = Logger(self.version_dir)
        self.checkpointer = Checkpointer(self.version_dir)
        self.mesh = make_mesh(cfg.mesh_data, cfg.mesh_model)
        self.task_name = task_name
        print(f"[{task_name}] logging to {self.version_dir}, mesh "
              f"{dict(zip(self.mesh.axis_names, self.mesh.devices.shape))}")

    def fit(
        self,
        state,
        train_step: Callable,
        step_args: Callable,
        train_loader,
        eval_step: Optional[Callable] = None,
        eval_args: Optional[Callable] = None,
        val_loader=None,
        extra_ckpt: Optional[Dict] = None,
    ):
        cfg = self.cfg
        timer = StepTimer()
        global_step = int(state.step)
        with maybe_profile(cfg.profile_dir):
            for epoch in range(cfg.max_epochs):
                for batch in train_loader:
                    batch = shard_batch(batch, self.mesh)
                    state, items = train_step(state, *step_args(batch))
                    timer.tick()
                    global_step += 1
                    if global_step % 50 == 0 or global_step == 1:
                        scalars = {k: float(v) for k, v in items.items()}
                        scalars["step_time_s"] = timer.mean
                        self.logger.log_scalars(scalars, global_step, "training/")
                        print(f"[{self.task_name}] epoch {epoch} step {global_step} "
                              f"loss {scalars['loss']:.4f} ({timer.mean * 1e3:.0f} ms/step)")

                if eval_step is not None and val_loader is not None:
                    agg: Dict[str, list] = {}
                    for batch in val_loader:
                        batch = shard_batch(batch, self.mesh)
                        out = eval_step(state.params, *eval_args(batch))
                        items = out[0] if isinstance(out, tuple) else out
                        for k, v in items.items():
                            agg.setdefault(k, []).append(float(v))
                    val_scalars = {k: float(np.mean(v)) for k, v in agg.items()}
                    self.logger.log_scalars(val_scalars, global_step, "validation/")
                    print(f"[{self.task_name}] epoch {epoch} validation "
                          + " ".join(f"{k}={v:.4f}" for k, v in val_scalars.items()))

                payload = {"params": state.params, "opt_state": state.opt_state,
                           "step": np.asarray(global_step)}
                if extra_ckpt:
                    payload.update(extra_ckpt)
                self.checkpointer.save(global_step, payload)
                self.logger.flush()
        return state

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

    @property
    def ref_sharding(self):
        """Sharding for the in-step (B, F-1) reference stacks when the mesh
        has a model axis (sequence parallelism); None for pure DP. Pass to
        {chn,dfpn}_task.make_train_step so --mesh_model takes effect."""
        if self.cfg.mesh_model <= 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec as P

        return NamedSharding(self.mesh, P("data", "model"))

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
        steps_per_epoch = len(train_loader) if hasattr(train_loader, "__len__") \
            else cfg.train_max_iterations
        # val_check_interval (pl.Trainer semantics): int > 1 = every N train
        # steps; float < 1 = that fraction of the epoch; 1.0 (default) =
        # end-of-epoch only (end-of-epoch validation always runs).
        vci = float(cfg.val_check_interval)
        if vci > 1:
            val_every = int(vci)
        elif vci < 1.0:
            val_every = max(1, int(vci * steps_per_epoch))
        else:
            val_every = None
        # Resume: continue the epoch count from the restored step so
        # max_epochs means total epochs, as Lightning resume does.
        start_epoch = min(cfg.max_epochs, global_step // max(1, steps_per_epoch))
        with maybe_profile(cfg.profile_dir):
            for epoch in range(start_epoch, cfg.max_epochs):
                step_in_epoch = 0
                for batch in train_loader:
                    # Batches enter DP-sharded; with mesh_model > 1 the train
                    # step's ref_sharding constraint re-shards the (B, F-1)
                    # reference stacks over ('data', 'model') — the full
                    # frames axis is odd (target + refs) and can't shard.
                    batch = shard_batch(batch, self.mesh)
                    state, items = train_step(state, *step_args(batch))
                    timer.tick()
                    global_step += 1
                    step_in_epoch += 1
                    if global_step % 50 == 0 or global_step == 1:
                        scalars = {k: float(v) for k, v in items.items()}
                        scalars["step_time_s"] = timer.mean
                        self.logger.log_scalars(scalars, global_step, "training/")
                        print(f"[{self.task_name}] epoch {epoch} step {global_step} "
                              f"loss {scalars['loss']:.4f} ({timer.mean * 1e3:.0f} ms/step)")
                    if (
                        val_every is not None
                        and step_in_epoch % val_every == 0
                        and step_in_epoch < steps_per_epoch
                    ):
                        self._validate(state, eval_step, eval_args, val_loader,
                                       epoch, global_step)

                self._validate(state, eval_step, eval_args, val_loader,
                               epoch, global_step)
                payload = {"params": state.params, "opt_state": state.opt_state,
                           "step": np.asarray(global_step)}
                if extra_ckpt:
                    payload.update(extra_ckpt)
                self.checkpointer.save(global_step, payload)
                self.logger.flush()
        return state

    def _validate(self, state, eval_step, eval_args, val_loader, epoch, global_step):
        if eval_step is None or val_loader is None:
            return
        # limit_val_batches (pl.Trainer semantics): 0 disables validation;
        # int > 1 = batch count; float < 1 = fraction of the val epoch.
        lvb = float(self.cfg.limit_val_batches)
        if lvb <= 0:
            return
        n_total = len(val_loader) if hasattr(val_loader, "__len__") \
            else self.cfg.validation_max_iterations
        max_batches = int(lvb) if lvb > 1 else (
            n_total if lvb == 1.0 else max(1, int(lvb * n_total))
        )
        agg: Dict[str, list] = {}
        for i, batch in enumerate(val_loader):
            if i >= max_batches:
                break
            batch = shard_batch(batch, self.mesh)
            out = eval_step(state.params, *eval_args(batch))
            items = out[0] if isinstance(out, tuple) else out
            for k, v in items.items():
                agg.setdefault(k, []).append(float(v))
        val_scalars = {k: float(np.mean(v)) for k, v in agg.items()}
        self.logger.log_scalars(val_scalars, global_step, "validation/")
        print(f"[{self.task_name}] epoch {epoch} validation "
              + " ".join(f"{k}={v:.4f}" for k, v in val_scalars.items()))

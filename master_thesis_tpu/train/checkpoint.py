"""Orbax checkpointing (TPU analog of Lightning's .ckpt auto-save,
SURVEY §5.4).

Layout mirrors Lightning's versioned ``lightning_logs/version_N`` scheme
(reference README.md:74-76) so runs are organized the same way:

    {root}/version_{n}/checkpoints/step_{k}/   (orbax tree)
    {root}/version_{n}/events.out...           (tensorboard)

Saved payload: params, opt_state, step, and the config dict — enough to
resume training or to load for inference. External torch checkpoints go
through models/convert.py instead.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def next_version_dir(root: str) -> str:
    os.makedirs(root, exist_ok=True)
    existing = [
        int(os.path.basename(p).split("_")[1])
        for p in glob.glob(os.path.join(root, "version_*"))
        if os.path.basename(p).split("_")[-1].isdigit()
    ]
    version = max(existing) + 1 if existing else 0
    path = os.path.join(root, f"version_{version}")
    os.makedirs(path, exist_ok=True)
    return path


class Checkpointer:
    def __init__(self, version_dir: str, keep: int = 3):
        self.dir = os.path.abspath(os.path.join(version_dir, "checkpoints"))
        self.mngr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
        )

    def save(self, step: int, payload: Any) -> None:
        payload = jax.tree.map(np.asarray, payload)
        self.mngr.save(step, args=ocp.args.StandardSave(payload))
        self.mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = self.mngr.latest_step() if step is None else step
        if step is None:
            return None
        if template is not None:
            template = jax.tree.map(np.asarray, template)
            return self.mngr.restore(step, args=ocp.args.StandardRestore(template))
        return self.mngr.restore(step)

    @property
    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()


def restore_train_state(state, path: str):
    """Full training resume: params + optimizer state + step restored into
    an existing TrainState (Lightning-resume semantics — the reference's
    ``resume_from_checkpoint`` restores Adam moments and the LR-schedule
    position too, reference __main__.py:33-42). The fresh state supplies
    the pytree template, so the checkpoint must come from the same model
    and optimizer configuration."""
    import jax.numpy as jnp

    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(int(state.step)),
    }
    restored = restore_from_path(path, template=template)
    return state.replace(
        params=jax.tree.map(jnp.asarray, restored["params"]),
        opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32),
    )


def restore_from_path(path: str, template: Any = None) -> Any:
    """Restores a single orbax checkpoint directory (a ``step_k`` path or a
    ``checkpoints`` root, in which case the latest step is used)."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, "checkpoints")):
        path = os.path.join(path, "checkpoints")  # a version_N dir
    if os.path.isdir(path) and any(
        p.isdigit() for p in os.listdir(path) if not p.startswith(".")
    ):
        mngr = ocp.CheckpointManager(path)
        step = mngr.latest_step()
        if template is not None:
            template = jax.tree.map(np.asarray, template)
            return mngr.restore(step, args=ocp.args.StandardRestore(template))
        return mngr.restore(step)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        template = jax.tree.map(np.asarray, template)
        return ckptr.restore(path, template)
    return ckptr.restore(path)

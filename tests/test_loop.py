"""Trainer loop: epochs, logging, checkpoints with a stub task."""

import glob
import os

import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.config import Config
from master_thesis_tpu.train import state as state_lib
from master_thesis_tpu.train.loop import Trainer


class _StubLoader:
    def __init__(self, n):
        self.n = n

    def __iter__(self):
        for i in range(self.n):
            yield {"x": np.full((4, 2), float(i), np.float32)}

    def __len__(self):
        return self.n


def test_trainer_fit_runs_epochs_and_checkpoints(tmp_path, rng):
    cfg = Config(
        max_epochs=2, default_root_dir=str(tmp_path), lr=1e-2, mesh_data=1,
    )
    params = {"w": jnp.asarray(rng.randn(2).astype(np.float32))}
    state = state_lib.create_train_state(None, params, cfg, steps_per_epoch=3)

    def train_step(state, x):
        grads = {"w": jnp.mean(x, axis=0)}
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": jnp.mean(x)}

    def eval_step(params, x):
        return {"loss": jnp.mean(x) + 1}

    trainer = Trainer(cfg, "stub")
    out_state = trainer.fit(
        state, train_step, lambda b: (b["x"],), _StubLoader(3),
        eval_step=eval_step, eval_args=lambda b: (b["x"],),
        val_loader=_StubLoader(2),
    )
    assert int(out_state.step) == 6  # 2 epochs x 3 steps
    ckpts = glob.glob(os.path.join(trainer.version_dir, "checkpoints", "*"))
    assert len(ckpts) == 2
    assert glob.glob(os.path.join(trainer.version_dir, "events.out*"))

"""Trainer loop: epochs, logging, checkpoints with a stub task."""

import glob
import os

import jax
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


def _stub_task():
    def train_step(state, x):
        grads = {"w": jnp.mean(x, axis=0)}
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": jnp.mean(x)}

    return train_step


def test_trainer_resume_matches_uninterrupted(tmp_path, rng):
    """CLI-style resume (restore_train_state from a Trainer checkpoint)
    reproduces the uninterrupted parameter trajectory exactly — including
    Adam moments and the schedule position (VERDICT r1 item 3)."""
    from master_thesis_tpu.train.checkpoint import restore_train_state

    w0 = rng.randn(2).astype(np.float32)
    train_step = _stub_task()

    def fit(cfg, state, root):
        trainer = Trainer(cfg, "stub")
        return trainer, trainer.fit(state, train_step, lambda b: (b["x"],), _StubLoader(3))

    # Uninterrupted: 2 epochs.
    cfg_a = Config(max_epochs=2, default_root_dir=str(tmp_path / "a"), lr=1e-2,
                   lr_scheduler_step_size=1, lr_scheduler_gamma=0.5, mesh_data=1)
    st = state_lib.create_train_state(None, {"w": jnp.asarray(w0)}, cfg_a, steps_per_epoch=3)
    _, st_full = fit(cfg_a, st, "a")
    assert int(st_full.step) == 6

    # Interrupted: 1 epoch, then resume into a FRESH state for 2 total.
    cfg_b1 = cfg_a.replace(max_epochs=1, default_root_dir=str(tmp_path / "b"))
    st = state_lib.create_train_state(None, {"w": jnp.asarray(w0)}, cfg_b1, steps_per_epoch=3)
    trainer_b, st_half = fit(cfg_b1, st, "b")
    assert int(st_half.step) == 3

    cfg_b2 = cfg_a.replace(default_root_dir=str(tmp_path / "b2"))
    fresh = state_lib.create_train_state(None, {"w": jnp.asarray(w0)}, cfg_b2, steps_per_epoch=3)
    resumed = restore_train_state(fresh, os.path.join(trainer_b.version_dir, "checkpoints"))
    assert int(resumed.step) == 3
    np.testing.assert_allclose(np.asarray(resumed.params["w"]),
                               np.asarray(st_half.params["w"]), atol=0)
    _, st_resumed = fit(cfg_b2, resumed, "b2")
    assert int(st_resumed.step) == 6  # ran exactly one more epoch
    np.testing.assert_allclose(np.asarray(st_resumed.params["w"]),
                               np.asarray(st_full.params["w"]), atol=1e-7)
    # Adam moments resumed too.
    for a, b in zip(jax.tree.leaves(st_resumed.opt_state), jax.tree.leaves(st_full.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_val_check_interval_and_limit_val_batches(tmp_path, rng):
    """pl.Trainer semantics: int val_check_interval > 1 validates every N
    train steps (plus end of epoch); limit_val_batches caps the val loop."""
    eval_calls = []

    def eval_step(params, x):
        eval_calls.append(float(x[0, 0]))
        return {"loss": jnp.mean(x)}

    cfg = Config(max_epochs=1, default_root_dir=str(tmp_path), lr=1e-2,
                 mesh_data=1, val_check_interval=2.0, limit_val_batches=1.0)
    st = state_lib.create_train_state(
        None, {"w": jnp.asarray(rng.randn(2).astype(np.float32))}, cfg, steps_per_epoch=5)
    Trainer(cfg, "stub").fit(
        st, _stub_task(), lambda b: (b["x"],), _StubLoader(5),
        eval_step=eval_step, eval_args=lambda b: (b["x"],), val_loader=_StubLoader(3),
    )
    # validations after steps 2 and 4 (mid-epoch) + end of epoch = 3 runs x 3 batches
    assert len(eval_calls) == 9

    eval_calls.clear()
    cfg = cfg.replace(val_check_interval=1.0, limit_val_batches=2)
    st = state_lib.create_train_state(
        None, {"w": jnp.asarray(rng.randn(2).astype(np.float32))}, cfg, steps_per_epoch=5)
    Trainer(cfg, "stub").fit(
        st, _stub_task(), lambda b: (b["x"],), _StubLoader(5),
        eval_step=eval_step, eval_args=lambda b: (b["x"],), val_loader=_StubLoader(3),
    )
    assert len(eval_calls) == 2  # one end-of-epoch validation, capped at 2 batches

    eval_calls.clear()
    cfg = cfg.replace(limit_val_batches=0.0)
    st = state_lib.create_train_state(
        None, {"w": jnp.asarray(rng.randn(2).astype(np.float32))}, cfg, steps_per_epoch=5)
    Trainer(cfg, "stub").fit(
        st, _stub_task(), lambda b: (b["x"],), _StubLoader(5),
        eval_step=eval_step, eval_args=lambda b: (b["x"],), val_loader=_StubLoader(3),
    )
    assert not eval_calls  # 0 disables validation (pl semantics)


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

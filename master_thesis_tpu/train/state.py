"""Train state + optimizer (TPU analog of reference configure_optimizers).

Adam with the reference's StepLR schedule — lr decays by ``gamma`` every
``step_size`` *epochs* (reference model_dfpn.py:295-308, data.py:367-369) —
expressed as an optax step-count schedule so it lives inside the jitted
update with no host round-trip.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def step_lr_schedule(
    lr: float, step_size_epochs: int, gamma: float, steps_per_epoch: int
) -> optax.Schedule:
    """StepLR: ``lr * gamma ** (epoch // step_size)`` with epoch derived
    from the global step count."""

    def schedule(count):
        epoch = count // steps_per_epoch
        return lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(cfg, steps_per_epoch: int) -> optax.GradientTransformation:
    """Adam + StepLR, with the pl.Trainer behaviors the reference exposes
    through its CLI (reference __main__.py:69): global-norm gradient
    clipping (``gradient_clip_val``) and gradient accumulation
    (``accumulate_grad_batches``). With accumulation the schedule counts
    *optimizer* updates, so steps_per_epoch shrinks by k — the LR decays on
    the same epoch boundaries either way."""
    k = max(1, int(getattr(cfg, "accumulate_grad_batches", 1)))
    schedule = step_lr_schedule(
        cfg.lr, cfg.lr_scheduler_step_size, cfg.lr_scheduler_gamma,
        max(1, steps_per_epoch // k),
    )
    # torch.optim.Adam defaults (betas 0.9/0.999, eps 1e-8), as the
    # reference uses (model_dfpn.py:302).
    adam = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    clip = float(getattr(cfg, "gradient_clip_val", 0.0) or 0.0)
    tx = optax.chain(optax.clip_by_global_norm(clip), adam) if clip > 0 else adam
    if k > 1:
        # Lightning semantics: clip the *accumulated* gradient, then step.
        tx = optax.MultiSteps(tx, every_k_schedule=k)
    return tx


def create_train_state(apply_fn, params, cfg, steps_per_epoch: int) -> TrainState:
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        apply_fn=apply_fn,
        tx=tx,
    )

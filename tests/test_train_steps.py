"""Jitted train steps: loss decreases, grads flow only into the trainable
model, StepLR schedule matches the reference's decay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from master_thesis_tpu.config import Config
from master_thesis_tpu.models.chn import CHN
from master_thesis_tpu.models.vgg import VGGFeatures
from master_thesis_tpu.train import chn_task, state as state_lib


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = Config(lr=1e-3, lr_scheduler_step_size=2, lr_scheduler_gamma=0.5)
    h = w = 32
    chn = CHN(nb=1, nf=16, gc=8)
    z = jnp.zeros
    chn_params = chn.init(
        jax.random.PRNGKey(0), z((1, h, w, 3)), z((1, h, w, 1)),
        z((1, 1, h, w, 3)), z((1, 1, h, w, 1)), z((1, 1, h, w, 1)),
    )
    vgg = VGGFeatures()
    vgg_params = vgg.init(jax.random.PRNGKey(1), z((1, h, w, 3)))

    def vgg_apply(x, normalize_input=True):
        return vgg.apply(vgg_params, x, normalize_input=normalize_input)

    def identity_align(x_t, m_t, x_r, m_r):
        v_aligned = 1 - m_r
        v_map = jnp.clip(v_aligned - (1 - m_t[:, None]), 0, 1)
        return x_r, v_aligned, v_map

    return cfg, chn, chn_params, vgg_apply, identity_align


def _batch(rng, b=2, f=3, h=32, w=32):
    y = rng.rand(b, f, h, w, 3).astype(np.float32)
    m = np.zeros((b, f, h, w, 1), np.float32)
    m[:, :, 10:20, 10:20] = 1
    x = (1 - m) * y + m * np.asarray([0.485, 0.456, 0.406], np.float32)
    return jnp.asarray(x), jnp.asarray(m), jnp.asarray(y)


def test_chn_train_step_decreases_loss(rng, tiny_setup):
    cfg, chn, chn_params, vgg_apply, align = tiny_setup
    # The train step donates the state's buffers; never hand it the shared
    # fixture params directly.
    st = state_lib.create_train_state(
        chn.apply, jax.tree.map(jnp.copy, chn_params), cfg, steps_per_epoch=10
    )
    step = chn_task.make_train_step(chn.apply, align, vgg_apply)
    x, m, y = _batch(rng)
    losses = []
    for _ in range(8):
        st, items = step(st, x, m, y)
        losses.append(float(items["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_chn_eval_step_metrics(rng, tiny_setup):
    cfg, chn, chn_params, vgg_apply, align = tiny_setup
    eval_step = chn_task.make_eval_step(chn.apply, align, vgg_apply)
    x, m, y = _batch(rng)
    items, y_hat_comp = eval_step(chn_params, x, m, y)
    assert set(chn_task.LOSSES_NAMES) <= set(items)
    assert np.isfinite(float(items["psnr"]))
    assert -1 <= float(items["ssim"]) <= 1
    assert y_hat_comp.shape == (2, 2, 32, 32, 3)


def test_step_lr_schedule():
    sched = state_lib.step_lr_schedule(1e-4, step_size_epochs=50, gamma=0.5, steps_per_epoch=100)
    assert sched(0) == pytest.approx(1e-4)
    assert sched(49 * 100) == pytest.approx(1e-4)
    assert sched(50 * 100) == pytest.approx(5e-5)
    assert sched(100 * 100) == pytest.approx(2.5e-5)


def test_grads_do_not_touch_aligner(rng, tiny_setup):
    """The aligner is frozen: training must not change its closure output."""
    cfg, chn, chn_params, vgg_apply, align = tiny_setup
    st = state_lib.create_train_state(
        chn.apply, jax.tree.map(jnp.copy, chn_params), cfg, steps_per_epoch=10
    )
    step = chn_task.make_train_step(chn.apply, align, vgg_apply)
    x, m, y = _batch(rng)
    before = jax.tree.map(lambda a: a.copy(), st.params)
    st2, _ = step(st, x, m, y)
    changed = jax.tree.reduce(
        lambda acc, pair: acc or bool(np.any(pair)),
        jax.tree.map(lambda a, b: np.asarray(a != b).any(), before, st2.params),
        False,
    )
    assert changed  # CHN params do move

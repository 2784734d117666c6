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


def test_accumulate_grad_batches_matches_mean_grad_step():
    """k micro-batches accumulate to one optimizer update on the mean
    gradient (Lightning accumulate_grad_batches semantics)."""
    w0 = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    st_acc = state_lib.create_train_state(
        None, {"w": w0}, Config(lr=1e-2, accumulate_grad_batches=2), steps_per_epoch=10
    )
    st_one = state_lib.create_train_state(
        None, {"w": w0}, Config(lr=1e-2), steps_per_epoch=5
    )
    g1 = {"w": jnp.asarray([1.0, 2.0, -3.0, 4.0])}
    g2 = {"w": jnp.asarray([3.0, -2.0, 1.0, 0.0])}

    st_acc = st_acc.apply_gradients(g1)
    np.testing.assert_array_equal(np.asarray(st_acc.params["w"]), np.asarray(w0))
    st_acc = st_acc.apply_gradients(g2)

    g_mean = {"w": (g1["w"] + g2["w"]) / 2}
    st_one = st_one.apply_gradients(g_mean)
    np.testing.assert_allclose(
        np.asarray(st_acc.params["w"]), np.asarray(st_one.params["w"]), atol=1e-7
    )


def test_gradient_clip_val_wires_global_norm_clip():
    """cfg.gradient_clip_val reaches the optimizer chain: two-step
    trajectories with and without clipping diverge, and the clipped one
    matches a hand-built optax chain."""
    import optax

    w0 = jnp.asarray([1.0, -2.0, 0.5, 3.0])
    cfg = Config(lr=1e-2, gradient_clip_val=1.0)
    st_clip = state_lib.create_train_state(None, {"w": w0}, cfg, steps_per_epoch=10)
    st_raw = state_lib.create_train_state(
        None, {"w": w0}, Config(lr=1e-2), steps_per_epoch=10
    )
    sched = state_lib.step_lr_schedule(1e-2, cfg.lr_scheduler_step_size,
                                       cfg.lr_scheduler_gamma, 10)
    tx_ref = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adam(sched, b1=0.9, b2=0.999, eps=1e-8))
    ref_params = {"w": w0}
    ref_opt = tx_ref.init(ref_params)

    for g in ({"w": jnp.asarray([10.0, 0.0, 0.0, 0.0])},
              {"w": jnp.asarray([0.1, -0.2, 0.3, -0.4])}):
        st_clip = st_clip.apply_gradients(g)
        st_raw = st_raw.apply_gradients(g)
        updates, ref_opt = tx_ref.update(g, ref_opt, ref_params)
        ref_params = optax.apply_updates(ref_params, updates)

    assert not np.allclose(np.asarray(st_clip.params["w"]), np.asarray(st_raw.params["w"]))
    np.testing.assert_allclose(
        np.asarray(st_clip.params["w"]), np.asarray(ref_params["w"]), atol=1e-7
    )


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

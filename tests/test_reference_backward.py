"""Backward + optimizer-trajectory parity against the ACTUAL reference.

Forward activations and all 11 composite-loss scalars are pinned in
tests/test_reference_parity.py; these tests pin the other half of the
training math — gradients and the optimizer trajectory:

- ``d(total CHN loss)/d(generator params)`` vs torch autograd through the
  full graph (normalize -> RRDBNet with every exact TPU regrouping ->
  denorm/clamp -> composite -> 5-part loss, reference model_chn.py:44-85 +
  :324-376), including the reference's gradient-DEAD perceptual term: the
  reference VGG detaches its pool features (model_vgg.py:43), so the
  perceptual loss only logs. The test asserts that detach semantics
  directly (VGG grads are None in torch) and relies on
  ``chn_task.compute_loss(perceptual_grad=False)`` matching it.
- ``d(total DFPN loss)/d(DFPN params)`` vs torch autograd through the
  reference's own ``_train_val_wrapper`` + ``compute_loss``
  (model_dfpn.py:210-394): correlation/sep4d/mixer/flow-estimator
  backwards plus the analytic grid-sample warp VJP (ops/grid_sample.py)
  under torch's subgradient conventions, through the real 256² cascade.
- A 4-step Adam + StepLR trajectory with identical init and batches:
  the reference's training math (forward/loss of model_chn.py:256-307 +
  ``torch.optim.Adam`` + ``StepLR`` from ``configure_optimizers``,
  model_chn.py:378-391 ≡ model_dfpn.py:295-308) vs our
  ``chn_task.make_train_step`` + ``train/state.py`` optimizer. Run in
  float64 on BOTH sides so noise-dominated gradient signs cannot fake a
  mismatch, across a StepLR decay boundary. The optimizer/schedule layer
  (train/state.py) is shared verbatim by the DFPN train step and DFPN's
  backward is pinned by the gradient test above, so this trajectory pins
  the full chain for both models (the DFPN cascade is hardwired to 256²,
  model_dfpn.py:74-81, which is impractically slow in f64 on this 1-core
  CPU host).
"""

import contextlib

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from master_thesis_tpu.models import convert
from tests.ref_import import load_reference, reference_available
from tests.test_reference_parity import _inputs, _nfhwc, _nhwc, _ref_vgg_from

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@contextlib.contextmanager
def _ref_losses_double(ref):
    """The reference's Sobel kernels are float32 CLASS attributes
    (utils.py:131-136) that ``Module.double()`` cannot reach; swap them to
    f64 for the duration of an f64 run and restore after."""
    lu = ref.LossesUtils
    saved = (lu._GRAD_H, lu._GRAD_V)
    lu._GRAD_H, lu._GRAD_V = saved[0].double(), saved[1].double()
    try:
        yield
    finally:
        lu._GRAD_H, lu._GRAD_V = saved


def _tree_assert_close(got, want, rtol, atol):
    got_leaves = jax.tree_util.tree_flatten_with_path(got)[0]
    want_leaves = jax.tree_util.tree_flatten_with_path(want)[0]
    assert len(got_leaves) == len(want_leaves)
    for (pg, g), (pw, w) in zip(got_leaves, want_leaves):
        assert pg == pw
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=rtol, atol=atol,
            err_msg=jax.tree_util.keystr(pg),
        )


def test_chn_backward_matches_reference(ref, rng):
    """d(total loss)/d(params) through the full CHN graph vs torch autograd
    on identical inputs and converted weights (frames_n=2). Float64 on both
    sides: at f32 the exact head/RDB regroupings change summation order and
    the accumulated backward noise reaches ~0.5% on cancellation-heavy
    leaves (conv_first biases), masking real mismatches; in f64 the
    comparison is tight to ~1e-8."""
    import torchvision.models.vgg as tvv

    from master_thesis_tpu.models.chn import CHN
    from master_thesis_tpu.models.vgg import VGGFeatures
    from master_thesis_tpu.train import chn_task

    torch.manual_seed(6)
    vgg_t = ref.VGGFeatures(tvv.make_layers(tvv.cfgs["D"]), "cpu").double().eval()
    chn_t = ref.CHN(vgg_t, None, None).double()
    sd = {k: v.detach().clone() for k, v in chn_t.state_dict().items()}

    b, f, h, w = 1, 1, 64, 64
    x_t, m_t, x_r, _ = (t.double() for t in _inputs(rng, b, f, h, w))
    v_t = 1 - m_t
    v_r = torch.from_numpy((rng.rand(b, 1, f, h, w) > 0.3).astype(np.float64))
    v_m = torch.clamp(v_r - v_t.unsqueeze(2), 0, 1)
    y_t = torch.from_numpy(rng.rand(b, 3, h, w))

    with _ref_losses_double(ref):
        y_hat, y_hat_comp = chn_t(x_t, v_t, x_r, v_r, v_m)
        loss_t, _ = chn_t.compute_loss(y_t, v_t, y_hat, y_hat_comp, v_m)
        loss_t.backward()

    # The reference's perceptual term is gradient-dead: the VGG extractor
    # detaches every pool feature (model_vgg.py:43), so no gradient reaches
    # the VGG weights (nor, through them, the generator).
    assert all(
        p.grad is None
        for n, p in chn_t.named_parameters()
        if n.startswith("model_vgg")
    )
    grads_t = convert.chn_from_torch(
        {k: p.grad for k, p in chn_t.named_parameters() if p.grad is not None},
        nb=20, dtype=np.float64,
    )

    jax.config.update("jax_enable_x64", True)
    try:
        chn = CHN(nb=20, dtype=jnp.float64)
        params = {"params": convert.chn_from_torch(sd, nb=20, dtype=np.float64)}
        vgg = VGGFeatures(dtype=jnp.float64)
        vgg_params = {"params": convert.vgg16_from_torch(
            {k: v for k, v in vgg_t.state_dict().items()}, dtype=np.float64
        )}

        def vgg_apply(xx, normalize_input=True):
            return vgg.apply(vgg_params, xx, normalize_input=normalize_input)

        x_t_j, v_t_j = jnp.asarray(_nhwc(x_t)), jnp.asarray(_nhwc(v_t))
        x_r_j, v_r_j = jnp.asarray(_nfhwc(x_r)), jnp.asarray(_nfhwc(v_r))
        v_m_j, y_t_j = jnp.asarray(_nfhwc(v_m)), jnp.asarray(_nhwc(y_t))

        def loss_fn(p):
            y_hat_j, y_comp_j = chn.apply(p, x_t_j, v_t_j, x_r_j, v_r_j, v_m_j)
            total, _ = chn_task.compute_loss(
                y_t_j, v_t_j, y_hat_j, y_comp_j, v_m_j, vgg_apply
            )
            return total

        total_j, grads_j = jax.value_and_grad(loss_fn)(params)
        total_j = float(total_j)
        grads_j = jax.device_get(grads_j["params"]["nn"])
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_allclose(total_j, float(loss_t.detach()), atol=1e-10)
    _tree_assert_close(grads_j, grads_t["nn"], rtol=1e-6, atol=1e-9)


def test_dfpn_backward_matches_reference(ref, rng):
    """d(total loss)/d(params) through the reference's _train_val_wrapper +
    compute_loss (forward + pyramids + predicted-flow warps + 6-part loss)
    vs torch autograd, at the real 256² cascade geometry."""
    import torchvision.models.vgg as tvv

    from master_thesis_tpu.models.dfpn import DFPN
    from master_thesis_tpu.train import dfpn_task

    torch.manual_seed(8)
    vgg_t = ref.VGGFeatures(tvv.make_layers(tvv.cfgs["D"]), "cpu").eval()
    dfpn_t = ref.DFPN(vgg_t)
    sd = {k: v.detach().clone() for k, v in dfpn_t.state_dict().items()}
    _, vgg_apply = _ref_vgg_from(vgg_t)

    b, f, h, w = 1, 2, 256, 256
    x = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    m = torch.from_numpy((rng.rand(b, 1, f, h, w) > 0.85).astype(np.float32))
    y = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    ident = np.stack([gx, gy], axis=-1)[None, None]
    flow_gt_np = (
        ident + 0.03 * rng.rand(b, f, h, w, 2) - 0.015
    ).astype(np.float32)
    flow_gt = torch.from_numpy(flow_gt_np)
    flows_use = torch.tensor([True])

    t, r_list = ref.DFPN.get_indexes(f)
    wrapped = dfpn_t._train_val_wrapper(x, m, y, flow_gt, flows_use, t, r_list)
    loss_t, _ = dfpn_t.compute_loss(*wrapped, t, r_list)
    loss_t.backward()
    assert all(
        p.grad is None
        for n, p in dfpn_t.named_parameters()
        if n.startswith("model_vgg")
    )
    grads_t = convert.dfpn_from_torch(
        {k: p.grad for k, p in dfpn_t.named_parameters() if p.grad is not None}
    )

    dfpn = DFPN()
    params = {"params": convert.dfpn_from_torch(sd)}
    x_j, m_j, y_j = jnp.asarray(_nfhwc(x)), jnp.asarray(_nfhwc(m)), jnp.asarray(_nfhwc(y))
    flow_gt_j = jnp.asarray(flow_gt_np)
    flows_use_j = jnp.asarray(np.asarray([True]))

    def loss_fn(p):
        total, _ = dfpn_task.forward_and_loss(
            lambda pp, *a: dfpn.apply(pp, *a), p, vgg_apply,
            x_j, m_j, y_j, flow_gt_j, flows_use_j, base_size=256,
        )
        return total

    total_j, grads_j = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(total_j), float(loss_t.detach()), atol=3e-4)
    _tree_assert_close(grads_j["params"], grads_t, rtol=1e-3, atol=1e-5)


def test_chn_adam_trajectory_matches_reference(ref, rng):
    """4 Adam+StepLR steps, identical init and batches, float64 both sides:
    the reference training math vs make_train_step + train/state.py. The
    StepLR decay boundary sits mid-trajectory (step_size=2 'epochs' with one
    step per epoch), so schedule semantics are pinned too."""
    import torchvision.models.vgg as tvv

    from master_thesis_tpu.config import Config
    from master_thesis_tpu.models.chn import CHN
    from master_thesis_tpu.models.vgg import VGGFeatures
    from master_thesis_tpu.train import chn_task
    from master_thesis_tpu.train import state as state_lib

    torch.manual_seed(9)
    vgg_t = ref.VGGFeatures(tvv.make_layers(tvv.cfgs["D"]), "cpu").double().eval()
    chn_t = ref.CHN(vgg_t, None, None).double()
    sd = {k: v.detach().clone() for k, v in chn_t.state_dict().items()}

    steps, b, fn, h, w = 4, 1, 2, 64, 64
    batches = []
    for _ in range(steps):
        x = rng.rand(b, 3, fn, h, w)
        m = (rng.rand(b, 1, fn, h, w) > 0.85).astype(np.float64)
        y = rng.rand(b, 3, fn, h, w)
        batches.append((x, m, y))

    lr, step_size, gamma = 1e-4, 2, 0.5

    # --- torch: the reference's exact step (training_step body with an
    # identity aligner: aligned refs = raw refs, v = 1 - m), Adam over
    # self.parameters() as configure_optimizers does (VGG params receive no
    # grad and are skipped by Adam), scheduler stepped once per 'epoch'.
    opt = torch.optim.Adam(chn_t.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.StepLR(opt, step_size=step_size, gamma=gamma)
    t_idx, r_list = ref.CHN.get_indexes(fn)
    losses_t = []
    with _ref_losses_double(ref):
        for x, m, y in batches:
            xt, mt, yt = map(torch.from_numpy, (x, m, y))
            x_t, m_t = xt[:, :, t_idx], mt[:, :, t_idx]
            xa = xt[:, :, r_list]
            va = 1 - mt[:, :, r_list]
            vm = torch.clamp(va - (1 - m_t).unsqueeze(2), 0, 1)
            y_hat, y_hat_comp = chn_t(x_t, 1 - m_t, xa, va, vm)
            loss, _ = chn_t.compute_loss(
                yt[:, :, t_idx], 1 - m_t, y_hat, y_hat_comp, vm
            )
            opt.zero_grad()
            loss.backward()
            opt.step()
            sched.step()
            losses_t.append(float(loss.detach()))

    # --- jax: the production train step with the same identity aligner.
    jax.config.update("jax_enable_x64", True)
    try:
        chn = CHN(nb=20, dtype=jnp.float64)
        params = {"params": convert.chn_from_torch(sd, nb=20, dtype=np.float64)}
        vgg = VGGFeatures(dtype=jnp.float64)
        vgg_params = {"params": convert.vgg16_from_torch(
            {k: v for k, v in vgg_t.state_dict().items()}, dtype=np.float64
        )}

        def vgg_apply(xx, normalize_input=True):
            return vgg.apply(vgg_params, xx, normalize_input=normalize_input)

        def align_fn(x_t, m_t, x_r, m_r):
            va = 1 - m_r
            vm = jnp.clip(va - (1 - m_t)[:, None], 0, 1)
            return x_r, va, vm

        cfg = Config(lr=lr, lr_scheduler_step_size=step_size, lr_scheduler_gamma=gamma)
        state = state_lib.create_train_state(chn.apply, params, cfg, steps_per_epoch=1)
        train_step = chn_task.make_train_step(chn.apply, align_fn, vgg_apply, donate=False)
        losses_j = []
        for x, m, y in batches:
            xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))
            mj = jnp.asarray(m.transpose(0, 2, 3, 4, 1))
            yj = jnp.asarray(y.transpose(0, 2, 3, 4, 1))
            state, items = train_step(state, xj, mj, yj)
            losses_j.append(float(items["loss"]))
        final_params = jax.device_get(state.params["params"]["nn"])
    finally:
        jax.config.update("jax_enable_x64", False)

    # Per-step losses (computed pre-update on both sides) and final params.
    np.testing.assert_allclose(losses_j, losses_t, rtol=1e-8)
    want = convert.chn_from_torch(chn_t.state_dict(), nb=20, dtype=np.float64)["nn"]
    # 4 updates of magnitude <= lr=1e-4 each. A semantic mismatch (wrong
    # bias correction, eps placement, schedule off-by-one, sign error)
    # moves essentially EVERY element by ~1e-5..1e-4; f64 rounding
    # amplified through Adam's g/(|g|+eps) normalization moves a handful
    # of near-eps-gradient elements by up to a few 1e-7. Assert both
    # faces: nothing beyond 1e-6, and no more than a 1e-4 fraction of any
    # tensor beyond 2e-7.
    for (pg, g), (pw, w) in zip(
        jax.tree_util.tree_flatten_with_path(final_params)[0],
        jax.tree_util.tree_flatten_with_path(want)[0],
    ):
        assert pg == pw
        diff = np.abs(np.asarray(g) - np.asarray(w))
        name = jax.tree_util.keystr(pg)
        assert diff.max() < 1e-6, f"{name}: max {diff.max():.3e}"
        frac = float(np.mean(diff > 2e-7))
        assert frac <= 1e-4, f"{name}: {frac:.2e} of elements beyond 2e-7"

"""End-to-end numerical parity against the ACTUAL reference implementation.

Unlike the per-submodule parity tests (tests/test_models_*.py, which use
functional torch re-formulations), these import the reference package from
/root/reference (tests/ref_import.py), instantiate its modules with random
torch state, convert that state with models/convert.py, run both stacks on
identical inputs, and assert end-to-end max-abs agreement:

- CPN.align          (reference model_cpn.py:31-91)
- CHN.forward        (reference model_chn.py:44-85)
- DFPN.forward       (reference model_dfpn.py:46-101)
- CHN.compute_loss   (reference model_chn.py:324-376)
- DFPN._train_val_wrapper + compute_loss (reference model_dfpn.py:210-394)
(Algorithm-level inpaint_ff/ip/cp parity lives in
tests/test_reference_algorithms.py.)
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from master_thesis_tpu.models import convert
from tests.ref_import import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference not present"
)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def _nhwc(t):  # (B,C,H,W) torch -> (B,H,W,C) numpy
    return t.permute(0, 2, 3, 1).numpy()


def _nfhwc(t):  # (B,C,F,H,W) torch -> (B,F,H,W,C) numpy
    return t.permute(0, 2, 3, 4, 1).numpy()


def _inputs(rng, b, f, h, w):
    x_t = torch.from_numpy(rng.rand(b, 3, h, w).astype(np.float32))
    m_t = torch.from_numpy((rng.rand(b, 1, h, w) > 0.85).astype(np.float32))
    x_r = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    m_r = torch.from_numpy((rng.rand(b, 1, f, h, w) > 0.85).astype(np.float32))
    return x_t, m_t, x_r, m_r


def test_cpn_align_matches_reference_e2e(ref, rng):
    """Runs both stacks in float64: CPN regresses an affine theta and warps
    with it, so at float32 the ~1e-6 accumulated theta difference shifts the
    sampling grid and smears O(1e-3) over every pixel of a high-frequency
    random image (and can flip pixels of the 0.5-thresholded visibility
    maps, model_cpn.py:85-89). In f64 true E2E agreement is asserted at
    1e-5 with bit-exact binary maps."""
    import jax

    from master_thesis_tpu.models.cpn import CPN

    torch.manual_seed(0)
    cpn_t = ref.CPN().double().eval()
    sd = {k: v.detach() for k, v in cpn_t.state_dict().items()}

    b, f, h, w = 1, 2, 64, 64
    x_t, m_t, x_r, m_r = (t.double() for t in _inputs(rng, b, f, h, w))
    with torch.no_grad():
        xa_t, va_t, vm_t = cpn_t.align(x_t, m_t, x_r, m_r)

    jax.config.update("jax_enable_x64", True)
    try:
        cpn = CPN(dtype=jnp.float64)
        params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.float64),
            {"params": convert.cpn_from_torch(sd)},
        )
        xa, va, vm = cpn.apply(
            params, jnp.asarray(_nhwc(x_t)), jnp.asarray(_nhwc(m_t)),
            jnp.asarray(_nfhwc(x_r)), jnp.asarray(_nfhwc(m_r)), method=CPN.align,
        )
        np.testing.assert_allclose(np.asarray(xa), _nfhwc(xa_t), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(va), _nfhwc(va_t))
        np.testing.assert_array_equal(np.asarray(vm), _nfhwc(vm_t))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_chn_forward_matches_reference_e2e(ref, rng):
    from master_thesis_tpu.models.chn import CHN

    torch.manual_seed(1)
    chn_t = ref.CHN(None, None, None).eval()
    sd = {k: v.detach() for k, v in chn_t.state_dict().items()}

    b, f, h, w = 1, 2, 64, 64
    x_t, m_t, x_r, _ = _inputs(rng, b, f, h, w)
    v_t = 1 - m_t
    v_r = torch.from_numpy((rng.rand(b, 1, f, h, w) > 0.3).astype(np.float32))
    v_m = torch.clamp(v_r - v_t.unsqueeze(2), 0, 1)
    with torch.no_grad():
        y_hat_t, y_comp_t = chn_t(x_t, v_t, x_r, v_r, v_m)

    chn = CHN(nb=20)
    params = {"params": convert.chn_from_torch(sd, nb=20)}
    y_hat, y_comp = chn.apply(
        params, jnp.asarray(_nhwc(x_t)), jnp.asarray(_nhwc(v_t)),
        jnp.asarray(_nfhwc(x_r)), jnp.asarray(_nfhwc(v_r)), jnp.asarray(_nfhwc(v_m)),
    )
    np.testing.assert_allclose(np.asarray(y_hat), _nfhwc(y_hat_t), atol=1e-4)
    np.testing.assert_allclose(np.asarray(y_comp), _nfhwc(y_comp_t), atol=1e-4)


def test_dfpn_forward_matches_reference_e2e(ref, rng):
    import torchvision.models.vgg as tvv

    from master_thesis_tpu.models.dfpn import DFPN, prepare_vgg_input
    from master_thesis_tpu.models.vgg import VGGFeatures

    torch.manual_seed(2)
    vgg_t = ref.VGGFeatures(tvv.make_layers(tvv.cfgs["D"]), "cpu").eval()
    dfpn_t = ref.DFPN(vgg_t).eval()
    sd = {k: v.detach() for k, v in dfpn_t.state_dict().items()}

    b, f, h, w = 1, 1, 256, 256
    x_t, m_t, x_r, m_r = _inputs(rng, b, f, h, w)
    with torch.no_grad():
        corr_t, f16_t, f64_t, f256_t = dfpn_t(x_t, m_t, x_r, m_r)

    vgg = VGGFeatures()
    vgg_params = {"params": convert.vgg16_from_torch(
        {k: v for k, v in vgg_t.state_dict().items()}
    )}

    def vgg_apply(x, normalize_input=True):
        return vgg.apply(vgg_params, x, normalize_input=normalize_input)

    dfpn = DFPN()
    params = {"params": convert.dfpn_from_torch(sd)}
    x_t_j, m_t_j = jnp.asarray(_nhwc(x_t)), jnp.asarray(_nhwc(m_t))
    x_r_j, m_r_j = jnp.asarray(_nfhwc(x_r)), jnp.asarray(_nfhwc(m_r))
    feats_t = vgg_apply(prepare_vgg_input(x_t_j), normalize_input=False)[3]
    feats_r = vgg_apply(
        prepare_vgg_input(x_r_j.reshape(b * f, h, w, 3)), normalize_input=False
    )[3]
    feats_r = feats_r.reshape(b, f, *feats_r.shape[1:])
    corr, f16, f64, f256 = dfpn.apply(
        params, x_t_j, m_t_j, x_r_j, m_r_j, feats_t, feats_r
    )

    np.testing.assert_allclose(np.asarray(corr), corr_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f16), f16_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f64), f64_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(f256), f256_t.numpy(), atol=1e-4)


def _ref_vgg(ref, seed):
    import torchvision.models.vgg as tvv

    from master_thesis_tpu.models.vgg import VGGFeatures

    torch.manual_seed(seed)
    vgg_t = ref.VGGFeatures(tvv.make_layers(tvv.cfgs["D"]), "cpu").eval()
    vgg = VGGFeatures()
    vgg_params = {"params": convert.vgg16_from_torch(
        {k: v for k, v in vgg_t.state_dict().items()}
    )}

    def vgg_apply(x, normalize_input=True):
        return vgg.apply(vgg_params, x, normalize_input=normalize_input)

    return vgg_t, vgg_apply


def test_chn_compute_loss_matches_reference(ref, rng):
    """The five composite CHN loss scalars (reference model_chn.py:324-376)
    on identical random inputs with shared converted VGG weights. Uses one
    reference frame (frames_n=2) — the only case where the reference's
    ``squeeze(2)`` gradient-loss formulation is defined."""
    from master_thesis_tpu.train import chn_task

    vgg_t, vgg_apply = _ref_vgg(ref, 4)
    chn_t = ref.CHN(vgg_t, None, None).eval()

    b, f, h, w = 2, 1, 64, 64
    y_target = torch.from_numpy(rng.rand(b, 3, h, w).astype(np.float32))
    v_target = torch.from_numpy((rng.rand(b, 1, h, w) > 0.2).astype(np.float32))
    y_hat = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    y_hat_comp = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    # v_map lives inside the hole (disjoint from the non-hole mask), as the
    # real visibility maps do — keeps nvh_mask = (1 - nh) - vh in [0, 1].
    v_map = torch.from_numpy(
        (rng.rand(b, 1, f, h, w) > 0.6).astype(np.float32)
    ) * (1 - v_target.unsqueeze(2))

    with torch.no_grad():
        loss_t, items_t = chn_t.compute_loss(
            y_target, v_target, y_hat, y_hat_comp, v_map
        )

    total, items = chn_task.compute_loss(
        jnp.asarray(_nhwc(y_target)), jnp.asarray(_nhwc(v_target)),
        jnp.asarray(_nfhwc(y_hat)), jnp.asarray(_nfhwc(y_hat_comp)),
        jnp.asarray(_nfhwc(v_map)), vgg_apply,
    )
    ref_named = dict(zip(ref.CHN.LOSSES_NAMES, items_t))
    assert set(ref_named) == set(items)
    for name, val_t in ref_named.items():
        np.testing.assert_allclose(
            float(items[name]), float(val_t), atol=1e-5, err_msg=name
        )
    np.testing.assert_allclose(float(total), float(loss_t), atol=3e-5)


def test_dfpn_compute_loss_matches_reference(ref, rng):
    """The six composite DFPN loss scalars through the reference's own
    ``_train_val_wrapper`` (forward + pyramids + predicted-flow warps,
    model_dfpn.py:310-394) + ``compute_loss`` (:210-293) vs our single
    ``forward_and_loss`` on identical inputs with shared converted
    weights."""
    import torchvision.models.vgg as tvv

    from master_thesis_tpu.models.dfpn import DFPN
    from master_thesis_tpu.train import dfpn_task

    torch.manual_seed(5)
    vgg_t = ref.VGGFeatures(tvv.make_layers(tvv.cfgs["D"]), "cpu").eval()
    dfpn_t = ref.DFPN(vgg_t).eval()
    sd = {k: v.detach() for k, v in dfpn_t.state_dict().items()}
    _, vgg_apply = _ref_vgg_from(vgg_t)

    b, f, h, w = 1, 2, 256, 256
    x = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    m = torch.from_numpy((rng.rand(b, 1, f, h, w) > 0.85).astype(np.float32))
    y = torch.from_numpy(rng.rand(b, 3, f, h, w).astype(np.float32))
    # Absolute normalized GT flow: identity grid (align_corners=True
    # convention, utils.py:27-31) + small off-grid perturbation.
    gy, gx = np.meshgrid(
        np.linspace(-1, 1, h), np.linspace(-1, 1, w), indexing="ij"
    )
    ident = np.stack([gx, gy], axis=-1)[None, None]  # (1, 1, H, W, 2)
    flow_gt_np = (
        ident + 0.03 * rng.rand(b, f, h, w, 2) - 0.015
    ).astype(np.float32)
    flow_gt = torch.from_numpy(flow_gt_np)
    flows_use = torch.tensor([True])

    t, r_list = ref.DFPN.get_indexes(f)
    with torch.no_grad():
        wrapped = dfpn_t._train_val_wrapper(x, m, y, flow_gt, flows_use, t, r_list)
        loss_t, items_t = dfpn_t.compute_loss(*wrapped, t, r_list)

    dfpn = DFPN()
    params = {"params": convert.dfpn_from_torch(sd)}
    total, items = dfpn_task.forward_and_loss(
        lambda p, *a: dfpn.apply(p, *a), params, vgg_apply,
        jnp.asarray(_nfhwc(x)), jnp.asarray(_nfhwc(m)), jnp.asarray(_nfhwc(y)),
        jnp.asarray(flow_gt_np), jnp.asarray(np.asarray([True])),
        base_size=256,
    )
    ref_named = dict(zip(ref.DFPN.LOSSES_NAMES, items_t))
    assert set(ref_named) == set(items)
    for name, val_t in ref_named.items():
        np.testing.assert_allclose(
            float(items[name]), float(val_t), atol=1e-4, err_msg=name
        )
    np.testing.assert_allclose(float(total), float(loss_t), atol=3e-4)


def _ref_vgg_from(vgg_t):
    from master_thesis_tpu.models.vgg import VGGFeatures

    vgg = VGGFeatures()
    vgg_params = {"params": convert.vgg16_from_torch(
        {k: v for k, v in vgg_t.state_dict().items()}
    )}

    def vgg_apply(x, normalize_input=True):
        return vgg.apply(vgg_params, x, normalize_input=normalize_input)

    return vgg, vgg_apply

"""Abstract-eval (shape-level) smoke of the TPU serving/training paths at
REAL production shapes. ``jax.eval_shape`` traces the full graph — every
reshape/transpose/BlockSpec shape computation in the Pallas call wrappers
— without lowering to Mosaic, so it runs on CPU and catches
shape-plumbing bugs (e.g. square-only assumptions) that interpret-mode
tests at toy sizes can't."""

import jax
import jax.numpy as jnp
import pytest

from master_thesis_tpu.models.chn import CHN, chn_infer_apply


def _chn_variables(nb):
    chn = CHN(nb=nb)
    z = jnp.zeros
    return chn.init(
        jax.random.PRNGKey(0), z((1, 64, 64, 3)), z((1, 64, 64, 1)),
        z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)), z((1, 1, 64, 64, 1)),
    )


@pytest.mark.parametrize(
    "b,f,h,w",
    [
        (16, 5, 256, 256),  # headline bench geometry
        (1, 5, 240, 480),   # the reference's CHN test size
        (12, 1, 512, 512),  # config-5 full-video geometry
    ],
)
def test_chn_serving_path_traces_at_production_shapes(b, f, h, w):
    variables = _chn_variables(nb=20)
    z = jnp.zeros

    def fwd(v):
        return chn_infer_apply(
            v, z((b, h, w, 3)), z((b, h, w, 1)), z((b, f, h, w, 3)),
            z((b, f, h, w, 1)), z((b, f, h, w, 1)), nb=20,
        )

    y_hat, y_comp = jax.eval_shape(fwd, variables)
    assert y_hat.shape == (b, f, h, w, 3) == y_comp.shape


@pytest.mark.parametrize("b,f", [(4, 5), (8, 1)])  # config-4 / config-1
def test_dfpn_serving_twin_traces_at_production_shapes(b, f):
    """The DFPN serving twin (sep4d + mixer + flow-estimator + VGG
    kernels) at the real 256² geometry."""
    from master_thesis_tpu.models.dfpn import DFPN, dfpn_infer_apply
    from master_thesis_tpu.models.vgg import vgg_pool4_pallas

    h = w = 256
    model = DFPN()
    z = jnp.zeros
    variables = model.init(
        jax.random.PRNGKey(0), z((1, 64, 64, 3)), z((1, 64, 64, 1)),
        z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)),
        z((1, 16, 16, 512)), z((1, 1, 16, 16, 512)),
    )

    def fwd(v):
        return dfpn_infer_apply(
            v, z((b, h, w, 3)), z((b, h, w, 1)), z((b, f, h, w, 3)),
            z((b, f, h, w, 1)), z((b, 16, 16, 512)),
            z((b, f, 16, 16, 512)),
        )

    corr, f16, f64, ffull = jax.eval_shape(fwd, variables)
    assert corr.shape == (b, f, 16, 16, 16, 16)
    assert ffull.shape == (b, f, h, w, 2)

    from master_thesis_tpu.models.vgg import VGGFeatures

    vgg = VGGFeatures()
    vp = vgg.init(jax.random.PRNGKey(1), z((1, 64, 64, 3)))
    feats = jax.eval_shape(
        lambda p: vgg_pool4_pallas(p["params"], z((b * f, h, w, 3))), vp
    )
    assert feats.shape == (b * f, 16, 16, 512)


def test_chn_training_grads_trace_at_production_shape():
    """The production train-shape VJP — fused trunk AND tail backwards
    engage at 256² (dispatch-threshold tests pin that) — must trace,
    including the backward kernels' per-frame dW plumbing and the
    weight-grad un-mapping back to the param tree."""
    variables = _chn_variables(nb=20)
    b, f, h, w = 8, 5, 256, 256
    z = jnp.zeros

    def loss(v):
        y_hat, _ = chn_infer_apply(
            v, z((b, h, w, 3)), z((b, h, w, 1)), z((b, f, h, w, 3)),
            z((b, f, h, w, 1)), z((b, f, h, w, 1)), nb=20,
        )
        return jnp.sum(y_hat.astype(jnp.float32))

    grads = jax.eval_shape(jax.grad(loss), variables)
    flat = jax.tree_util.tree_leaves(grads)
    assert flat and all(g.shape is not None for g in flat)

"""Model/graph builders shared by the CLI, bench, and the graft entry.

Centralizes: model construction, (optional) pretrained-weight conversion,
aligner closures, and loader assembly — the wiring the reference does in
``__main__.main`` (reference __main__.py:12-58).
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from master_thesis_tpu.models import convert
from master_thesis_tpu.models.chn import CHN
from master_thesis_tpu.models.cpn import CPN
from master_thesis_tpu.models.dfpn import DFPN, dfpn_align, prepare_vgg_input
from master_thesis_tpu.models.vgg import VGGFeatures


def _dtype(cfg) -> jnp.dtype:
    return jnp.dtype(cfg.compute_dtype)


def build_vgg(cfg, checkpoint: Optional[str] = None):
    """VGG features + apply closure. Loads converted torchvision weights if
    ``checkpoint`` (a torch vgg16 state-dict .pth) is given."""
    model = VGGFeatures(dtype=_dtype(cfg))
    if checkpoint and os.path.exists(checkpoint):
        params = {"params": convert.vgg16_from_torch(convert.load_torch_checkpoint(checkpoint))}
    else:
        if checkpoint:
            warnings.warn(f"VGG checkpoint {checkpoint} not found; random init")
        params = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    def vgg_apply(x, normalize_input=True):
        return model.apply(params, x, normalize_input=normalize_input)

    # Expose the param tree so serving paths can run the fused pool-4
    # twin (models/vgg.py:vgg_pool4_pallas) without re-plumbing closures.
    vgg_apply.params = params
    return model, params, vgg_apply


def build_cpn(cfg, checkpoint: Optional[str] = None):
    model = CPN(dtype=_dtype(cfg))
    if checkpoint and os.path.exists(checkpoint):
        params = {"params": convert.cpn_from_torch(convert.load_torch_checkpoint(checkpoint))}
    else:
        if checkpoint:
            warnings.warn(f"CPN checkpoint {checkpoint} not found; random init")
        z = jnp.zeros
        params = model.init(
            jax.random.PRNGKey(2), z((1, 64, 64, 3)), z((1, 64, 64, 1)),
            z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)),
        )

    def align_fn(x_t, m_t, x_r, m_r):
        return model.apply(params, x_t, m_t, x_r, m_r, method=CPN.align)

    return model, params, align_fn


def build_dfpn(cfg, vgg_apply: Callable, params=None, rng_seed: int = 3):
    base = getattr(cfg, "dfpn_base_size", 256)
    model = DFPN(dtype=_dtype(cfg), base_size=base)
    if params is None:
        z = jnp.zeros
        cs = base // 16
        params = model.init(
            jax.random.PRNGKey(rng_seed),
            z((1, 64, 64, 3)), z((1, 64, 64, 1)),
            z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)),
            z((1, cs, cs, 512)), z((1, 1, cs, cs, 512)),
        )
    return model, params


def dfpn_align_fn(cfg, dfpn_model, dfpn_params, vgg_apply: Callable) -> Callable:
    """Aligner closure with the DFPN interface shared with CPN
    (reference model_dfpn.py:103-133).

    On TPU-class backends the forward runs the pure serving twin
    (models/dfpn.py:dfpn_infer_apply) with the separable 4-D conv on the
    fused Pallas kernel; elsewhere the flax module."""
    from master_thesis_tpu.models.dfpn import dfpn_infer_apply

    warp_precision = (
        jax.lax.Precision.DEFAULT if _dtype(cfg) == jnp.bfloat16 else None
    )
    if cfg.use_pallas and jax.default_backend() in ("tpu", "axon"):
        def apply_fn(p, *a):
            return dfpn_infer_apply(
                p, *a, dtype=_dtype(cfg), base_size=dfpn_model.base_size,
                use_softmax=dfpn_model.use_softmax,
            )
    else:
        def apply_fn(p, *a):
            return dfpn_model.apply(p, *a)

    # The fused pool-4 kernel (models/vgg.py:vgg_pool4_pallas) measured
    # 17.7 ms vs XLA's 8.2 at config-4 shapes on v5e (BENCH_NOTES.md) —
    # XLA's conv fusion already wins here, so serving keeps the module.
    def pool4(x):
        return vgg_apply(x, normalize_input=False)[3]

    def align_fn(x_t, m_t, x_r, m_r):
        b, f, h, w, _ = x_r.shape
        base = dfpn_model.base_size
        feats_t = pool4(prepare_vgg_input(x_t, size=base))
        feats_r = pool4(prepare_vgg_input(x_r.reshape(b * f, h, w, 3), size=base))
        feats_r = feats_r.reshape(b, f, *feats_r.shape[1:])
        return dfpn_align(
            apply_fn,
            dfpn_params, x_t, m_t, x_r, m_r, feats_t, feats_r,
            warp_precision=warp_precision,
        )

    return align_fn


def build_chn(cfg, params=None, rng_seed: int = 4):
    model = CHN(nb=cfg.chn_nb, dtype=_dtype(cfg), remat=getattr(cfg, "chn_remat", False))
    if params is None:
        z = jnp.zeros
        params = model.init(
            jax.random.PRNGKey(rng_seed),
            z((1, 64, 64, 3)), z((1, 64, 64, 1)),
            z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)), z((1, 1, 64, 64, 1)),
        )
    return model, params


def build_lpips(cfg, alexnet_checkpoint=None, lpips_checkpoint=None):
    """LPIPS metric closure; returns None unless converted weights exist
    (random heads would log meaningless numbers)."""
    from master_thesis_tpu.models import convert
    from master_thesis_tpu.models.lpips import LPIPS, lpips_distance, lpips_from_torch

    if not (lpips_checkpoint and os.path.exists(lpips_checkpoint)):
        return None
    model = LPIPS(dtype=_dtype(cfg))
    lins_sd = convert.load_torch_checkpoint(lpips_checkpoint)
    if alexnet_checkpoint and os.path.exists(alexnet_checkpoint):
        alex_sd = convert.load_torch_checkpoint(alexnet_checkpoint)
    elif any(k.startswith("net.") for k in lins_sd):
        # single-file export holding both trunk and heads
        alex_sd = {k[len("net."):]: v for k, v in lins_sd.items() if k.startswith("net.")}
    else:
        warnings.warn("LPIPS heads found but no AlexNet trunk weights; skipping LPIPS")
        return None
    params = {"params": lpips_from_torch(alex_sd, lins_sd)}

    def lpips_fn(y_hat, y):
        return lpips_distance(lambda p, a, b: model.apply(p, a, b), params, y_hat, y)

    return lpips_fn


def chn_infer_fn(cfg, model) -> Callable:
    """CHN apply for inference: the fused-Pallas-trunk path on TPU-class
    backends (models/chn.py:chn_infer_apply), the flax module elsewhere."""
    import jax

    from master_thesis_tpu.models.chn import chn_infer_apply

    if cfg.use_pallas and jax.default_backend() in ("tpu", "axon"):
        def apply_fn(params, x_t, v_t, xa, va, vm):
            return chn_infer_apply(
                params, x_t, v_t, xa, va, vm,
                nb=cfg.chn_nb, dtype=_dtype(cfg),
                pallas_bwd=getattr(cfg, "use_pallas_bwd", True),
            )

        return apply_fn
    return model.apply


def chn_train_fn(cfg, model) -> Callable:
    """CHN apply for the training/eval steps.

    On TPU-class backends this is the same pure-function path as serving —
    grouped head + fused Pallas trunk + tail — which is differentiable end
    to end (the trunk's ``custom_vjp`` pairs the fused forward with the
    fused backward kernel, XLA-remat fallback past VMEM,
    ops/pallas_rrdb.py:make_hybrid_trunk). Elsewhere (CPU tests) the flax
    module keeps full-precision XLA parity semantics.
    """
    return chn_infer_fn(cfg, model)


def build_loaders(cfg, metas, splits=("train", "validation")):
    """Assembles Loader objects per split from the 5-meta tuple."""
    from master_thesis_tpu.data.pipeline import ContentProvider, InpaintingDataset, Loader
    from master_thesis_tpu.ops.movements import MovementSimulator

    train_bgs, train_masks, val_bgs, val_masks, test_meta = metas
    loaders = {}
    if "train" in splits:
        bgs = ContentProvider(
            train_bgs, cfg.data_path,
            movement_min_height=cfg.train_size[0] * 2,
            movement_simulator=MovementSimulator(*cfg.bgs_movement_params),
            frames_spacing=cfg.frames_spacing,
            frames_randomize=cfg.frames_randomize,
        )
        masks = ContentProvider(
            train_masks, cfg.data_path,
            movement_simulator=MovementSimulator(*cfg.masks_movement_params),
            frames_spacing=cfg.frames_spacing,
        )
        ds = InpaintingDataset(bgs, masks, "train", cfg)
        loaders["train"] = Loader(
            ds, cfg.batch_size, seed=cfg.seed, num_workers=max(1, cfg.num_workers),
            use_processes=getattr(cfg, "loader_processes", False),
        )
    if "validation" in splits:
        bgs = ContentProvider(
            val_bgs, cfg.data_path, frames_spacing=cfg.frames_spacing,
            frames_randomize=cfg.frames_randomize,
        )
        masks = ContentProvider(val_masks, cfg.data_path, frames_spacing=cfg.frames_spacing)
        ds = InpaintingDataset(bgs, masks, "validation", cfg)
        loaders["validation"] = Loader(
            ds, cfg.batch_size, seed=cfg.seed + 1,
            num_workers=max(1, cfg.num_workers),
            use_processes=getattr(cfg, "loader_processes", False),
        )
    if "test" in splits:
        bgs = ContentProvider(test_meta, cfg.data_path)
        ds = InpaintingDataset(bgs, None, "test", cfg)
        loaders["test"] = Loader(
            ds, cfg.batch_size, seed=cfg.seed + 2,
            num_workers=max(1, cfg.num_workers), drop_last=False,
        )
    return loaders

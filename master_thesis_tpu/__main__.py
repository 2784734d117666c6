"""CLI entry point — same flag surface and four run modes as the reference
(__main__.py:12-72): DFPN train/test, CHN train/test with a ``cpn`` or
``dfpn`` aligner.

    python -m master_thesis_tpu                      # train DFPN
    python -m master_thesis_tpu --test --test_checkpoint P
    python -m master_thesis_tpu --chn --chn_aligner cpn \
        --chn_aligner_checkpoint weight.pth          # train CHN
    python -m master_thesis_tpu --chn --test ...     # full-video inpainting

Checkpoint paths may be torch files (``.pth``/``.ckpt`` — converted on
load via models/convert.py) or orbax directories produced by this trainer.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from master_thesis_tpu.config import Config


def _is_torch_ckpt(path: str) -> bool:
    return os.path.isfile(path)


def load_dfpn_params(path, cfg, vgg_apply):
    from master_thesis_tpu.models import convert
    from master_thesis_tpu.train import build as build_mod
    from master_thesis_tpu.train.checkpoint import restore_from_path

    model, init_params = build_mod.build_dfpn(cfg, vgg_apply)
    if path and _is_torch_ckpt(path):
        sd = convert.load_torch_checkpoint(path)
        return model, {"params": convert.dfpn_from_torch(sd)}
    if path:
        restored = restore_from_path(path)
        return model, {"params": restored["params"]["params"]}
    return model, init_params


def load_chn_params(path, cfg):
    from master_thesis_tpu.models import convert
    from master_thesis_tpu.train import build as build_mod
    from master_thesis_tpu.train.checkpoint import restore_from_path

    model, init_params = build_mod.build_chn(cfg)
    if path and _is_torch_ckpt(path):
        sd = convert.load_torch_checkpoint(path)
        return model, {"params": convert.chn_from_torch(sd, nb=cfg.chn_nb)}
    if path:
        restored = restore_from_path(path)
        return model, {"params": restored["params"]["params"]}
    return model, init_params


def build_aligner(cfg, vgg_apply):
    from master_thesis_tpu.train import build as build_mod

    if cfg.chn_aligner == "cpn":
        _, _, align_fn = build_mod.build_cpn(cfg, cfg.chn_aligner_checkpoint)
        return align_fn
    model, params = load_dfpn_params(cfg.chn_aligner_checkpoint, cfg, vgg_apply)
    return build_mod.dfpn_align_fn(cfg, model, params, vgg_apply)


def _resume_split(cfg):
    """Splits --resume_from_checkpoint into (torch_params_path, orbax_path):
    a torch file restores params only (Adam state has no torch converter);
    an orbax dir restores the FULL TrainState — params, optimizer moments
    and the LR-schedule step (Lightning-resume semantics, reference
    __main__.py:33-42)."""
    path = cfg.resume_from_checkpoint
    if not path:
        return None, None
    if _is_torch_ckpt(path):
        return path, None
    return None, path


def run_dfpn_train(cfg):
    from master_thesis_tpu.data import meta as meta_mod
    from master_thesis_tpu.train import build as build_mod, dfpn_task, state as state_lib
    from master_thesis_tpu.train.checkpoint import restore_train_state
    from master_thesis_tpu.train.loop import Trainer

    metas = meta_mod.prepare_data(cfg)
    loaders = build_mod.build_loaders(cfg, metas)
    _, _, vgg_apply = build_mod.build_vgg(cfg, cfg.vgg_checkpoint)
    torch_resume, orbax_resume = _resume_split(cfg)
    model, params = load_dfpn_params(torch_resume, cfg, vgg_apply)

    state = state_lib.create_train_state(
        model.apply, params, cfg, steps_per_epoch=cfg.train_max_iterations
    )
    if orbax_resume:
        state = restore_train_state(state, orbax_resume)
    trainer = Trainer(cfg, "dfpn")
    train_step = dfpn_task.make_train_step(
        model.apply, vgg_apply, base_size=model.base_size,
        ref_sharding=trainer.ref_sharding, donate=cfg.donate_buffers,
    )
    eval_step = dfpn_task.make_eval_step(
        model.apply, vgg_apply, base_size=model.base_size
    )
    args = lambda b: (b["x"], b["m"], b["y"], b["flow_gt"], b["flows_use"])
    trainer.fit(
        state, train_step, args, loaders["train"],
        eval_step=eval_step, eval_args=args, val_loader=loaders["validation"],
    )


def run_dfpn_test(cfg):
    from master_thesis_tpu.data import meta as meta_mod
    from master_thesis_tpu.train import build as build_mod, dfpn_task

    from master_thesis_tpu.train.checkpoint import next_version_dir
    from master_thesis_tpu.train.logging import Logger

    metas = meta_mod.prepare_data(cfg)
    loaders = build_mod.build_loaders(cfg, metas, splits=("test",))
    _, _, vgg_apply = build_mod.build_vgg(cfg, cfg.vgg_checkpoint)
    model, params = load_dfpn_params(cfg.test_checkpoint, cfg, vgg_apply)
    eval_step = dfpn_task.make_eval_step(
        model.apply, vgg_apply, base_size=model.base_size
    )
    align_fn = build_mod.dfpn_align_fn(cfg, model, params, vgg_apply)
    logger = Logger(next_version_dir(cfg.default_root_dir))

    agg = {}
    for i, batch in enumerate(loaders["test"]):
        # DFPN test supervises flow with the *mask* movement (reference
        # model_dfpn.py:197 uses info[5]).
        items = eval_step(
            params, batch["x"], batch["m"], batch["y"], batch["m_movement"],
            batch["flows_use"],
        )
        for k, v in items.items():
            agg.setdefault(k, []).append(float(v))
        # Aligned-frame grids, as the reference's test_step logs
        # (model_dfpn.py:207, :411-456).
        import jax.numpy as jnp

        dfpn_task.log_alignment_frames(
            logger, align_fn, jnp.asarray(batch["x"]), jnp.asarray(batch["m"]),
            jnp.asarray(batch["y"]), step=i,
        )
    logger.flush()
    for k, v in agg.items():
        print(f"test/{k}: {np.mean(v):.5f}")


def run_chn_train(cfg):
    from master_thesis_tpu.data import meta as meta_mod
    from master_thesis_tpu.train import build as build_mod, chn_task, state as state_lib
    from master_thesis_tpu.train.loop import Trainer

    from master_thesis_tpu.train.checkpoint import restore_train_state

    metas = meta_mod.prepare_data(cfg)
    loaders = build_mod.build_loaders(cfg, metas)
    _, _, vgg_apply = build_mod.build_vgg(cfg, cfg.vgg_checkpoint)
    align_fn = build_aligner(cfg, vgg_apply)
    torch_resume, orbax_resume = _resume_split(cfg)
    model, params = load_chn_params(torch_resume, cfg)

    state = state_lib.create_train_state(
        model.apply, params, cfg, steps_per_epoch=cfg.train_max_iterations
    )
    if orbax_resume:
        state = restore_train_state(state, orbax_resume)
    trainer = Trainer(cfg, "chn")
    lpips_fn = build_mod.build_lpips(cfg, lpips_checkpoint=cfg.lpips_checkpoint)
    chn_apply = build_mod.chn_train_fn(cfg, model)
    train_step = chn_task.make_train_step(
        chn_apply, align_fn, vgg_apply,
        ref_sharding=trainer.ref_sharding, donate=cfg.donate_buffers,
        perceptual_grad=cfg.perceptual_grad,
    )
    eval_step = chn_task.make_eval_step(chn_apply, align_fn, vgg_apply, lpips_fn=lpips_fn)
    args = lambda b: (b["x"], b["m"], b["y"])
    trainer.fit(
        state, train_step, args, loaders["train"],
        eval_step=eval_step, eval_args=args, val_loader=loaders["validation"],
    )


def run_chn_test(cfg):
    import jax
    import jax.numpy as jnp

    from master_thesis_tpu.data import meta as meta_mod
    from master_thesis_tpu.infer.algorithms import Inpainter
    from master_thesis_tpu.infer.video import write_video
    from master_thesis_tpu.ops import measures
    from master_thesis_tpu.train import build as build_mod
    from master_thesis_tpu.train.checkpoint import next_version_dir
    from master_thesis_tpu.train.logging import Logger

    metas = meta_mod.prepare_data(cfg)
    loaders = build_mod.build_loaders(cfg, metas, splits=("test",))
    _, _, vgg_apply = build_mod.build_vgg(cfg, cfg.vgg_checkpoint)
    align_fn = build_aligner(cfg, vgg_apply)
    model, params = load_chn_params(cfg.test_checkpoint, cfg)
    chn_apply = build_mod.chn_infer_fn(cfg, model)
    inpainter = Inpainter(chn_apply, params, align_fn)
    lpips_fn = build_mod.build_lpips(cfg, lpips_checkpoint=cfg.lpips_checkpoint)

    # Quality metrics of the inpainted sequence vs the decoded frames, as the
    # reference logs on evaluation (model_chn.py:408-422; BASELINE.md:33-36).
    @jax.jit
    def _quality(y_hat, y):
        out = {
            "psnr": measures.psnr(y_hat, y),
            "ssim": measures.ssim(y_hat, y),
        }
        if lpips_fn is not None:
            out["lpips"] = lpips_fn(y_hat, y)
        return out

    # Per-sequence + aggregate metrics land in TensorBoard like the
    # reference's Lightning test logger (model_chn.py:408-422).
    logger = Logger(next_version_dir(cfg.default_root_dir))
    agg = {}
    for seq_i, batch in enumerate(loaders["test"]):
        x, m, y = batch["x"][0], batch["m"][0], batch["y"][0]
        name = batch["names"][0]
        for algo in ("ff", "ip", "cp"):
            y_hat = getattr(inpainter, f"inpaint_{algo}")(x, m)
            q = {k: float(v) for k, v in _quality(
                jnp.asarray(y_hat), jnp.asarray(y)).items()}
            for k, v in q.items():
                agg.setdefault(f"{algo}/{k}", []).append(v)
            logger.log_scalars(q, seq_i, prefix=f"test/{algo}/measures_")
            path = write_video(y_hat, f"{name}_{algo}")
            print(f"wrote {path} " + " ".join(f"{k}={v:.4f}" for k, v in q.items()))
    for k, v in sorted(agg.items()):
        logger.log_scalars({f"test/{k}_mean": float(np.mean(v))}, 0)
        print(f"test/{k}: {np.mean(v):.5f}")
    logger.flush()


def main(argv=None):
    from master_thesis_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser("master_thesis_tpu")
    Config.add_argparse_args(parser)
    cfg = Config.from_args(parser.parse_args(argv))

    if cfg.chn and cfg.test:
        run_chn_test(cfg)
    elif cfg.chn:
        run_chn_train(cfg)
    elif cfg.test:
        run_dfpn_test(cfg)
    else:
        run_dfpn_train(cfg)


if __name__ == "__main__":
    main()

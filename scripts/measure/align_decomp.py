"""In-graph stage attribution for the DFPN align path (config-4 geometry,
B=4 F=5 @256² bf16): times jitted cumulative PREFIXES of the align
pipeline, so each stage's cost is the delta between consecutive rows —
including the fusion/layout effects the standalone per-stage scripts
(flow_profile.py, kernel_bench.py) can't see. The r4 lesson motivating
this: the flow estimators measure 50.4 ms standalone-XLA but only ~25-29
in-graph, so standalone A/Bs overstate (and mis-rank) the levers.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/measure/align_decomp.py
"""
import time

import jax
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from master_thesis_tpu.config import Config
from master_thesis_tpu.models import dfpn as dfpn_mod
from master_thesis_tpu.models.dfpn import (
    FlowEstimator,
    SeparableConv4d,
    correlation_masked_4d,
    dfpn_infer_apply,
    prepare_vgg_input,
    softmax_3d,
)
from master_thesis_tpu.ops import flows as flows_ops
from master_thesis_tpu.ops import transforms
from master_thesis_tpu.ops.pallas_sep4d import mixer_apply_pallas
from master_thesis_tpu.train import build as build_mod

B, F, H, W = 4, 5, 256, 256
ITERS = 20
DTYPE = jnp.bfloat16

cfg = Config(compute_dtype="bfloat16")
_, _, vgg_apply = build_mod.build_vgg(cfg)
model, variables = build_mod.build_dfpn(cfg, vgg_apply)
p = variables["params"]

rng = np.random.RandomState(0)
x_t = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
m_t = jnp.asarray((rng.rand(B, H, W, 1) > 0.9).astype(np.float32))
x_r = jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32))
m_r = jnp.asarray((rng.rand(B, F, H, W, 1) > 0.9).astype(np.float32))


def pool4(x):
    return vgg_apply(x, normalize_input=False)[3]


def stage_feats(args):
    x_t, m_t, x_r, m_r = args
    b, f, h, w, _ = x_r.shape
    feats_t = pool4(prepare_vgg_input(x_t, size=model.base_size))
    feats_r = pool4(
        prepare_vgg_input(x_r.reshape(b * f, h, w, 3), size=model.base_size)
    )
    feats_r = feats_r.reshape(b, f, *feats_r.shape[1:])
    return feats_t, feats_r


IM_MEAN = jnp.asarray(dfpn_mod.IMAGENET_MEAN)
IM_STD = jnp.asarray(dfpn_mod.IMAGENET_STD)


def stage_corr(args):
    """Everything through the masked 4-D correlation einsum."""
    x_tr, m_tr, x_rr, m_rr = args
    feats_t, feats_r = stage_feats(args)
    s256 = model.base_size
    xt = (x_tr - IM_MEAN.astype(x_tr.dtype)) / IM_STD.astype(x_tr.dtype)
    xr = (x_rr - IM_MEAN.astype(x_rr.dtype)) / IM_STD.astype(x_rr.dtype)
    x_t_256, m_t_256, x_r_256, m_r_256 = transforms.resize_set_bis(
        xt, m_tr, xr, m_rr, (s256, s256)
    )
    fh, fw = feats_t.shape[1:3]
    v_t = transforms.interp.resize_hw(1 - m_t_256, (fh, fw), mode="nearest")
    v_r = transforms.interp.resize_hw(1 - m_r_256, (fh, fw), mode="nearest")
    corr = correlation_masked_4d(
        jax.lax.stop_gradient(feats_t), v_t,
        jax.lax.stop_gradient(feats_r), v_r,
    )
    return corr, (x_t_256, m_t_256, x_r_256, m_r_256), (xt, xr)


def stage_sep4d(args):
    corr, set256, norm = stage_corr(args)
    corr = SeparableConv4d(dtype=DTYPE).apply({"params": p["separable4d"]}, corr)
    if model.use_softmax:
        corr = softmax_3d(corr)
    return corr, set256, norm


def stage_mixer(args):
    corr, set256, norm = stage_sep4d(args)
    flow_16 = mixer_apply_pallas(
        p["mixer"], corr, corr_size=model.base_size // 16, dtype=DTYPE
    )
    return flow_16, set256, norm


def stage_flow64(args):
    flow_16, set256, (xt, xr) = stage_mixer(args)
    s64 = model.base_size // 4
    _, m_tr, _, m_rr = args
    x_t_64, m_t_64, x_r_64, m_r_64 = transforms.resize_set_bis(
        xt, m_tr, xr, m_rr, (s64, s64)
    )
    flow_64_pre = flows_ops.resize_flow(flow_16, (s64, s64), mode="bilinear")
    flow_64 = FlowEstimator(dtype=DTYPE).apply(
        {"params": p["flow_64"]}, x_t_64, m_t_64, x_r_64, m_r_64, flow_64_pre
    )
    return flow_64, set256


def stage_flow256(args):
    flow_64, (x_t_256, m_t_256, x_r_256, m_r_256) = stage_flow64(args)
    s256 = model.base_size
    flow_256_pre = flows_ops.resize_flow(flow_64, (s256, s256), mode="bilinear")
    flow_256 = FlowEstimator(dtype=DTYPE).apply(
        {"params": p["flow_256"]}, x_t_256, m_t_256, x_r_256, m_r_256,
        flow_256_pre,
    )
    return flow_256


def stage_full(args):
    x_t, m_t, x_r, m_r = args
    feats_t, feats_r = stage_feats(args)
    _, _, _, flow_full = dfpn_infer_apply(
        variables, x_t, m_t, x_r, m_r, feats_t, feats_r, dtype=DTYPE,
        base_size=model.base_size, use_softmax=model.use_softmax,
    )
    x_al, v_al = flows_ops.align_set(
        x_r, 1.0 - m_r, flow_full, precision=jax.lax.Precision.DEFAULT
    )
    v_map = jnp.clip(v_al - (1.0 - m_t[:, None]), 0.0, 1.0)
    return x_al, v_al, v_map


def timeit(fn):
    f = jax.jit(fn)
    args = (x_t, m_t, x_r, m_r)
    out = f(args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / ITERS * 1e3


prev = 0.0
for name, fn in (
    ("vgg pool4 (24f)", stage_feats),
    ("+ corr einsum", stage_corr),
    ("+ sep4d+softmax", stage_sep4d),
    ("+ mixer", stage_mixer),
    ("+ flow_64 est", stage_flow64),
    ("+ flow_256 est", stage_flow256),
    ("full align (+warp)", stage_full),
):
    t = timeit(fn)
    print(f"{name:20s}: {t:7.2f} ms  (delta {t - prev:+7.2f})", flush=True)
    prev = t

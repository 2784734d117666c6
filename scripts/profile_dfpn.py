"""Stage-by-stage timing of the DFPN serving path (bench config 4 shapes).

Times each sub-stage of ``dfpn_align`` as its own jitted program on the
real TPU (B=4, F=5 refs, 256², bf16 — the config-4 geometry), bounding
each measurement with one trailing scalar fetch (the axon relay ignores
``block_until_ready``, CLAUDE.md). Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_dfpn.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache
from master_thesis_tpu.config import Config
from master_thesis_tpu.models.dfpn import (
    AlignmentCorrelationMixer,
    FlowEstimator,
    SeparableConv4d,
    correlation_masked_4d,
    prepare_vgg_input,
)
from master_thesis_tpu.ops import flows as flows_ops
from master_thesis_tpu.ops import transforms
from master_thesis_tpu.train import build as build_mod

enable_compilation_cache()

B, F, H, W = 4, 5, 256, 256
ITERS = 20


def timeit(fn, *args):
    out = fn(*args)
    # Real sync: block_until_ready is a no-op through the axon relay.
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    # One trailing host fetch bounds the in-order device stream.
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    cfg = Config(compute_dtype="bfloat16")
    _, _, vgg_apply = build_mod.build_vgg(cfg)
    model, params = build_mod.build_dfpn(cfg, vgg_apply)
    align_fn = jax.jit(build_mod.dfpn_align_fn(cfg, model, params, vgg_apply))

    rng = np.random.RandomState(0)
    x_t = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    m_t = jnp.asarray((rng.rand(B, H, W, 1) > 0.9).astype(np.float32))
    x_r = jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32))
    m_r = jnp.asarray((rng.rand(B, F, H, W, 1) > 0.9).astype(np.float32))

    print(f"align_fn e2e: {timeit(align_fn, x_t, m_t, x_r, m_r):8.2f} ms")

    # --- VGG features (24 frames, pool-4) --------------------------------
    @jax.jit
    def vgg_stage(x_t, x_r):
        ft = vgg_apply(prepare_vgg_input(x_t), normalize_input=False)[3]
        fr = vgg_apply(
            prepare_vgg_input(x_r.reshape(B * F, H, W, 3)), normalize_input=False
        )[3]
        return ft, fr.reshape(B, F, 16, 16, 512)

    print(f"vgg feats (24 frames): {timeit(vgg_stage, x_t, x_r):8.2f} ms")
    ft, fr = vgg_stage(x_t, x_r)

    # --- correlation volume ----------------------------------------------
    p = params["params"]
    sub = lambda name: {"params": p[name]}
    dt = jnp.bfloat16

    @jax.jit
    def corr_stage(ft, fr, m_t, m_r):
        m_t_256 = transforms.interp.resize_hw(m_t, (16, 16), mode="nearest")
        m_r_256 = transforms.interp.resize_hw(
            m_r.reshape(B * F, H, W, 1), (16, 16), mode="nearest"
        ).reshape(B, F, 16, 16, 1)
        return correlation_masked_4d(ft, 1 - m_t_256, fr, 1 - m_r_256)

    print(f"corr volume: {timeit(corr_stage, ft, fr, m_t, m_r):8.2f} ms")
    corr = corr_stage(ft, fr, m_t, m_r)

    sep = SeparableConv4d(dtype=dt)
    sep_fn = jax.jit(lambda c: sep.apply(sub("separable4d"), c))
    print(f"separable4d: {timeit(sep_fn, corr):8.2f} ms")
    corr2 = sep_fn(corr)

    mixer = AlignmentCorrelationMixer(corr_size=16, dtype=dt)
    mixer_fn = jax.jit(lambda c: mixer.apply(sub("mixer"), c))
    print(f"mixer: {timeit(mixer_fn, corr2):8.2f} ms")
    flow_16 = mixer_fn(corr2)

    # --- resize sets + flow estimators -----------------------------------
    @jax.jit
    def resize_stage(x_t, m_t, x_r, m_r):
        a = transforms.resize_set_bis(x_t, m_t, x_r, m_r, (256, 256))
        b = transforms.resize_set_bis(x_t, m_t, x_r, m_r, (64, 64))
        return a, b

    print(f"resize sets: {timeit(resize_stage, x_t, m_t, x_r, m_r):8.2f} ms")
    (x_t_256, m_t_256, x_r_256, m_r_256), (x_t_64, m_t_64, x_r_64, m_r_64) = (
        resize_stage(x_t, m_t, x_r, m_r)
    )

    fe64 = FlowEstimator(dtype=dt)
    f64_pre = flows_ops.resize_flow(flow_16, (64, 64), mode="bilinear")
    f64_fn = jax.jit(
        lambda *a: fe64.apply(sub("flow_64"), *a)
    )
    print(
        f"flow_64 (20 frames @64px): "
        f"{timeit(f64_fn, x_t_64, m_t_64, x_r_64, m_r_64, f64_pre):8.2f} ms"
    )
    flow_64 = f64_fn(x_t_64, m_t_64, x_r_64, m_r_64, f64_pre)

    f256_pre = flows_ops.resize_flow(flow_64, (256, 256), mode="bilinear")
    f256_fn = jax.jit(lambda *a: fe64.apply(sub("flow_256"), *a))
    print(
        f"flow_256 (20 frames @256px): "
        f"{timeit(f256_fn, x_t_256, m_t_256, x_r_256, m_r_256, f256_pre):8.2f} ms"
    )
    flow_256 = f256_fn(x_t_256, m_t_256, x_r_256, m_r_256, f256_pre)

    # --- final warp -------------------------------------------------------
    @jax.jit
    def warp_stage(x_r, m_r, flow):
        return flows_ops.align_set(
            x_r, 1.0 - m_r, flow, precision=jax.lax.Precision.DEFAULT
        )

    print(f"align_set warp: {timeit(warp_stage, x_r, m_r, flow_256):8.2f} ms")


if __name__ == "__main__":
    main()

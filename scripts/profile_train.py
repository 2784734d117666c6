"""CHN production-train-step breakdown on the real TPU.

Times (bf16 compute, B=8, F=5, 256-px frames, nb=20, CPN aligner — the
BENCH_NOTES "CHN production train step" config):

- the full train step via the flax-module forward (the r2 355 ms path),
- the full train step via the hybrid pure-function forward
  (chn_train_fn: grouped head + Pallas trunk fwd + XLA-remat bwd),
- forward-only loss cost for both,
- trunk microbenchmarks at the trunk's real shape (40 frames, 64-px, nf=64):
  XLA fwd, XLA fwd+bwd, Pallas fwd, hybrid fwd+bwd,
- the frozen CPN aligner alone.

One trailing scalar fetch bounds each in-order timing run (the axon relay
ignores ``block_until_ready``, CLAUDE.md). Run:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache
from master_thesis_tpu.config import Config
from master_thesis_tpu.ops.pallas_rrdb import (
    make_hybrid_trunk,
    rrdb_trunk_pallas,
    rrdb_trunk_xla,
)
from master_thesis_tpu.train import build as build_mod, chn_task
from master_thesis_tpu.train import state as state_lib

enable_compilation_cache()

B, F, H, W, NB = 8, 5, 256, 256, 20
ITERS = 20


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    # Real sync: block_until_ready is a no-op through the axon relay.
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    cfg = Config(lr=1e-4)
    _, _, vgg_apply = build_mod.build_vgg(cfg)
    _, _, align_fn = build_mod.build_cpn(cfg)
    model, params = build_mod.build_chn(cfg)

    # Dispatch-overhead calibration: a trivial program, same timing loop.
    triv = jax.jit(lambda a: a * 1.0001)
    print(f"calibration (trivial jit): {timeit(triv, jnp.ones((8, 8))):8.2f} ms")

    rng = np.random.RandomState(0)
    y = jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32))
    m = jnp.asarray((rng.rand(B, F, H, W, 1) > 0.9).astype(np.float32))
    x = (1 - m) * y + m * 0.45

    # --- trunk microbench at the production trunk shape -------------------
    n_frames, hs = B * (F - 1), H // 4
    trunk_p = {
        k: v for k, v in params["params"]["nn"].items() if k.startswith("rrdb_")
    }
    xb = jnp.asarray(rng.rand(n_frames, hs, hs, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )
    cot = jnp.asarray(rng.rand(n_frames, hs, hs, 64).astype(np.float32)).astype(
        jnp.bfloat16
    )

    xla_fwd = jax.jit(
        lambda a, p: rrdb_trunk_xla(a, p, NB, 64, 32, dtype=jnp.bfloat16)
    )
    print(f"trunk XLA fwd ({n_frames}x{hs}^2): {timeit(xla_fwd, xb, trunk_p):8.2f} ms")

    def xla_loss(a, p):
        return jnp.vdot(
            rrdb_trunk_xla(a, p, NB, 64, 32, dtype=jnp.bfloat16), cot
        ).astype(jnp.float32)

    xla_fb = jax.jit(jax.grad(xla_loss, argnums=(0, 1)))
    print(f"trunk XLA fwd+bwd: {timeit(xla_fb, xb, trunk_p):8.2f} ms")

    pallas_fwd = jax.jit(
        lambda a, p: rrdb_trunk_pallas(a, p, nb=NB, nf=64, gc=32)
    )
    print(f"trunk Pallas fwd: {timeit(pallas_fwd, xb, trunk_p):8.2f} ms")

    hybrid = make_hybrid_trunk(NB, 64, 32, jnp.bfloat16)

    def hyb_loss(a, p):
        return jnp.vdot(hybrid(a, p), cot).astype(jnp.float32)

    hyb_fb = jax.jit(jax.grad(hyb_loss, argnums=(0, 1)))
    print(f"trunk hybrid fwd+bwd: {timeit(hyb_fb, xb, trunk_p):8.2f} ms")

    # --- aligner ----------------------------------------------------------
    t, r_list = chn_task.target_ref_indexes(F)
    x_t, m_t, x_r, m_r = x[:, t], m[:, t], x[:, r_list], m[:, r_list]
    align_jit = jax.jit(align_fn)
    print(f"CPN align (B={B}, {F - 1} refs): {timeit(align_jit, x_t, m_t, x_r, m_r):8.2f} ms")

    # --- full train steps -------------------------------------------------
    for label, chn_apply in (
        ("module", model.apply),
        ("hybrid", build_mod.chn_train_fn(cfg, model)),
    ):

        def fwd_only(params):
            xa, va, vm = align_fn(x_t, m_t, x_r, m_r)
            y_hat, y_hat_comp = chn_apply(params, x_t, 1 - m_t, xa, va, vm)
            total, _ = chn_task.compute_loss(
                y[:, t], 1 - m_t, y_hat, y_hat_comp, vm, vgg_apply
            )
            return total

        fwd_jit = jax.jit(fwd_only)
        print(f"fwd-only loss [{label}]: {timeit(fwd_jit, params):8.2f} ms")

        # Fresh param buffers per label: the donated train state consumes
        # its params, and `params` must survive for the next label.
        params_i = jax.tree_util.tree_map(jnp.array, params)
        state = state_lib.create_train_state(
            model.apply, params_i, cfg, steps_per_epoch=2000
        )
        step = chn_task.make_train_step(chn_apply, align_fn, vgg_apply)

        # warm up + time with state threading (donated buffers).
        state, items = step(state, x, m, y)
        float(np.asarray(items["loss"]))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, items = step(state, x, m, y)
        float(np.asarray(items["loss"]))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"train step [{label}]: {dt:8.2f} ms")


if __name__ == "__main__":
    main()

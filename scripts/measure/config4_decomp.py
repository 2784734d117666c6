"""Decompose the config-4 step (B=4, F=5, 256²): align-only, CHN-only,
and the fused end-to-end step, each at ITERS=20 with a single trailing
fetch — benchmarks.py uses iters=5, where the ~33 ms relay RTT adds
~6.6 ms/iter of bias, so this also re-checks the headline number."""
import time

import jax
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from master_thesis_tpu.config import Config
from master_thesis_tpu.models.chn import CHN, chn_infer_apply
from master_thesis_tpu.train import build as build_mod

B, F, H, W = 4, 5, 256, 256
ITERS = 20

cfg = Config(compute_dtype="bfloat16")
_, _, vgg_apply = build_mod.build_vgg(cfg)
model, params = build_mod.build_dfpn(cfg, vgg_apply)
align_fn = build_mod.dfpn_align_fn(cfg, model, params, vgg_apply)

key = jax.random.PRNGKey(0)
z = jnp.zeros
chn = CHN(nb=20, dtype=jnp.bfloat16)
chn_p = chn.init(
    key, z((1, 64, 64, 3)), z((1, 64, 64, 1)), z((1, 1, 64, 64, 3)),
    z((1, 1, 64, 64, 1)), z((1, 1, 64, 64, 1)),
)

rng = np.random.RandomState(0)
x_t = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
m_t = jnp.asarray((rng.rand(B, H, W, 1) > 0.9).astype(np.float32))
x_r = jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32))
m_r = jnp.asarray((rng.rand(B, F, H, W, 1) > 0.9).astype(np.float32))


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


align_jit = jax.jit(align_fn)
print(f"align only: {timeit(align_jit, x_t, m_t, x_r, m_r):7.2f} ms", flush=True)
xa, va, vm = jax.tree.map(jnp.asarray, align_jit(x_t, m_t, x_r, m_r))


@jax.jit
def chn_only(hp, x_t, m_t, xa, va, vm):
    _, comp = chn_infer_apply(hp, x_t, 1 - m_t, xa, va, vm, nb=20)
    return comp


print(f"chn only:   {timeit(chn_only, chn_p, x_t, m_t, xa, va, vm):7.2f} ms", flush=True)


@jax.jit
def step(hp, x_t, m_t, x_r, m_r):
    xa, va, vm = align_fn(x_t, m_t, x_r, m_r)
    _, comp = chn_infer_apply(hp, x_t, 1 - m_t, xa, va, vm, nb=20)
    return comp


for iters in (5, 20):
    print(
        f"e2e step (iters={iters}): {timeit(step, chn_p, x_t, m_t, x_r, m_r, iters=iters):7.2f} ms",
        flush=True,
    )

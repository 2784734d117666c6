"""A/B the hybrid FlowEstimator (selective Pallas fusion of the starved
segments only — models/dfpn.py:flow_estimator_apply_hybrid) against the
plain-XLA flax module and the r3 all-Pallas variant at the config-4
geometry (N=20 @256², bf16).

The r4 per-block profile (flow_profile.py) showed the 128²/256² blocks
already at 114-187 TFLOP/s while c0 (Cin=10) and the 64²/32² segments
starve at 9.5-49 — so the hybrid fuses only those.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/measure/flow_hybrid_ab.py
"""
import time

import jax
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from master_thesis_tpu.models.dfpn import (
    FlowEstimator,
    flow_estimator_apply_hybrid,
    flow_estimator_apply_pallas,
)

H = W = 256
ITERS = 20
DTYPE = jnp.bfloat16

fe = FlowEstimator(dtype=DTYPE)
rng = np.random.RandomState(0)
x_t = jnp.asarray(rng.rand(4, H, W, 3), DTYPE)
m_t = jnp.asarray((rng.rand(4, H, W, 1) > 0.9), DTYPE)
x_r = jnp.asarray(rng.rand(4, 5, H, W, 3), DTYPE)
m_r = jnp.asarray((rng.rand(4, 5, H, W, 1) > 0.9), DTYPE)
flow = jnp.asarray(rng.rand(4, 5, H, W, 2) * 2 - 1, DTYPE)
variables = fe.init(jax.random.PRNGKey(0), x_t, m_t, x_r, m_r, flow)
params = variables["params"]


def timeit(fn, label):
    out = fn(x_t, m_t, x_r, m_r, flow)
    ref = np.asarray(jax.device_get(out)).astype(np.float32)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x_t, m_t, x_r, m_r, flow)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:22s}: {ms:7.2f} ms", flush=True)
    return ms, ref


xla = jax.jit(lambda *a: fe.apply(variables, *a))
hyb = jax.jit(lambda *a: flow_estimator_apply_hybrid(params, *a, dtype=DTYPE))
pal = jax.jit(lambda *a: flow_estimator_apply_pallas(params, *a, dtype=DTYPE))

ms_x, out_x = timeit(xla, "xla (flax module)")
ms_h, out_h = timeit(hyb, "hybrid (selective)")
ms_p, out_p = timeit(pal, "all-pallas (r3)")

scale = np.abs(out_x).max()
print(f"\nhybrid-vs-xla  max|d|: {np.abs(out_h - out_x).max():.3e} "
      f"(out scale {scale:.3e})")
print(f"pallas-vs-xla  max|d|: {np.abs(out_p - out_x).max():.3e}")
print(f"\nhybrid speedup vs xla: {ms_x / ms_h:.3f}x")

"""A/B the 100 MB-VMEM full-frame trunk at the HEADLINE serving shape
(VERDICT r4 task 7): bench config 3 runs B=16 frames through the stride-4
head -> trunk grid 64² (HW=4096, fits the default 16 MB scoped window, r3
measured 33.5 ms ≈ 72% MXU). The r4 512² win raised the window to 100 MB
for HW=16384; this measures whether the raised window also helps (or
hurts: scoped-VMEM pressure can shrink Mosaic's double-buffering headroom)
at the small-grid shape before touching the routing."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

from master_thesis_tpu.models.chn import RRDB
from master_thesis_tpu.ops.pallas_rrdb import rrdb_trunk_pallas, rrdb_trunk_xla

NB, NF, GC = 20, 64, 32
N, H, W = 16, 64, 64  # trunk grid of the headline config (B=16 @256², s4 head)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(N, H, W, NF).astype(np.float32)).astype(jnp.bfloat16)
mod = RRDB(nf=NF, gc=GC)
params = {
    f"rrdb_{i}": mod.init(jax.random.PRNGKey(i), x[:1].astype(jnp.float32))["params"]
    for i in range(NB)
}
flops = 2 * 14.386e6 * N * H * W


def timeit(fn, *a, iters=20):
    out = fn(*a)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


default_w = jax.jit(lambda y: rrdb_trunk_pallas(y, params, NB))
t = timeit(default_w, x)
print(f"full-frame default window: {t:8.2f} ms (~{flops/(t*1e-3)/1e12:.1f} TFLOP/s)", flush=True)

bigvmem = jax.jit(lambda y: rrdb_trunk_pallas(y, params, NB, big_vmem=True))
t = timeit(bigvmem, x)
print(f"full-frame 100MB window:   {t:8.2f} ms (~{flops/(t*1e-3)/1e12:.1f} TFLOP/s)", flush=True)

xla = jax.jit(lambda y: rrdb_trunk_xla(y, params, NB, dtype=jnp.bfloat16))
t = timeit(xla, x)
print(f"XLA trunk:                 {t:8.2f} ms (~{flops/(t*1e-3)/1e12:.1f} TFLOP/s)", flush=True)

a = np.asarray(default_w(x).astype(jnp.float32))
b = np.asarray(bigvmem(x).astype(jnp.float32))
print("max|default-bigvmem| =", np.abs(a - b).max(), flush=True)

import time
import jax, jax.numpy as jnp, numpy as np
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from master_thesis_tpu.models.chn import RRDB
from master_thesis_tpu.ops.pallas_rrdb import (
    _band_rows, rrdb_trunk_pallas, rrdb_trunk_pallas_banded, rrdb_trunk_xla,
)

NB, NF, GC = 20, 64, 32
N, H, W = 16, 128, 128  # trunk shape of 512^2 serving (stride-4 head)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(N, H, W, NF).astype(np.float32)).astype(jnp.bfloat16)
mod = RRDB(nf=NF, gc=GC)
params = {
    f"rrdb_{i}": mod.init(jax.random.PRNGKey(i), x[:1].astype(jnp.float32))["params"]
    for i in range(NB)
}
print(f"band rows at W={W}: {_band_rows(NF, GC, W)}", flush=True)
flops = 2 * 14.386e6 * N * H * W  # 14.4M MAC/px for nb=20 trunk


def timeit(fn, *a, iters=5):
    out = fn(*a)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


banded = jax.jit(lambda y: rrdb_trunk_pallas_banded(y, params, NB))
t = timeit(banded, x)
print(f"banded Pallas trunk:    {t:8.2f} ms  (~{flops/(t*1e-3)/1e12:.1f} TFLOP/s)", flush=True)

bigvmem = jax.jit(lambda y: rrdb_trunk_pallas(y, params, NB, big_vmem=True))
t = timeit(bigvmem, x)
print(f"full-frame 100MB VMEM:  {t:8.2f} ms  (~{flops/(t*1e-3)/1e12:.1f} TFLOP/s)", flush=True)

xla = jax.jit(lambda y: rrdb_trunk_xla(y, params, NB, dtype=jnp.bfloat16))
t = timeit(xla, x)
print(f"XLA trunk:              {t:8.2f} ms  (~{flops/(t*1e-3)/1e12:.1f} TFLOP/s)", flush=True)

# parity spot-check banded / big-vmem vs xla at bf16 (loose: bf16 rounding)
a = np.asarray(banded(x).astype(jnp.float32))
b = np.asarray(xla(x).astype(jnp.float32))
c = np.asarray(bigvmem(x).astype(jnp.float32))
print("max|banded-xla|  =", np.abs(a - b).max(), flush=True)
print("max|bigvmem-xla| =", np.abs(c - b).max(), flush=True)

"""Serving batch sweep with the r3 kernels: B in (8, 16, 24, 32)."""
import time
import jax, jax.numpy as jnp, numpy as np
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from master_thesis_tpu.models.chn import CHN, chn_infer_apply
from master_thesis_tpu.models.cpn import CPN

f, h, w = 5, 256, 256
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
z = jnp.zeros
cpn = CPN(dtype=jnp.bfloat16)
chn = CHN(nb=20, dtype=jnp.bfloat16)
cpn_p = cpn.init(key, z((1, h, w, 3)), z((1, h, w, 1)), z((1, 1, h, w, 3)), z((1, 1, h, w, 1)))
chn_p = chn.init(key, z((1, h, w, 3)), z((1, h, w, 1)), z((1, 1, h, w, 3)),
                 z((1, 1, h, w, 1)), z((1, 1, h, w, 1)))

@jax.jit
def step(cp, hp, x_t, m_t, x_r, m_r):
    xa, va, vm = cpn.apply(cp, x_t, m_t, x_r, m_r, method=CPN.align)
    _, comp = chn_infer_apply(hp, x_t, 1 - m_t, xa, va, vm, nb=20)
    return comp

for b in (8, 16, 24, 32):
    x_t = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    m_t = jnp.asarray(rng.rand(b, h, w, 1) > 0.9, jnp.float32)
    x_r = jnp.asarray(rng.rand(b, f, h, w, 3), jnp.float32)
    m_r = jnp.asarray(rng.rand(b, f, h, w, 1) > 0.9, jnp.float32)
    out = step(cpn_p, chn_p, x_t, m_t, x_r, m_r)
    float(out.ravel()[0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(cpn_p, chn_p, x_t, m_t, x_r, m_r)
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"B={b}: {dt*1e3:7.2f} ms -> {b/dt:7.1f} frames/s", flush=True)

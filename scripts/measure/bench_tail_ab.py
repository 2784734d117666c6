"""A/B the headline bench step with pallas_tail on/off (and trunk on) to
see whether the tail kernel engages and what it buys in situ."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

from master_thesis_tpu.models.chn import CHN, chn_infer_apply
from master_thesis_tpu.models.cpn import CPN

b, f, h, w = 16, 5, 256, 256
rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)
z = jnp.zeros

cpn = CPN(dtype=jnp.bfloat16)
chn = CHN(nb=20, dtype=jnp.bfloat16)
cpn_params = cpn.init(
    key, z((1, h, w, 3)), z((1, h, w, 1)), z((1, 1, h, w, 3)), z((1, 1, h, w, 1))
)
chn_params = chn.init(
    key, z((1, h, w, 3)), z((1, h, w, 1)), z((1, 1, h, w, 3)),
    z((1, 1, h, w, 1)), z((1, 1, h, w, 1)),
)

x_t = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
m_t = jnp.asarray(rng.rand(b, h, w, 1) > 0.9, jnp.float32)
x_r = jnp.asarray(rng.rand(b, f, h, w, 3), jnp.float32)
m_r = jnp.asarray(rng.rand(b, f, h, w, 1) > 0.9, jnp.float32)


def make_step(pallas_trunk, pallas_tail):
    @jax.jit
    def inpaint_step(cpn_p, chn_p, x_t, m_t, x_r, m_r):
        xa, va, vm = cpn.apply(cpn_p, x_t, m_t, x_r, m_r, method=CPN.align)
        _, y_hat_comp = chn_infer_apply(
            chn_p, x_t, 1 - m_t, xa, va, vm, nb=20,
            pallas_trunk=pallas_trunk, pallas_tail=pallas_tail,
        )
        return y_hat_comp

    return inpaint_step


for trunk, tail in ((True, True), (True, False)):
    step = make_step(trunk, tail)
    try:
        t0 = time.perf_counter()
        out = step(cpn_params, chn_params, x_t, m_t, x_r, m_r)
        float(out.ravel()[0])
        tc = time.perf_counter() - t0
    except Exception as e:
        print(f"trunk={trunk} tail={tail}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(cpn_params, chn_params, x_t, m_t, x_r, m_r)
    float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    patch = np.asarray(out[:1, :1, :16, :16], dtype=np.float32)
    ok = bool(np.isfinite(patch).all() and patch.std() > 0)
    print(
        f"trunk={trunk} tail={tail}: {dt:6.1f} ms ({b / dt * 1e3:.1f} f/s),"
        f" sane={ok} (compile+1 {tc:.0f}s)", flush=True,
    )

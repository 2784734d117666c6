import sys, time
import jax, jax.numpy as jnp, numpy as np
from master_thesis_tpu.cache import enable_compilation_cache
from master_thesis_tpu.models.chn import RRDB
from master_thesis_tpu.ops.pallas_rrdb import rrdb_bwd_pallas

enable_compilation_cache()
for hw_side in (16, 32, 64):
    nf, gc, h, w, n = 64, 32, hw_side, hw_side, 2
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, h, w, nf).astype(np.float32)).astype(jnp.bfloat16)
    mod = RRDB(nf=nf, gc=gc)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    xc = x.reshape(n, h * w, nf).transpose(0, 2, 1)
    g = jnp.asarray(rng.rand(n, nf, h * w).astype(np.float32)).astype(jnp.bfloat16)
    fn = jax.jit(lambda a, b: rrdb_bwd_pallas(a, b, params, nf, gc, w))
    try:
        dx, dp = fn(xc, g)
        print(f"HW={h*w}: OK dx0={float(np.asarray(jax.device_get(dx.ravel()[0]))):.4f}", flush=True)
    except Exception as e:
        print(f"HW={h*w}: FAILED {type(e).__name__}", flush=True)
        with open(f"/tmp/bwd_err_{h*w}.txt", "w") as f:
            f.write(str(e))
        break

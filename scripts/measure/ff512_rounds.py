"""Pin the per-round cost of the ff device program at 512² (config-5
geometry). Runs inpaint_ff with different candidate distances D (round
counts) and exit thresholds e; the slope wall-clock/round gives the
in-situ cost of one refine round vs the 127 ms standalone
chn_infer_apply(F=16 @512²)."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

from master_thesis_tpu.infer.algorithms import Inpainter
from master_thesis_tpu.models.chn import CHN, chn_infer_apply

chn = CHN(nb=20, dtype=jnp.bfloat16)
z = jnp.zeros
variables = chn.init(
    jax.random.PRNGKey(0), z((1, 64, 64, 3)), z((1, 64, 64, 1)),
    z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)), z((1, 1, 64, 64, 1)),
)


def align_fn(x_t, m_t, x_r, m_r):
    v_r = 1 - m_r
    v_map = jnp.clip(v_r - (1 - m_t[:, None]), 0, 1)
    return x_r, v_r, v_map


inp = Inpainter(functools.partial(chn_infer_apply, nb=20), variables, align_fn)

rng = np.random.RandomState(0)
F, h, w = 12, 512, 512
y = np.broadcast_to(rng.rand(1, h, w, 3), (F, h, w, 3)).astype(np.float32)
m = np.zeros((F, h, w, 1), np.float32)
for t in range(F):
    m[t, 150 + 12 * t : 270 + 12 * t, 200:330] = 1
x = (1 - m) * y + m * 0.45

for D, e in ((1, 1.0), (3, 1.0), (20, 1.0), (20, 100.0)):
    out = inp.inpaint_ff(x, m, D=D, e=e)  # warmup/compile this bucket
    t0 = time.perf_counter()
    out = inp.inpaint_ff(x, m, D=D, e=e)
    dt = time.perf_counter() - t0
    print(f"ff D={D:2d} e={e:5.1f}: {dt*1e3:8.1f} ms", flush=True)

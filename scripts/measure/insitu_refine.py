"""In-situ vs standalone refine cost for the ff/ip device programs @512²
(VERDICT r3 weak #4: the r3 in-situ refine round measured 170-200 ms vs
127 ms standalone at F=16; the r4 ff program gathers compact C=8 batches).

Methodology: run each program with ``e=-1`` so NO frame ever satisfies the
hole-threshold exit — every frame consumes its whole candidate list, and
the loop schedule becomes fully deterministic. The exact number of
while-loop iterations (ff) / total refine calls (ip) is then reproduced by
a host-side simulation of the same pointer/gather logic, giving

    in-situ per-iteration cost = wall_time / n_iterations

to compare against a directly-timed standalone ``_refine_impl`` jit at the
same batch shape (C=8 for ff, B=1 for ip). One trailing scalar fetch
bounds the in-order device stream (CLAUDE.md timing rule).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

from master_thesis_tpu.infer.algorithms import Inpainter, _bucket, get_indexes_ff, get_indexes_ip
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
x_d, m_d = jnp.asarray(x), jnp.asarray(m)
float(np.asarray(x_d.ravel()[0]))


def ff_iterations(F_real, fp, C, D):
    """Host twin of the ff gather schedule at e=-1 (hole>e always true):
    iterations until every frame's pointer exhausts."""
    n_cands = np.zeros(fp, np.int64)
    for t in range(F_real):
        n_cands[t] = len(get_indexes_ff(t, F_real, 1, D))
    kptr = np.zeros(fp, np.int64)
    have = np.zeros(fp, bool)
    iters = 0
    while True:
        el = (~have | True) & (kptr < n_cands)  # e=-1: hole>e always
        if not el.any():
            return iters, int(n_cands.sum())
        idx = np.nonzero(el)[0][:C]
        kptr[idx] += 1
        have[idx] = True
        iters += 1


def timeit(fn, iters=3):
    out = fn()
    float(np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters


fp = _bucket(F)
C = min(fp, 8)

# --- standalone refine at the compact batch shape (C=8) and at B=1 -------
for B in (C, 1):
    xa = x_d[:B]
    ma = m_d[:B]
    dt = timeit(lambda: inp._refine(xa, ma, xa, ma, jnp.ones((B,), bool)))
    print(f"standalone refine B={B} @512²: {dt*1e3:8.1f} ms", flush=True)

# --- ff in-situ: exhaust all candidates (e=-1), derive per-iteration ------
# (single D: the D=3 width bucket would be a separate multi-minute compile;
# the iteration count is exact from the host schedule twin, so one point
# suffices for the per-iteration quotient.)
for D in (20,):
    n_iter, n_ref = ff_iterations(F, fp, C, D)
    dt = timeit(lambda: inp.inpaint_ff(x_d, m_d, D=D, e=-1.0, as_numpy=False))
    print(
        f"ff e=-1 D={D:2d}: {dt*1e3:8.1f} ms total, {n_iter} iters "
        f"({n_ref} refines) -> {dt*1e3/n_iter:6.1f} ms/iter @C={C}",
        flush=True,
    )

# --- ip in-scan: every frame consumes its whole candidate list ------------
t_list = sorted(range(F), key=lambda i: abs(i - F // 2))
for D in (3, 20):
    n_ref = sum(len(get_indexes_ip(t, t_list, 1, D)) for t in t_list)
    n_ref += fp - F  # padded frames: 1 inert refine each
    dt = timeit(lambda: inp.inpaint_ip(x_d, m_d, D=D, e=-1.0, as_numpy=False))
    print(
        f"ip e=-1 D={D:2d}: {dt*1e3:8.1f} ms total, {n_ref} refines "
        f"-> {dt*1e3/n_ref:6.1f} ms/refine @B=1",
        flush=True,
    )

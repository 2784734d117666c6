"""Per-kernel microbenchmarks: each r3 fused path vs its XLA twin at
production shapes. Run on the real TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()


def timeit(fn, *a, iters=20):
    out = fn(*a)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


rng = np.random.RandomState(0)
key = jax.random.PRNGKey(0)

# ---- Tail: phase-space kernel vs XLA (B=16 serving frames = 80) ----
from master_thesis_tpu.models.chn import RRDBNet, rrdbnet_tail_forward
from master_thesis_tpu.ops.pallas_tail import rrdbnet_tail_pallas

net = RRDBNet(nb=1)
p = net.init(key, jnp.zeros((1, 64, 64, 9)))["params"]
y = jnp.asarray(rng.rand(80, 64, 64, 64).astype(np.float32)).astype(jnp.bfloat16)
t_x = timeit(jax.jit(lambda v: rrdbnet_tail_forward(p, v, jnp.bfloat16)), y)
t_p = timeit(jax.jit(lambda v: rrdbnet_tail_pallas(p, v, jnp.bfloat16)), y)
print(f"tail 80f@64²grid: XLA {t_x:7.2f} ms | pallas {t_p:7.2f} ms", flush=True)

# ---- sep4d: fused tile stacks vs module (config-4: b=4, f=5) ----
from master_thesis_tpu.models.dfpn import SeparableConv4d
from master_thesis_tpu.ops.pallas_sep4d import sep4d_apply_pallas

corr = jnp.asarray(rng.randn(4, 5, 16, 16, 16, 16).astype(np.float32)).astype(jnp.bfloat16)
mod = SeparableConv4d(dtype=jnp.bfloat16)
sp = mod.init(key, corr)["params"]
t_x = timeit(jax.jit(lambda v: mod.apply({"params": sp}, v)), corr)
t_p = timeit(jax.jit(lambda v: sep4d_apply_pallas(sp, v, jnp.bfloat16)), corr)
print(f"sep4d b4f5: XLA {t_x:7.2f} ms | pallas {t_p:7.2f} ms", flush=True)

# ---- mixer ----
from master_thesis_tpu.models.dfpn import AlignmentCorrelationMixer
from master_thesis_tpu.ops.pallas_sep4d import mixer_apply_pallas

mmod = AlignmentCorrelationMixer(corr_size=16, dtype=jnp.bfloat16)
mp = mmod.init(key, corr)["params"]
t_x = timeit(jax.jit(lambda v: mmod.apply({"params": mp}, v)), corr)
t_p = timeit(jax.jit(lambda v: mixer_apply_pallas(mp, v, 16, jnp.bfloat16)), corr)
print(f"mixer b4f5: XLA {t_x:7.2f} ms | pallas {t_p:7.2f} ms", flush=True)

# ---- flow estimator (256² cascade stage, config-4) ----
from master_thesis_tpu.models.dfpn import FlowEstimator, flow_estimator_apply_pallas

b, f, h, w = 4, 5, 256, 256
fmod = FlowEstimator(dtype=jnp.bfloat16)
x_t = jnp.asarray(rng.rand(b, h, w, 3).astype(np.float32))
m_t = jnp.asarray((rng.rand(b, h, w, 1) > 0.8).astype(np.float32))
x_r = jnp.asarray(rng.rand(b, f, h, w, 3).astype(np.float32))
m_r = jnp.asarray((rng.rand(b, f, h, w, 1) > 0.8).astype(np.float32))
fp = jnp.asarray(rng.randn(b, f, h, w, 2).astype(np.float32) * 0.1)
fpar = fmod.init(key, x_t, m_t, x_r, m_r, fp)["params"]
t_x = timeit(jax.jit(lambda *a: fmod.apply({"params": fpar}, *a)), x_t, m_t, x_r, m_r, fp)
t_p = timeit(jax.jit(lambda *a: flow_estimator_apply_pallas(fpar, *a, dtype=jnp.bfloat16)), x_t, m_t, x_r, m_r, fp)
print(f"flow256 b4f5: XLA(module+s2d) {t_x:7.2f} ms | pallas {t_p:7.2f} ms", flush=True)

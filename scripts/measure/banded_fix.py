"""On-chip check of the banded-stack Mosaic fix: flow estimator (the
shape that failed with "offset mismatch on non-concat dimension") and
the fused VGG pool-4, each vs its XLA twin."""
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

# ---- VGG pool-4 (config-4 feature extraction: 24 frames @256²) ----
from master_thesis_tpu.models.vgg import VGGFeatures, vgg_pool4_pallas

vmod = VGGFeatures(dtype=jnp.bfloat16)
xv = jnp.asarray(rng.rand(24, 256, 256, 3).astype(np.float32))
vp = vmod.init(key, jnp.zeros((1, 64, 64, 3)))["params"]
t_x = timeit(jax.jit(lambda v: vmod.apply({"params": vp}, v, normalize_input=False)[3]), xv)
t_p = timeit(jax.jit(lambda v: vgg_pool4_pallas(vp, v)), xv)
print(f"vgg-pool4 24f: XLA {t_x:7.2f} ms | pallas {t_p:7.2f} ms", flush=True)

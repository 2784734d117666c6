"""Per-resolution stage profile of the DFPN FlowEstimator (VERDICT r4
item 2: the estimators run at ~51% MXU inside config 4 — find WHERE).

Times each resolution block of the 21-conv schedule standalone at the
config-4 geometry (B*F=20 frames, 256² cascade, bf16 serving dtype), plus
the whole module, each at ITERS with one trailing fetch. Emits per-block
ms, FLOPs, and effective TFLOP/s so the kernel attack targets the right
block.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/measure/flow_profile.py
"""
import time

import jax
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp

from master_thesis_tpu.models.dfpn import FlowEstimator

N, H, W = 20, 256, 256  # config 4: B=4, F=5 folded
ITERS = 20
DTYPE = jnp.bfloat16

fe = FlowEstimator(dtype=DTYPE)
key = jax.random.PRNGKey(0)
rng = np.random.RandomState(0)
x_t = jnp.asarray(rng.rand(4, H, W, 3), DTYPE)
m_t = jnp.asarray((rng.rand(4, H, W, 1) > 0.9), DTYPE)
x_r = jnp.asarray(rng.rand(4, 5, H, W, 3), DTYPE)
m_r = jnp.asarray((rng.rand(4, 5, H, W, 1) > 0.9), DTYPE)
flow = jnp.asarray(rng.rand(4, 5, H, W, 2) * 2 - 1, DTYPE)
params = fe.init(key, x_t, m_t, x_r, m_r, flow)

# (name, kernel, stride, transpose?) mirroring FlowEstimator.__call__.
SCHED = [
    ("c0", 5, 1, False), ("c1", 3, 1, False),
    ("c2", 5, 2, False), ("c3", 5, 1, False), ("c4", 3, 1, False),
    ("c5", 3, 2, False), ("c6", 5, 1, False), ("c7", 3, 1, False),
    ("c8", 3, 2, False), ("c9", 5, 1, False), ("c10", 3, 1, False),
    ("t0", 3, 2, True), ("c11", 5, 1, False), ("c12", 3, 1, False),
    ("t1", 3, 2, True), ("c13", 5, 1, False), ("c14", 3, 1, False),
    ("t2", 5, 2, True), ("c15", 5, 1, False), ("c16", 3, 1, False),
    ("c17", 3, 1, False),
]
PAD = {"t0": 1, "t1": 1, "t2": 2}

BLOCKS = [
    ("256-in  (c0-c1)", ["c0", "c1"]),
    ("128-down(c2-c4)", ["c2", "c3", "c4"]),
    ("64-down (c5-c7)", ["c5", "c6", "c7"]),
    ("32      (c8-c10)", ["c8", "c9", "c10"]),
    ("64-up   (t0-c12)", ["t0", "c11", "c12"]),
    ("128-up  (t1-c14)", ["t1", "c13", "c14"]),
    ("256-out (t2-c17)", ["t2", "c15", "c16", "c17"]),
]


def apply_one(name, x):
    from flax import linen as nn

    from master_thesis_tpu.models.nn_ext import Conv, ConvTranspose2dTorch

    k, s, tr = next((k, s, t) for n, k, s, t in SCHED if n == name)
    feats = 2 if name == "c17" else 128
    if tr:
        mod = ConvTranspose2dTorch(
            features=128, kernel_size=(k, k), strides=(2, 2),
            padding=(PAD[name], PAD[name]), output_padding=(1, 1),
            dtype=DTYPE, use_phase=False,
        )
    else:
        mod = Conv(
            features=feats, kernel_size=(k, k), strides=(s, s),
            padding=(k // 2, k // 2), dtype=DTYPE, use_s2d=False,
        )
    out = mod.apply({"params": params["params"][name]}, x)
    return out if name == "c17" else jax.nn.relu(out)


def block_fn(names):
    def run(x):
        for n in names:
            x = apply_one(n, x)
        return x
    return jax.jit(run)


def flops(names, h_in):
    total, h = 0, h_in
    for name in names:
        k, s, tr = next((k, s, t) for n, k, s, t in SCHED if n == name)
        cin = 10 if name == "c0" else 128
        cout = 2 if name == "c17" else 128
        h_out = h * 2 if tr else h // s
        total += 2 * N * h_out * h_out * k * k * cin * cout
        h = h_out
    return total


def timeit(fn, x, iters=ITERS):
    out = fn(x)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


res_in = {"256-in": 256, "128-down": 256, "64-down": 128, "32": 64,
          "64-up": 32, "128-up": 64, "256-out": 128}
total_ms, total_fl = 0.0, 0
for label, names in BLOCKS:
    h_in = res_in[label.split("(")[0].strip()]
    cin = 10 if names[0] == "c0" else 128
    x = jnp.asarray(rng.rand(N, h_in, h_in, cin), DTYPE)
    t = timeit(block_fn(names), x)
    fl = flops(names, h_in)
    total_ms += t
    total_fl += fl
    print(f"{label}: {t:7.2f} ms  {fl/1e9:7.1f} GFLOP  "
          f"{fl/(t*1e-3)/1e12:6.1f} TFLOP/s", flush=True)

full = jax.jit(lambda xt, mt, xr, mr, f: fe.apply(params, xt, mt, xr, mr, f))
out = full(x_t, m_t, x_r, m_r, flow)
float(np.asarray(jax.device_get(out.ravel()[0])))
t0 = time.perf_counter()
for _ in range(ITERS):
    out = full(x_t, m_t, x_r, m_r, flow)
float(np.asarray(jax.device_get(out.ravel()[0])))
t_full = (time.perf_counter() - t0) / ITERS * 1e3
print(f"\nblocks sum: {total_ms:7.2f} ms  {total_fl/1e9:7.1f} GFLOP  "
      f"{total_fl/(total_ms*1e-3)/1e12:6.1f} TFLOP/s")
print(f"full module: {t_full:6.2f} ms  ({total_fl/(t_full*1e-3)/1e12:6.1f} TFLOP/s)",
      flush=True)

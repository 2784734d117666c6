"""In-graph per-block attribution INSIDE the two align stages with
measured headroom (align_decomp.py r4: flow_256 26.4 ms @~132 TFLOP/s,
VGG pool4 9.9 ms @~100 TFLOP/s): cumulative prefixes of the VGG conv
blocks and of the flow_256 estimator's 7 resolution blocks, each timed
in-graph (jit around the whole prefix), so the deltas include XLA's
cross-block fusion. Standalone per-block numbers (flow_profile.py)
mis-rank — see BENCH_NOTES.md r4 hybrid lesson.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/measure/align_inner_decomp.py
"""
import time

import jax
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
from flax import linen as nn

from master_thesis_tpu.config import Config
from master_thesis_tpu.models.nn_ext import Conv, ConvTranspose2dTorch
from master_thesis_tpu.train import build as build_mod

N, H, W = 20, 256, 256
ITERS = 20
DTYPE = jnp.bfloat16

cfg = Config(compute_dtype="bfloat16")
_, vgg_vars, vgg_apply = build_mod.build_vgg(cfg)
model, variables = build_mod.build_dfpn(cfg, vgg_apply)
fp = variables["params"]["flow_256"]

rng = np.random.RandomState(0)

# ---- flow_256 estimator: the c0..c17/t0..t2 schedule at 256² ----------
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


def apply_one(name, x):
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
    out = mod.apply({"params": fp[name]}, x)
    return out if name == "c17" else nn.relu(out)


PREFIXES = [
    ("c0 (Cin=10 5x5)", ["c0"]),
    ("+c1 (256²)", ["c1"]),
    ("+c2-c4 (128²)", ["c2", "c3", "c4"]),
    ("+c5-c7 (64²)", ["c5", "c6", "c7"]),
    ("+c8-c10 (32²)", ["c8", "c9", "c10"]),
    ("+t0-c12 (64²)", ["t0", "c11", "c12"]),
    ("+t1-c14 (128²)", ["t1", "c13", "c14"]),
    ("+t2-c17 (256²)", ["t2", "c15", "c16", "c17"]),
]

x10 = jnp.asarray(rng.rand(N, H, W, 10), DTYPE)


def timeit(f, x):
    out = f(x)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(x)
    float(np.asarray(jax.device_get(out.ravel()[0])))
    return (time.perf_counter() - t0) / ITERS * 1e3


print("flow_256 in-graph prefixes (N=20 @256² bf16):", flush=True)
names_so_far = []
prev = 0.0
for label, names in PREFIXES:
    names_so_far = names_so_far + names

    def run(x, names=tuple(names_so_far)):
        for n in names:
            x = apply_one(n, x)
        return x

    t = timeit(jax.jit(run), x10)
    print(f"  {label:18s}: {t:7.2f} ms  (delta {t - prev:+7.2f})", flush=True)
    prev = t

# ---- VGG through pool4: per-block prefixes -----------------------------
print("\nvgg pool4 in-graph prefixes (24 frames @256² bf16):", flush=True)
x3 = jnp.asarray(rng.rand(24, H, W, 3), DTYPE)
for i in (0, 1, 2, 3):
    def run(x, upto=i):
        return vgg_apply(x, normalize_input=False)[upto]

    t = timeit(jax.jit(run), x3)
    print(f"  through pool{i + 1}: {t:7.2f} ms", flush=True)

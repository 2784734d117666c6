"""Localize the DFPN train-step regression (r2: 37 ms, r3: 101 ms at
B=2, F=2, 256²): time the forward, the loss pipeline, the grad, and the
training-precision warps separately."""
import time, numpy as np, jax, jax.numpy as jnp
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from master_thesis_tpu.config import Config
from master_thesis_tpu.train import build as build_mod, dfpn_task, state as state_lib
from master_thesis_tpu.ops import flows as flows_ops


def timeit(fn, *a, iters=10):
    out = fn(*a)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


cfg = Config(compute_dtype="bfloat16")
_, _, vgg_apply = build_mod.build_vgg(cfg)
rng = np.random.RandomState(0)
b, f, h, w = 2, 2, 256, 256
y = rng.rand(b, f, h, w, 3).astype(np.float32)
m = (rng.rand(b, f, h, w, 1) > 0.9).astype(np.float32)
x = (1 - m) * y + m * 0.45
grid = np.asarray(flows_ops.identity_grid(h, w))
fg = np.broadcast_to(grid, (b, f, h, w, 2)).astype(np.float32)
fu = np.ones((b,), np.float32)
x, m, y, fg, fu = map(jnp.asarray, (x, m, y, fg, fu))

model, params = build_mod.build_dfpn(cfg, vgg_apply)

# 1. fwd+loss only (no grad)
fl = jax.jit(
    lambda p: dfpn_task.forward_and_loss(
        model.apply, p, vgg_apply, x, m, y, fg, fu
    )[0]
)
print(f"fwd+loss:        {timeit(fl, params):7.1f} ms", flush=True)

# 2. grad of loss (no optimizer)
gr = jax.jit(lambda p: jax.grad(
    lambda q: dfpn_task.forward_and_loss(model.apply, q, vgg_apply, x, m, y, fg, fu)[0]
)(p))
print(f"grad:            {timeit(gr, params):7.1f} ms", flush=True)

# 3. training-precision (f32) warp alone at the two loss resolutions
for s in (64, 256):
    xs = jnp.asarray(rng.rand(b, f, s, s, 3).astype(np.float32))
    vs = jnp.ones((b, f, s, s, 1), jnp.float32)
    gs = jnp.asarray(
        np.broadcast_to(np.asarray(flows_ops.identity_grid(s, s)), (b, f, s, s, 2))
    ).astype(jnp.float32)
    wfn = jax.jit(lambda a, v, g: flows_ops.align_set(a, v, g))
    print(f"align_set f32 @{s}²: {timeit(wfn, xs, vs, gs):7.2f} ms", flush=True)

# 4. the warp's VJP at 256² (training pays this inside grad)
xs = jnp.asarray(rng.rand(b, f, 256, 256, 3).astype(np.float32))
vs = jnp.ones((b, f, 256, 256, 1), jnp.float32)
gs = fg
wg = jax.jit(lambda a: jax.grad(
    lambda q: flows_ops.align_set(q, vs, gs)[0].sum()
)(a))
print(f"align_set VJP @256²: {timeit(wg, xs):7.2f} ms", flush=True)

# 5. flow-grad VJP (grad flows through the GRID too in training)
wg2 = jax.jit(lambda g: jax.grad(
    lambda q: flows_ops.align_set(xs, vs, q)[0].sum()
)(g))
print(f"align_set grid-VJP @256²: {timeit(wg2, fg):7.2f} ms", flush=True)

import time, numpy as np, jax, jax.numpy as jnp
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from master_thesis_tpu.config import Config
from master_thesis_tpu.train import build as build_mod, chn_task, dfpn_task, state as state_lib

cfg = Config(compute_dtype="bfloat16", chn_nb=20)
_, _, vgg_apply = build_mod.build_vgg(cfg)
rng = np.random.RandomState(0)

# --- CHN production train step (B=8, F=5, 256^2, CPN aligner) ---
cpn_model, cpn_params, cpn_align = build_mod.build_cpn(cfg)
chn_model, chn_params = build_mod.build_chn(cfg)
# The CLI trains through chn_train_fn (the fused-Pallas-trunk custom_vjp
# path on TPU backends, __main__.py) — measure THAT, not the flax module.
chn_apply = build_mod.chn_train_fn(cfg, chn_model)
st = state_lib.create_train_state(chn_apply, chn_params, cfg, steps_per_epoch=2000)
step = chn_task.make_train_step(chn_apply, cpn_align, vgg_apply)
b, f, h, w = 8, 5, 256, 256
y = rng.rand(b,f,h,w,3).astype(np.float32)
m = (rng.rand(b,f,h,w,1) > 0.9).astype(np.float32)
x = (1-m)*y + m*0.45
x, m, y = map(jnp.asarray, (x, m, y))
t0 = time.perf_counter()
st, items = step(st, x, m, y)
l0 = float(items["loss"]); print("CHN compile+1: %.0fs loss0=%.4f" % (time.perf_counter()-t0, l0), flush=True)
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    st, items = step(st, x, m, y)
lN = float(items["loss"])
dt = (time.perf_counter()-t0)/iters
print("CHN train step: %.1f ms  loss %0.4f -> %0.4f" % (dt*1e3, l0, lN), flush=True)

# --- DFPN train step (B=2, F=2, 256^2) ---
from master_thesis_tpu.ops import flows as flows_ops
dfpn_model, dfpn_params = build_mod.build_dfpn(cfg, vgg_apply)
st2 = state_lib.create_train_state(dfpn_model.apply, dfpn_params, cfg, steps_per_epoch=2000)
dstep = dfpn_task.make_train_step(dfpn_model.apply, vgg_apply)
b, f = 2, 2
y = rng.rand(b,f,h,w,3).astype(np.float32)
m = (rng.rand(b,f,h,w,1) > 0.9).astype(np.float32)
x = (1-m)*y + m*0.45
grid = np.asarray(flows_ops.identity_grid(h, w))
fg = np.broadcast_to(grid, (b,f,h,w,2)).astype(np.float32)
fu = np.ones((b,), np.float32)
x, m, y, fg, fu = map(jnp.asarray, (x, m, y, fg, fu))
t0 = time.perf_counter()
st2, it2 = dstep(st2, x, m, y, fg, fu)
l0 = float(it2["loss"]); print("DFPN compile+1: %.0fs loss0=%.4f" % (time.perf_counter()-t0, l0), flush=True)
t0 = time.perf_counter()
for _ in range(iters):
    st2, it2 = dstep(st2, x, m, y, fg, fu)
lN = float(it2["loss"])
dt = (time.perf_counter()-t0)/iters
print("DFPN train step: %.1f ms  loss %0.4f -> %0.4f" % (dt*1e3, l0, lN), flush=True)

"""A/B the DFPN production train step against the nn_ext stride-folding
rewrites (forward-exact; their VJPs lower differently). r2 measured 37 ms;
the r3 step with both rewrites on measured 101 ms — find the culprit."""
import time, numpy as np, jax, jax.numpy as jnp
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from master_thesis_tpu.config import Config
from master_thesis_tpu.models import nn_ext
from master_thesis_tpu.train import build as build_mod, dfpn_task, state as state_lib
from master_thesis_tpu.ops import flows as flows_ops

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

for s2d, ptc in ((True, True), (False, True), (True, False), (False, False)):
    nn_ext.USE_S2D_CONV = s2d
    nn_ext.USE_PHASE_TRANSPOSE = ptc
    model, params = build_mod.build_dfpn(cfg, vgg_apply)
    st = state_lib.create_train_state(model.apply, params, cfg, steps_per_epoch=2000)
    step = dfpn_task.make_train_step(model.apply, vgg_apply)
    t0 = time.perf_counter()
    st, items = step(st, x, m, y, fg, fu)
    l0 = float(items["loss"])
    tc = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        st, items = step(st, x, m, y, fg, fu)
    lN = float(items["loss"])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"s2d={int(s2d)} phase_tc={int(ptc)}: {dt:6.1f} ms (compile {tc:.0f}s, loss {l0:.3f}->{lN:.3f})", flush=True)

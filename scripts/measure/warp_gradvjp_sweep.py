"""Sweep the tent-matmul warp's GRID-VJP cost (training pays this for
every loss warp — the DFPN step regression). B·F=4 frames @256², f32."""
import time, numpy as np, jax, jax.numpy as jnp
from master_thesis_tpu.cache import enable_compilation_cache
enable_compilation_cache()
from master_thesis_tpu.ops import flows as flows_ops
from master_thesis_tpu.ops.grid_sample import grid_sample_mm


def timeit(fn, *a, iters=10):
    out = fn(*a)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


rng = np.random.RandomState(0)
n, h, w, c = 4, 256, 256, 3
x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
grid = jnp.asarray(
    np.broadcast_to(np.asarray(flows_ops.identity_grid(h, w)), (n, h, w, 2))
).astype(jnp.float32) + 0.01 * jnp.asarray(rng.randn(n, h, w, 2).astype(np.float32))

for rc, cc in ((16, 0), (8, 0), (32, 0), (64, 0), (128, 0), (256, 0)):
    f = jax.jit(lambda g: jax.grad(
        lambda q: grid_sample_mm(x, q, row_chunk=rc, col_chunk=cc).sum()
    )(g))
    fw = jax.jit(lambda g: grid_sample_mm(x, g, row_chunk=rc, col_chunk=cc))
    print(
        f"rc={rc:3d} cc={cc:3d}: fwd {timeit(fw, grid):7.2f} ms | "
        f"grid-VJP {timeit(f, grid):7.2f} ms", flush=True,
    )

"""Tile-size sweep of grid_sample_mm on the real TPU.

Times the bench-critical warp shapes (CPN align: N=80 @256²; DFPN align:
N=20 @256²; config-5: N=16 @512²) over (row_chunk, col_chunk) pairs with
near-identity alignment-like grids, bf16 serving precision. One trailing
scalar fetch bounds each run (axon relay ignores block_until_ready).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_warp.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache
from master_thesis_tpu.ops.grid_sample import affine_grid, grid_sample_mm

enable_compilation_cache()


def timeit(fn, *args, iters=20):
    out = fn(*args)
    float(np.asarray(jax.device_get(out.ravel()[0])))  # full warmup sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # Scalar-only trailing fetch (np.asarray(out) would drag the whole
    # result through the relay and swamp the measurement).
    float(np.asarray(jax.device_get(out.ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    shapes = [(80, 256, 256, 4), (20, 256, 256, 4), (16, 512, 512, 4)]
    tiles = [(8, 0), (8, 64), (8, 128), (16, 128), (8, 256), (16, 256), (4, 0)]
    for n, h, w, c in shapes:
        x = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
        # Near-identity affine (the alignment-like common case).
        theta = np.tile(np.array([[1.0, 0, 0], [0, 1, 0]], np.float32), (n, 1, 1))
        theta[:, :, :2] += 0.02 * rng.randn(n, 2, 2).astype(np.float32)
        theta[:, :, 2] += 0.05 * rng.randn(n, 2).astype(np.float32)
        grid = affine_grid(jnp.asarray(theta), (h, w))
        print(f"shape N={n} {h}x{w} C={c}:")
        for t, tc in tiles:
            tcv = tc if tc else w
            fn = jax.jit(
                lambda x, g, t=t, tcv=tcv: grid_sample_mm(
                    x, g, row_chunk=t, col_chunk=tcv,
                    precision=jax.lax.Precision.DEFAULT,
                )
            )
            print(f"  rows={t:3d} cols={tcv:3d}: {timeit(fn, x, grid):8.2f} ms")


if __name__ == "__main__":
    main()

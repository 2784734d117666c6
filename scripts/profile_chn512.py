"""Per-stage timing of the CHN serving path at 512² (config-5 geometry).

One config-5 ff round is `_refine_impl`: identity align + chn_infer_apply
on (F, 512, 512) with 1 ref per frame. This times each stage as its own
jitted program on the real TPU — head (grouped), trunk (XLA fallback at
HW=16384), tail, full chn_infer_apply, and the refine round — to find
where the 512² time actually goes. One trailing scalar fetch bounds each
in-order run (the axon relay ignores ``block_until_ready``, CLAUDE.md).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_chn512.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache
from master_thesis_tpu.models.chn import (
    CHN,
    chn_head_grouped,
    chn_infer_apply,
    rrdbnet_head_forward,
    rrdbnet_tail_forward,
)
from master_thesis_tpu.ops.pallas_rrdb import rrdb_trunk_xla

enable_compilation_cache()

F, H, W, NB = 16, 512, 512, 20
ITERS = 10


def timeit(fn, *args, iters=ITERS):
    out = fn(*args)
    # Real sync: block_until_ready is a no-op through the axon relay.
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    chn = CHN(nb=NB, dtype=jnp.bfloat16)
    z = jnp.zeros
    variables = chn.init(
        jax.random.PRNGKey(0), z((1, 64, 64, 3)), z((1, 64, 64, 1)),
        z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)), z((1, 1, 64, 64, 1)),
    )
    params = variables["params"]["nn"]

    rng = np.random.RandomState(0)
    x_t = jnp.asarray(rng.rand(F, H, W, 3).astype(np.float32))
    v_t = jnp.asarray((rng.rand(F, H, W, 1) > 0.1).astype(np.float32))
    x_r = jnp.asarray(rng.rand(F, 1, H, W, 3).astype(np.float32))
    v_r = jnp.asarray((rng.rand(F, 1, H, W, 1) > 0.1).astype(np.float32))
    v_m = jnp.asarray((rng.rand(F, 1, H, W, 1) > 0.8).astype(np.float32))

    # Full serving forward (what one ff round runs per active frame set).
    full = jax.jit(
        lambda *a: chn_infer_apply(variables, *a, nb=NB)
    )
    print(f"chn_infer_apply (F={F} @512²): {timeit(full, x_t, v_t, x_r, v_r, v_m):8.2f} ms")

    # Grouped head on the 9-channel composite.
    head = jax.jit(
        lambda *a: chn_head_grouped(params, *a, dtype=jnp.bfloat16)
    )
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    x_t_n = (x_t - mean) / std
    x_r_n = (x_r - mean) / std
    print(f"head (grouped, stride-4): {timeit(head, x_t_n, v_t, x_r_n, v_r, v_m):8.2f} ms")
    y0 = head(x_t_n, v_t, x_r_n, v_r, v_m)

    # Trunk at HW=16384 (the XLA fallback path config 5 takes today).
    trunk_params = {k: v for k, v in params.items() if k.startswith("rrdb_")}
    trunk = jax.jit(
        lambda y: rrdb_trunk_xla(y, trunk_params, NB, dtype=jnp.bfloat16)
    )
    t_ms = timeit(trunk, y0)
    flops = 2 * 14.386e6 * y0.shape[0] * y0.shape[1] * y0.shape[2]  # 14.4M MAC/px
    print(
        f"trunk XLA (HW={y0.shape[1]*y0.shape[2]}, {y0.shape[0]} frames): "
        f"{t_ms:8.2f} ms  (~{flops / (t_ms * 1e-3) / 1e12:.0f} TFLOP/s)"
    )

    # Tail: upconv1/2 + hr_conv + conv_last back to 512².
    tail = jax.jit(
        lambda y: rrdbnet_tail_forward(params, y, jnp.bfloat16)
    )
    print(f"tail (to 512²): {timeit(tail, y0):8.2f} ms")

    # Banded per-RDB Pallas trunk at the same shape.
    from master_thesis_tpu.ops.pallas_rrdb import (
        _band_rows,
        rrdb_trunk_pallas_banded,
    )

    print(f"band rows at W={y0.shape[2]}: {_band_rows(64, 32, y0.shape[2])}")
    banded = jax.jit(
        lambda y: rrdb_trunk_pallas_banded(y, trunk_params, NB)
    )
    t_ms = timeit(banded, y0.astype(jnp.bfloat16))
    print(
        f"trunk banded Pallas: {t_ms:8.2f} ms  "
        f"(~{flops / (t_ms * 1e-3) / 1e12:.0f} TFLOP/s useful)"
    )


if __name__ == "__main__":
    main()

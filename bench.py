"""Headline benchmark: inpainted 256x256 frames/sec/chip (CHN + CPN, 5 refs).

BASELINE.json's north-star config: copy-and-hallucinate inpainting of
256-square targets against 5 aligned reference frames. One jitted step =
CPN affine alignment of 5 refs + CHN forward + composite. Targets/sec is
what's counted (each target consumes 5 ref passes through the RRDB trunk),
target >= 30/s/chip on v5e.

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N/30}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from master_thesis_tpu.cache import enable_compilation_cache

    enable_compilation_cache()

    from master_thesis_tpu.models.chn import CHN, chn_infer_apply
    from master_thesis_tpu.models.cpn import CPN

    # B=16 is the measured serving sweet spot on one v5e chip (B=8: 149
    # f/s, B=16: 160 f/s, B=32: 150 f/s — beyond 16 the working set spills
    # past what fits comfortably and step time grows superlinearly).
    b, f, h, w = 16, 5, 256, 256
    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    z = jnp.zeros

    # Production compute dtype: bf16 conv compute, f32 params/master copies.
    cpn = CPN(dtype=jnp.bfloat16)
    chn = CHN(nb=20, dtype=jnp.bfloat16)
    cpn_params = cpn.init(
        key, z((1, h, w, 3)), z((1, h, w, 1)), z((1, 1, h, w, 3)), z((1, 1, h, w, 1))
    )
    chn_params = chn.init(
        key, z((1, h, w, 3)), z((1, h, w, 1)), z((1, 1, h, w, 3)),
        z((1, 1, h, w, 1)), z((1, 1, h, w, 1)),
    )

    def make_step(pallas_trunk: bool, pallas_tail: bool):
        @jax.jit
        def inpaint_step(cpn_p, chn_p, x_t, m_t, x_r, m_r):
            xa, va, vm = cpn.apply(cpn_p, x_t, m_t, x_r, m_r, method=CPN.align)
            # Serving path: fused Pallas kernels (ops/pallas_rrdb.py,
            # ops/pallas_tail.py).
            _, y_hat_comp = chn_infer_apply(
                chn_p, x_t, 1 - m_t, xa, va, vm, nb=20,
                pallas_trunk=pallas_trunk, pallas_tail=pallas_tail,
            )
            return y_hat_comp

        return inpaint_step

    x_t = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    m_t = jnp.asarray(rng.rand(b, h, w, 1) > 0.9, jnp.float32)
    x_r = jnp.asarray(rng.rand(b, f, h, w, 3), jnp.float32)
    m_r = jnp.asarray(rng.rand(b, f, h, w, 1) > 0.9, jnp.float32)

    # Warmup (compile) + steady-state timing. jax.block_until_ready does
    # NOT wait for completion through the axon relay (CLAUDE.md), so the
    # timing is bounded by a scalar device->host fetch. The device stream
    # executes launches in order, so ONE trailing fetch of the final
    # output synchronizes every iteration; a fetch per iteration would add
    # the ~33 ms relay round-trip to each step (measured; not model time).
    # Safety ladder: if a fused kernel fails to compile on this target the
    # benchmark must still produce a number — degrade tail-first (the
    # trunk kernel is proven on-chip), then to the pure-XLA path.
    for trunk_ok, tail_ok in ((True, True), (True, False), (False, False)):
        inpaint_step = make_step(trunk_ok, tail_ok)
        try:
            out = inpaint_step(cpn_params, chn_params, x_t, m_t, x_r, m_r)
            float(out.ravel()[0])  # sync after compile
            # A kernel that compiles but mis-executes must also degrade.
            patch = np.asarray(out[:1, :1, :16, :16], dtype=np.float32)
            assert np.isfinite(patch).all() and patch.std() > 0
            break
        except Exception:
            if not trunk_ok:
                raise
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = inpaint_step(cpn_params, chn_params, x_t, m_t, x_r, m_r)
    float(out.ravel()[0])  # trailing host sync bounds the in-order stream
    dt = (time.perf_counter() - t0) / iters

    frames_per_sec = b / dt  # targets inpainted per second on one chip
    print(
        json.dumps(
            {
                "metric": "inpainted 256px frames/sec/chip (CHN+CPN, 5 refs)",
                "value": round(frames_per_sec, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(frames_per_sec / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

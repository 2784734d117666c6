"""Benchmark suite for the five BASELINE.md / BASELINE.json configs.

``bench.py`` stays the single-line headline bench (config 3); this script
measures all five and prints one JSON line per config. Random weights —
these are throughput measurements, not quality ones.

    python benchmarks.py            # all configs
    python benchmarks.py 1 3       # subset
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timeit(fn, *args, iters=20):
    # 20 iterations bounded by ONE trailing fetch: at iters=5 the ~33 ms
    # relay round-trip still inflated each step by ~6.6 ms (r1/r2 numbers
    # carry that bias; r3 onward uses 20).
    out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def _force(out):
    import jax

    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def _emit(name, frames, secs, extra=None):
    rec = {
        "metric": name,
        "value": round(frames / secs, 2),
        "unit": "frames/s/chip",
        "step_ms": round(secs * 1e3, 1),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec))


def _models(nb=20):
    import jax
    import jax.numpy as jnp

    from master_thesis_tpu.models.chn import CHN
    from master_thesis_tpu.models.cpn import CPN

    key = jax.random.PRNGKey(0)
    z = jnp.zeros
    cpn = CPN(dtype=jnp.bfloat16)
    chn = CHN(nb=nb, dtype=jnp.bfloat16)
    cpn_p = cpn.init(key, z((1, 64, 64, 3)), z((1, 64, 64, 1)), z((1, 1, 64, 64, 3)), z((1, 1, 64, 64, 1)))
    chn_p = chn.init(
        key, z((1, 64, 64, 3)), z((1, 64, 64, 1)), z((1, 1, 64, 64, 3)),
        z((1, 1, 64, 64, 1)), z((1, 1, 64, 64, 1)),
    )
    return cpn, cpn_p, chn, chn_p


def _data(rng, b, f, h, w):
    import jax.numpy as jnp

    y = rng.rand(b, f, h, w, 3).astype(np.float32)
    m = (rng.rand(b, f, h, w, 1) > 0.9).astype(np.float32)
    x = (1 - m) * y + m * 0.45
    t = f // 2
    r = [i for i in range(f) if i != t]
    return (
        jnp.asarray(x[:, t]), jnp.asarray(m[:, t]),
        jnp.asarray(x[:, r]), jnp.asarray(m[:, r]),
    )


def config_1():
    """DFPN alignment: 2 frames @ 256², single clip forward."""
    import jax
    import jax.numpy as jnp

    from master_thesis_tpu.config import Config
    from master_thesis_tpu.train import build as build_mod

    cfg = Config(compute_dtype="bfloat16")
    _, _, vgg_apply = build_mod.build_vgg(cfg)
    model, params = build_mod.build_dfpn(cfg, vgg_apply)
    align_fn = jax.jit(build_mod.dfpn_align_fn(cfg, model, params, vgg_apply))

    rng = np.random.RandomState(0)
    b = 8
    x_t, m_t, x_r, m_r = _data(rng, b, 2, 256, 256)
    dt = _timeit(align_fn, x_t, m_t, x_r, m_r)
    _emit("config1: DFPN alignment (2 frames @256px)", b * 1, dt, {"batch": b})


def config_2():
    """CPN aligner inference: 5 refs @ 256²."""
    import jax

    from master_thesis_tpu.models.cpn import CPN

    cpn, cpn_p, _, _ = _models(nb=1)
    align = jax.jit(lambda p, a, b_, c, d: cpn.apply(p, a, b_, c, d, method=CPN.align))
    rng = np.random.RandomState(0)
    b = 8
    x_t, m_t, x_r, m_r = _data(rng, b, 6, 256, 256)
    dt = _timeit(align, cpn_p, x_t, m_t, x_r, m_r)
    _emit("config2: CPN align (5 refs @256px)", b * 5, dt, {"batch": b})


def config_3():
    """CHN + CPN copy-and-hallucinate, 5 refs @ 256² (the headline)."""
    import jax

    from master_thesis_tpu.models.cpn import CPN

    from master_thesis_tpu.models.chn import chn_infer_apply

    cpn, cpn_p, chn, chn_p = _models()

    @jax.jit
    def step(cp, hp, x_t, m_t, x_r, m_r):
        xa, va, vm = cpn.apply(cp, x_t, m_t, x_r, m_r, method=CPN.align)
        # Serving path (fused Pallas trunk) — same graph as bench.py.
        _, comp = chn_infer_apply(hp, x_t, 1 - m_t, xa, va, vm, nb=20)
        return comp

    rng = np.random.RandomState(0)
    b = 8
    x_t, m_t, x_r, m_r = _data(rng, b, 6, 256, 256)
    dt = _timeit(step, cpn_p, chn_p, x_t, m_t, x_r, m_r)
    _emit("config3: CHN+CPN inpaint (5 refs @256px)", b, dt, {"batch": b})


def config_4():
    """CHN + DFPN end-to-end (flow warp + hallucination)."""
    import jax

    from master_thesis_tpu.config import Config
    from master_thesis_tpu.train import build as build_mod

    cfg = Config(compute_dtype="bfloat16")
    _, _, vgg_apply = build_mod.build_vgg(cfg)
    model, params = build_mod.build_dfpn(cfg, vgg_apply)
    align_fn = build_mod.dfpn_align_fn(cfg, model, params, vgg_apply)
    _, _, chn, chn_p = _models()

    from master_thesis_tpu.models.chn import chn_infer_apply

    @jax.jit
    def step(hp, x_t, m_t, x_r, m_r):
        xa, va, vm = align_fn(x_t, m_t, x_r, m_r)
        _, comp = chn_infer_apply(hp, x_t, 1 - m_t, xa, va, vm, nb=20)
        return comp

    rng = np.random.RandomState(0)
    b = 4
    x_t, m_t, x_r, m_r = _data(rng, b, 6, 256, 256)
    dt = _timeit(step, chn_p, x_t, m_t, x_r, m_r)
    _emit("config4: CHN+DFPN inpaint (5 refs @256px)", b, dt, {"batch": b})


def _plausible_cpn_align(cpn_p, rng, f_max=32):
    """CPN-cost aligner with plausible geometry, for config 5's second
    variant (VERDICT r3 item 8): random CPN weights regress garbage
    affines (the visibility map never uncovers the hole and every
    candidate round runs — a worst case, not a throughput number), so
    this aligner pays the REAL CPN cost — A_Encoder on target+refs,
    A_Regressor, affine_grid + 4-channel matmul warp, exactly
    models/cpn.py:align — but swaps the regressed theta for a fixed
    near-identity jitter (±2% scale/shear, ±3% shift: a trained CPN's
    output on a hand-held camera). The regressed theta stays live in the
    graph (added at 1e-6 through tanh) so XLA cannot dead-code the
    regressor."""
    import jax
    import jax.numpy as jnp

    from master_thesis_tpu.models.cpn import AEncoder, ARegressor
    from master_thesis_tpu.ops.grid_sample import affine_grid, grid_sample

    ident = np.asarray([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
    jit_tab = jnp.asarray(
        ident + np.concatenate(
            [
                rng.uniform(-0.02, 0.02, (f_max, 2, 2)),
                rng.uniform(-0.03, 0.03, (f_max, 2, 1)),
            ],
            axis=2,
        ).astype(np.float32)
    )
    enc = AEncoder(dtype=jnp.bfloat16)
    reg = ARegressor(dtype=jnp.bfloat16)
    p_enc = {"params": cpn_p["params"]["A_Encoder"]}
    p_reg = {"params": cpn_p["params"]["A_Regressor"]}

    def align_fn(x_t, m_t, x_r, m_r):
        b, f, h, w, c = x_r.shape
        x_rf = x_r.reshape(b * f, h, w, c)
        m_rf = m_r.reshape(b * f, h, w, 1)
        feat_t = enc.apply(p_enc, x_t, m_t)
        feat_r = enc.apply(p_enc, x_rf, m_rf)
        fh, fw, fc = feat_t.shape[1:]
        feat_t_rep = jnp.broadcast_to(
            feat_t[:, None], (b, f, fh, fw, fc)
        ).reshape(b * f, fh, fw, fc)
        theta = reg.apply(p_reg, feat_t_rep, feat_r)  # (B*F, 2, 3)
        theta = (
            jnp.tile(jit_tab[:f], (b, 1, 1))
            + 1e-6 * jnp.tanh(theta.astype(jnp.float32))
        )
        grid = affine_grid(theta, (h, w), align_corners=False)
        warped = grid_sample(
            jnp.concatenate([x_rf, 1.0 - m_rf], axis=-1), grid,
            mode="bilinear", align_corners=False,
            precision=jax.lax.Precision.DEFAULT,
        )
        x_al = warped[..., :c].reshape(b, f, h, w, c)
        v_al = (warped[..., c:] > 0.5).astype(x_r.dtype).reshape(b, f, h, w, 1)
        v_map = jnp.clip(v_al - (1.0 - m_t[:, None]), 0.0, 1.0)
        return x_al, v_al, v_map

    return align_fn


def config_5():
    """Full-video sweep: all 3 algorithms, 12 frames @512px, two aligner
    variants.

    Random weights can't produce a meaningful *aligner* — a random affine
    regressor warps refs arbitrarily, the visibility map never uncovers the
    hole, and every candidate round runs (worst-case stress, not a
    throughput number). So this config uses (a) an identity aligner (static
    camera, round-comparable with r1-r3) and (b) a plausible-affine CPN
    aligner (full CPN encoder/regressor/warp cost with near-identity
    geometry, :func:`_plausible_cpn_align`) with a mask strip moving
    12 px/frame: the hole<e early exit then fires from visible-overlap
    geometry exactly as with trained weights (reference semantics: the
    ff/ip/cp loops shrink the mask only by the visibility map,
    model_chn.py:121-131, so exit behavior is alignment-geometry-driven,
    not weight-driven)."""
    import functools

    import jax.numpy as jnp

    from master_thesis_tpu.infer.algorithms import Inpainter
    from master_thesis_tpu.models.chn import chn_infer_apply
    from master_thesis_tpu.ops import measures

    _, cpn_p, chn, chn_p = _models()
    rng = np.random.RandomState(0)

    def identity_align(x_t, m_t, x_r, m_r):
        v_r = 1 - m_r
        v_map = jnp.clip(v_r - (1 - m_t[:, None]), 0, 1)
        return x_r, v_r, v_map

    F, h, w = 12, 512, 512
    y = np.broadcast_to(rng.rand(1, h, w, 3), (F, h, w, 3)).astype(np.float32)
    m = np.zeros((F, h, w, 1), np.float32)
    for t in range(F):
        m[t, 150 + 12 * t : 270 + 12 * t, 200:330] = 1
    x = (1 - m) * y + m * 0.45

    # Device-resident inputs + one trailing scalar fetch, the same
    # methodology as configs 1-4: through the remote relay (~38 MB/s) the
    # 67 MB of inputs + 38 MB output would otherwise add ~2.7 s of tunnel
    # time per call — an artifact of this machine's TPU attachment, not of
    # the serving path (a real TPU host moves these over PCIe in ~10 ms).
    import jax

    x_d, m_d = jnp.asarray(x), jnp.asarray(m)
    float(np.asarray(x_d.ravel()[0]))
    variants = [
        ("", identity_align),
        ("-cpn", _plausible_cpn_align(cpn_p, rng)),
    ]
    for suffix, align_fn in variants:
        # The serving path (fused Pallas trunk), as the CLI test mode runs it.
        inp = Inpainter(functools.partial(chn_infer_apply, nb=20), chn_p, align_fn)
        for algo in ("ff", "ip", "cp"):
            fn = getattr(inp, f"inpaint_{algo}")
            out = np.asarray(fn(x_d, m_d, as_numpy=False))  # warmup/compile
            t0 = time.perf_counter()
            dev = fn(x_d, m_d, as_numpy=False)
            float(np.asarray(jax.device_get(dev.ravel()[0])))
            dt = time.perf_counter() - t0
            assert np.isfinite(out).all()
            # Quality vs the clean sequence (BASELINE.md requires quality
            # per benchmark config; random CHN weights make these floors,
            # not claims — the copy path dominates where holes are visible
            # in refs).
            quality = {
                "psnr": round(float(measures.psnr(jnp.asarray(out), jnp.asarray(y))), 3),
                "ssim": round(float(measures.ssim(jnp.asarray(out), jnp.asarray(y))), 4),
            }
            _emit(
                f"config5{suffix}-{algo}: full-video ({F} frames @512px)",
                F, dt, quality,
            )


def main():
    from master_thesis_tpu.cache import enable_compilation_cache

    enable_compilation_cache()
    wanted = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5]
    for n in wanted:
        globals()[f"config_{n}"]()


if __name__ == "__main__":
    main()

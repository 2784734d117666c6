"""A/B the DFPN align path: r3 serving twin (dfpn_infer_apply, with each
kernel flag toggled) vs the plain flax module (the r2 path), config-4
geometry (B=4, F=5, 256², bf16). Finds which r3 rewrite regressed align
from r2's ~65 ms to 74 ms."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from master_thesis_tpu.cache import enable_compilation_cache

enable_compilation_cache()

from master_thesis_tpu.config import Config
from master_thesis_tpu.models.dfpn import dfpn_align, dfpn_infer_apply, prepare_vgg_input
from master_thesis_tpu.train import build as build_mod

B, F, H, W = 4, 5, 256, 256
ITERS = 20

cfg = Config(compute_dtype="bfloat16")
_, _, vgg_apply = build_mod.build_vgg(cfg)
model, params = build_mod.build_dfpn(cfg, vgg_apply)

rng = np.random.RandomState(0)
x_t = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
m_t = jnp.asarray((rng.rand(B, H, W, 1) > 0.9).astype(np.float32))
x_r = jnp.asarray(rng.rand(B, F, H, W, 3).astype(np.float32))
m_r = jnp.asarray((rng.rand(B, F, H, W, 1) > 0.9).astype(np.float32))


def pool4(x):
    return vgg_apply(x, normalize_input=False)[3]


def make_align(apply_fn, pool4_fn=pool4):
    def align_fn(x_t, m_t, x_r, m_r):
        b, f, h, w, _ = x_r.shape
        feats_t = pool4_fn(prepare_vgg_input(x_t, size=model.base_size))
        feats_r = pool4_fn(prepare_vgg_input(x_r.reshape(b * f, h, w, 3), size=model.base_size))
        feats_r = feats_r.reshape(b, f, *feats_r.shape[1:])
        return dfpn_align(
            apply_fn, params, x_t, m_t, x_r, m_r, feats_t, feats_r,
            warp_precision=jax.lax.Precision.DEFAULT,
        )
    return jax.jit(align_fn)


def timeit(fn):
    out = fn(x_t, m_t, x_r, m_r)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x_t, m_t, x_r, m_r)
    float(np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])))
    return (time.perf_counter() - t0) / ITERS * 1e3


from master_thesis_tpu.models.vgg import vgg_pool4_hybrid


def pool4_blk1_fused(x):
    return vgg_pool4_hybrid(vgg_apply.params["params"], x, dtype=jnp.bfloat16)


variants = {
    "module (r2 path)": (lambda p, *a: model.apply(p, *a), pool4),
}
for name, kw, p4 in (
    ("twin defaults (mixer=P)", {}, pool4),
    ("twin all-XLA", {"pallas_mixer": False, "hybrid_flow": False}, pool4),
    ("twin sep4d=P", {"pallas_sep4d": True}, pool4),
    ("twin flow=P", {"pallas_flow": True}, pool4),
    ("twin hybrid mids+c0P", {"hybrid_flow": True}, pool4),
    ("twin c0-only Pallas", {"hybrid_flow": True, "hybrid_fuse_mids": False}, pool4),
    ("twin c0-only s2d",
     {"hybrid_flow": True, "hybrid_fuse_mids": False, "hybrid_c0_mode": "s2d"},
     pool4),
    ("twin c0-s2d + vggblk1",
     {"hybrid_flow": True, "hybrid_fuse_mids": False, "hybrid_c0_mode": "s2d"},
     pool4_blk1_fused),
):
    def mk(kw):
        def f(p, *a):
            return dfpn_infer_apply(
                p, *a, dtype=jnp.bfloat16, base_size=model.base_size,
                use_softmax=model.use_softmax, **kw,
            )
        return f
    variants[name] = (mk(kw), p4)

for name, (apply_fn, p4) in variants.items():
    try:
        dt = timeit(make_align(apply_fn, p4))
        print(f"{name:28s}: {dt:7.2f} ms", flush=True)
    except Exception as e:
        print(f"{name:28s}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

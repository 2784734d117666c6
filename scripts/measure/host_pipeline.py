"""Host input-pipeline stage profile (single core, CPU only).

Publishes the per-item breakdown VERDICT r3 asked for: decode / simulator /
resize / dilate / composite, measured on a realistic fake dataset
(480x854 JPEG backgrounds — DAVIS-480p-class sources — and YT-VOS-style
PNG masks), at the production item shape (5 frames @256², image_resize,
p_simulator_bgs=0.5).

Run WITHOUT the axon site (host-side only):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/measure/host_pipeline.py
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from master_thesis_tpu.config import Config
from master_thesis_tpu.data.pipeline import (
    ContentProvider,
    InpaintingDataset,
    dilate_np,
)
from master_thesis_tpu.ops import interp
from master_thesis_tpu.ops.movements import MovementSimulator


def build_tree(root, h=480, w=854, frames=40):
    import cv2

    rng = np.random.RandomState(0)
    seqs = {}
    bg_dir = os.path.join(root, "bgs")
    for seq in ("s0", "s1"):
        os.makedirs(os.path.join(bg_dir, seq), exist_ok=True)
        base = rng.randint(0, 255, (h, w, 3), np.uint8)
        paths = []
        for i in range(frames):
            p = os.path.join("bgs", seq, f"{i:08d}.jpg")
            cv2.imwrite(os.path.join(root, p), np.roll(base, i * 7, 1))
            paths.append(p)
        seqs[seq] = (paths, None)
    mask_meta = {}
    mk_dir = os.path.join(root, "masks", "m0")
    os.makedirs(mk_dir, exist_ok=True)
    mpaths = []
    for i in range(frames):
        m = np.zeros((h * 3 // 4, w * 3 // 4), np.uint8)
        cv2.circle(m, (w // 3 + 2 * i, h // 3), h // 6, 255, -1)
        p = os.path.join("masks", "m0", f"{i:05d}.png")
        cv2.imwrite(os.path.join(root, p), m)
        mpaths.append(p)
    mask_meta["m0"] = (None, mpaths)
    return seqs, mask_meta


def timeit(fn, *args, iters=20, **kw):
    fn(*args, **kw)  # warm (imports, allocator)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    return (time.perf_counter() - t0) / iters, out


def main():
    cfg = Config()
    F = 5
    cfg.frames_n = F
    root = tempfile.mkdtemp(prefix="hostpipe_")
    bg_meta, mask_meta = build_tree(root)
    sim = MovementSimulator(*cfg.bgs_movement_params)
    bgs = ContentProvider(
        bg_meta, root, movement_min_height=2 * cfg.train_size[0],
        movement_simulator=sim, frames_spacing=cfg.frames_spacing,
    )
    masks = ContentProvider(
        mask_meta, root, movement_simulator=MovementSimulator(*cfg.masks_movement_params),
    )
    ds = InpaintingDataset(bgs, masks, "train", cfg)
    rng = np.random.RandomState(0)

    # --- stages ---------------------------------------------------------
    t_dec, bg = timeit(bgs._decode_bg, bg_meta["s0"][0][0])
    print(f"decode_bg   (480x854 jpg)           : {t_dec*1e3:7.2f} ms"
          f"  {'(native C++)' if os.path.exists(os.path.join(os.path.dirname(__file__), '../../master_thesis_tpu/runtime')) else ''}")
    t_decs, bgs_scaled = timeit(
        bgs._decode_bg, bg_meta["s0"][0][0], min_hw=tuple(cfg.train_size)
    )
    print(f"decode_bg   scaled {bgs_scaled.shape[0]}x{bgs_scaled.shape[1]} (5/8 DCT) : {t_decs*1e3:7.2f} ms")
    t_decm, mk = timeit(masks._decode_mask, mask_meta["m0"][1][0])
    print(f"decode_mask (360x640 png)           : {t_decm*1e3:7.2f} ms")

    t_sim, _ = timeit(
        lambda: bgs._get_patch_simulated(0, F, np.random.RandomState(1),
                                         tuple(cfg.train_size)), iters=10
    )
    print(f"simulated bg patch (decode+warp x{F}) : {t_sim*1e3:7.2f} ms")
    t_cont, _ = timeit(
        lambda: bgs._get_patch_contiguous(
            20, F, np.random.RandomState(1), decode_size=tuple(cfg.train_size)
        ),
        iters=10,
    )
    print(f"contiguous bg patch ({F} scaled dec)  : {t_cont*1e3:7.2f} ms")
    t_mask_patch, _ = timeit(
        lambda: masks.get_patch_random(F, True, np.random.RandomState(1),
                                       tuple(cfg.train_size)), iters=10
    )
    print(f"simulated mask patch                : {t_mask_patch*1e3:7.2f} ms")

    y5 = np.stack([bg] * F)
    t_resize, y256 = timeit(
        interp.resize_hw_np, y5, tuple(cfg.train_size), mode="bilinear"
    )
    print(f"resize {F}x480x854 -> 256²            : {t_resize*1e3:7.2f} ms")

    m5 = (np.random.RandomState(0).rand(F, 256, 256, 1) > 0.9).astype(np.float32)
    t_dil, _ = timeit(
        dilate_np, m5, cfg.dilatation_filter_size, cfg.dilatation_iterations
    )
    print(f"dilate {F}x256² x4                    : {t_dil*1e3:7.2f} ms")

    t_comp, _ = timeit(lambda: (1 - m5) * y256 + m5 * 0.45)
    print(f"composite {F}x256²                    : {t_comp*1e3:7.2f} ms")

    # --- end to end ------------------------------------------------------
    n = 40
    t0 = time.perf_counter()
    for i in range(n):
        ds.get_item(i, np.random.RandomState(i))
    dt = (time.perf_counter() - t0) / n
    print(f"\nend-to-end get_item (50% simulated) : {dt*1e3:7.2f} ms"
          f"  = {1/dt:5.1f} items/s single-core")


if __name__ == "__main__":
    main()

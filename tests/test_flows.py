"""Flow utilities: round-trips and warp parity with torch."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from master_thesis_tpu.ops import flows


def test_abs_rel_roundtrip(rng):
    f = rng.randn(2, 3, 8, 9, 2).astype(np.float32)
    rel = flows.flow_abs_to_relative(jnp.asarray(f))
    back = flows.flow_relative_to_abs(rel)
    np.testing.assert_allclose(np.asarray(back), f, atol=1e-6)


def test_identity_grid_matches_torch():
    got = np.asarray(flows.identity_grid(7, 5))
    want = F.affine_grid(
        torch.tensor([[[1.0, 0, 0], [0, 1.0, 0]]]), [1, 1, 7, 5], align_corners=True
    ).numpy()[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_align_set_identity_flow_is_noop(rng):
    b, f, h, w = 2, 3, 16, 16
    x = rng.rand(b, f, h, w, 3).astype(np.float32)
    v = (rng.rand(b, f, h, w, 1) > 0.5).astype(np.float32)
    flow = jnp.broadcast_to(flows.identity_grid(h, w), (b, f, h, w, 2))
    xa, va = flows.align_set(jnp.asarray(x), jnp.asarray(v), flow)
    np.testing.assert_allclose(np.asarray(xa), x, atol=1e-5)
    np.testing.assert_allclose(np.asarray(va), v, atol=1e-6)


def test_crop_flow_shape_and_identity(rng):
    # Cropping the identity flow gives the identity flow of the crop.
    h, w = 32, 48
    flow = jnp.broadcast_to(flows.identity_grid(h, w), (1, 2, h, w, 2))
    out = flows.crop_flow(flow, (16, 16), (4, 8))
    assert out.shape == (1, 2, 16, 16, 2)
    want = np.broadcast_to(np.asarray(flows.identity_grid(16, 16)), (1, 2, 16, 16, 2))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_resize_flow_matches_torch(rng):
    f = rng.randn(2, 3, 16, 16, 2).astype(np.float32)
    got = np.asarray(flows.resize_flow(jnp.asarray(f), (64, 64), mode="bilinear"))
    t = torch.from_numpy(f).reshape(6, 16, 16, 2).permute(0, 3, 1, 2)
    want = (
        F.interpolate(t, (64, 64), mode="bilinear", align_corners=False)
        .permute(0, 2, 3, 1)
        .reshape(2, 3, 64, 64, 2)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_flow_np_matches_jnp(rng):
    from master_thesis_tpu.ops.movements import crop_flow_np

    f = rng.randn(2, 20, 24, 2).astype(np.float32) * 0.5
    got = crop_flow_np(f, (8, 10), (3, 5))
    want = np.asarray(flows.crop_flow(jnp.asarray(f[None]), (8, 10), (3, 5)))[0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_crop_branch_of_dataset(rng, tmp_path):
    """image_resize=False exercises the numpy crop path end to end."""
    from master_thesis_tpu.config import Config
    from master_thesis_tpu.data.pipeline import ContentProvider, InpaintingDataset
    from tests.fixtures import make_fake_data_root

    root = make_fake_data_root(str(tmp_path), size=(64, 80), frames=12)
    from master_thesis_tpu.data import meta as meta_mod

    cfg = Config(
        data_path=root, image_resize=False, train_size=(48, 48), frames_n=3,
        min_mask_size=0.0, max_mask_size=1.0, p_simulator_bgs=0.0,
    )
    bgs_meta = meta_mod.get_meta_got10k(root, "train")
    masks_meta = meta_mod.get_meta_youtube_vos(root, "train")
    bgs = ContentProvider(bgs_meta, root)
    masks = ContentProvider(masks_meta, root)
    ds = InpaintingDataset(bgs, masks, "train", cfg)
    (x, m), y, info = ds.get_item(0, np.random.RandomState(0))
    assert x.shape == (3, 48, 48, 3)
    assert info["gt_movement"].shape == (3, 48, 48, 2)

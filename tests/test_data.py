"""Data layer: scanners, filtering, pipeline semantics."""

import os

import numpy as np
import pytest

from master_thesis_tpu.config import Config
from master_thesis_tpu.data import meta as meta_mod
from master_thesis_tpu.data.pipeline import ContentProvider, InpaintingDataset, Loader
from master_thesis_tpu.ops.movements import MovementSimulator
from tests.fixtures import make_fake_data_root


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_fake_data_root(str(tmp_path_factory.mktemp("data")))


@pytest.fixture(scope="module")
def cfg(data_root, tmp_path_factory):
    return Config(
        data_path=data_root,
        data_ckpt_path=str(tmp_path_factory.mktemp("ckpt") / "data.ckpt"),
        train_size=(48, 48),
        frames_n=5,
        batch_size=2,
        train_max_iterations=2,
        validation_max_iterations=1,
        min_mask_size=0.0,
        max_mask_size=1.0,
        num_workers=0,
    )


def test_scanners(data_root):
    got = meta_mod.get_meta_got10k(data_root, "train")
    assert set(got) == {"seq_a", "seq_b"}
    assert len(got["seq_a"][0]) == 20 and got["seq_a"][1] is None

    ytv_train = meta_mod.get_meta_youtube_vos(data_root, "train")
    ytv_val = meta_mod.get_meta_youtube_vos(data_root, "validation")
    assert len(ytv_train) + len(ytv_val) == 2
    # Deterministic split: scanning twice gives the same partition.
    assert set(meta_mod.get_meta_youtube_vos(data_root, "train")) == set(ytv_train)

    davis = meta_mod.get_meta_davis(data_root)
    assert len(davis["clip1"][0]) == 8 and len(davis["clip1"][1]) == 8


def test_mask_size_filter(data_root):
    import random

    masks = meta_mod.get_meta_youtube_vos(data_root, "train")
    before = len(masks)
    # Impossible band -> everything filtered out.
    meta_mod.clean_masks_meta(masks, data_root, 0.99, 1.0, rng=random.Random(0))
    assert len(masks) == 0 and before > 0


def test_prepare_data_roundtrip(cfg):
    metas = meta_mod.prepare_data(cfg)
    assert os.path.exists(cfg.data_ckpt_path)
    metas2 = meta_mod.prepare_data(cfg)  # cache hit
    assert [sorted(m) for m in metas2] == [sorted(m) for m in metas]


def test_dataset_item_shapes(cfg):
    metas = meta_mod.prepare_data(cfg)
    bgs = ContentProvider(
        metas[0], cfg.data_path, movement_min_height=96,
        movement_simulator=MovementSimulator(5, 0.05, 0.1),
    )
    masks = ContentProvider(metas[1], cfg.data_path, movement_simulator=None)
    ds = InpaintingDataset(bgs, masks, "train", cfg)
    rng = np.random.RandomState(0)
    (x, m), y, info = ds.get_item(0, rng)
    assert x.shape == (5, 48, 48, 3) and m.shape == (5, 48, 48, 1)
    assert y.shape == (5, 48, 48, 3)
    assert info["gt_movement"].shape == (5, 48, 48, 2)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # Composite: where mask=1, x is the gray fill color.
    hole = m[..., 0] == 1
    if hole.any():
        np.testing.assert_allclose(
            x[hole], np.broadcast_to([0.485, 0.456, 0.406], x[hole].shape), atol=1e-6
        )
    # Where mask=0, x equals y.
    np.testing.assert_allclose(x[~hole], y[~hole], atol=1e-6)


def test_loader_batches_and_reproducibility(cfg):
    metas = meta_mod.prepare_data(cfg)
    bgs = ContentProvider(metas[0], cfg.data_path)
    masks = ContentProvider(metas[1], cfg.data_path)
    ds = InpaintingDataset(bgs, masks, "train", cfg)
    loader_a = Loader(ds, cfg.batch_size, seed=7, num_workers=2)
    loader_b = Loader(ds, cfg.batch_size, seed=7, num_workers=1)
    assert len(loader_a) == 2
    ba = next(iter(loader_a))
    bb = next(iter(loader_b))
    assert ba["x"].shape == (2, 5, 48, 48, 3)
    np.testing.assert_array_equal(ba["x"], bb["x"])  # same seed => same batch
    assert ba["flows_use"].dtype == np.bool_


def test_loader_process_workers_match_threads(cfg):
    """Fork-based worker processes (the reference DataLoader architecture)
    produce byte-identical batches to threads: batches are deterministic in
    (seed, epoch, item), independent of who computes them. Also exercises
    abandoning the iterator (no executor leak)."""
    metas = meta_mod.prepare_data(cfg)
    bgs = ContentProvider(metas[0], cfg.data_path)
    masks = ContentProvider(metas[1], cfg.data_path)
    ds = InpaintingDataset(bgs, masks, "train", cfg)
    thr = Loader(ds, cfg.batch_size, seed=7, num_workers=2)
    prc = Loader(ds, cfg.batch_size, seed=7, num_workers=2, use_processes=True)
    bt = next(iter(thr))
    it = iter(prc)
    bp = next(it)
    del it  # abandon mid-epoch: finally-shutdown must not raise
    for k in ("x", "m", "y", "flow_gt", "m_movement"):
        np.testing.assert_array_equal(bt[k], bp[k])


def test_full_sequence_mode(cfg):
    metas = meta_mod.prepare_data(cfg)
    test_cfg = cfg.replace(frames_n=-1, batch_size=1, test_size=(48, 64))
    bgs = ContentProvider(metas[4], cfg.data_path)
    ds = InpaintingDataset(bgs, None, "test", test_cfg)
    assert len(ds) == 1  # one DAVIS clip
    (x, m), y, info = ds.get_item(0, np.random.RandomState(0))
    assert x.shape == (8, 48, 64, 3) and m.shape == (8, 48, 64, 1)
    assert info["name"] == "clip1"


def test_simulated_patch_uses_same_transform_for_masks(cfg):
    metas = meta_mod.prepare_data(cfg)
    sim = MovementSimulator(5, 0.05, 0.1)
    bgs = ContentProvider(
        metas[0], cfg.data_path, movement_min_height=96, movement_simulator=sim
    )
    y, m, name, idx, gt_movement, m_movement = bgs._get_patch_simulated(
        0, 5, np.random.RandomState(3)
    )
    assert y.shape[0] == 5 and gt_movement.shape[0] == 5
    assert idx is None
    # Center frame is untransformed (identity at t = n//2).
    assert np.abs(gt_movement[2] - gt_movement[2].clip(-1, 1)).max() < 1e-6

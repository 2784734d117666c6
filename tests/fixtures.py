"""Shared test fixtures: a tiny on-disk fake dataset tree."""

import os

import numpy as np


def make_fake_data_root(root: str, size=(96, 128), frames=20, seed=0) -> str:
    """Builds minimal GOT-10k / YouTube-VOS / DAVIS-2017 trees with real
    image files, matching the directory layouts the scanners expect."""
    import cv2

    rng = np.random.RandomState(seed)
    h, w = size

    got_train = os.path.join(root, "GOT10k", "train")
    for seq in ("seq_a", "seq_b"):
        os.makedirs(os.path.join(got_train, seq), exist_ok=True)
        base = rng.randint(0, 255, (h, w, 3), np.uint8)
        for i in range(frames):
            cv2.imwrite(
                os.path.join(got_train, seq, f"{i:08d}.jpg"), np.roll(base, i * 3, 1)
            )
    with open(os.path.join(got_train, "list.txt"), "w") as f:
        f.write("seq_a\nseq_b\n")

    got_val = os.path.join(root, "GOT10k", "val")
    os.makedirs(os.path.join(got_val, "seq_c"), exist_ok=True)
    base = rng.randint(0, 255, (h, w, 3), np.uint8)
    for i in range(frames):
        cv2.imwrite(os.path.join(got_val, "seq_c", f"{i:08d}.jpg"), np.roll(base, i * 2, 0))
    with open(os.path.join(got_val, "list.txt"), "w") as f:
        f.write("seq_c\n")

    ytv = os.path.join(root, "YouTubeVOS", "train", "Annotations")
    for seq in ("vid1", "vid2"):
        os.makedirs(os.path.join(ytv, seq), exist_ok=True)
        for i in range(max(12, frames // 2)):
            m = np.zeros((h * 3 // 4, w * 3 // 4), np.uint8)
            cv2.circle(m, (w // 3 + i, h // 3), max(h // 6, 8), 255, -1)
            cv2.imwrite(os.path.join(ytv, seq, f"{i:05d}.png"), m)

    davis = os.path.join(root, "DAVIS-2017")
    os.makedirs(os.path.join(davis, "ImageSets"), exist_ok=True)
    with open(os.path.join(davis, "ImageSets", "custom.txt"), "w") as f:
        f.write("clip1\n")
    os.makedirs(os.path.join(davis, "JPEGImages", "480p", "clip1"), exist_ok=True)
    os.makedirs(os.path.join(davis, "Annotations_Dense", "480p", "clip1"), exist_ok=True)
    base = rng.randint(0, 255, (h, w, 3), np.uint8)
    for i in range(8):
        cv2.imwrite(
            os.path.join(davis, "JPEGImages", "480p", "clip1", f"{i:05d}.jpg"),
            np.roll(base, i * 5, 1),
        )
        m = np.zeros((h, w), np.uint8)
        cv2.circle(m, (w // 2 + 3 * i, h // 2), max(h // 5, 10), 255, -1)
        cv2.imwrite(
            os.path.join(davis, "Annotations_Dense", "480p", "clip1", f"{i:05d}.png"), m
        )
    return root

"""Synthetic mini-Charades: a generated frame-JPEG tree + annotation json for
end-to-end pipeline tests (SURVEY.md §4's recommended harness)."""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image


def generate_mini_charades(
    root: str,
    num_videos: int = 4,
    num_frames: int = 48,
    hw: int = 64,
    num_classes: int = 157,
    train_fraction: float = 0.5,
    seed: int = 0,
) -> str:
    """Create ``root/frames/<vid>/...jpg`` and ``root/annotations.json``.

    Returns the annotation file path.  Videos alternate between the
    ``training`` and ``testing`` subsets.
    """
    rng = np.random.RandomState(seed)
    frames_dir = os.path.join(root, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    anno = {}
    n_train = max(1, int(num_videos * train_fraction))
    for v in range(num_videos):
        vid = f"SYN{v:03d}"
        vdir = os.path.join(frames_dir, vid)
        os.makedirs(vdir, exist_ok=True)
        base = rng.randint(0, 200, size=(hw, hw, 3)).astype(np.uint8)
        for fr in range(1, num_frames + 1):
            img = np.clip(
                base.astype(np.int32) + (fr * 3) % 55, 0, 255
            ).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(vdir, f"{vid}-{fr:06d}.jpg"), quality=70
            )
        duration = num_frames / 24.0
        actions = []
        for _ in range(rng.randint(1, 4)):
            cls = int(rng.randint(0, num_classes))
            s = float(rng.uniform(0, duration * 0.7))
            e = float(min(duration, s + rng.uniform(0.2, duration * 0.5)))
            actions.append([cls, s, e])
        anno[vid] = {
            "subset": "training" if v < n_train else "testing",
            "duration": duration,
            "actions": actions,
        }
    path = os.path.join(root, "annotations.json")
    with open(path, "w") as f:
        json.dump(anno, f)
    return path

"""Kinetics-style pretraining dataset (clip-level single-label).

The reference assumes an already-pretrained Kinetics-400 checkpoint
(``x3d_multigrid_kinetics_fb_pretrained.pt``, ``train_fine.py:104``) and
ships no pretraining code.  This adapter + :mod:`..train.kinetics_driver`
close that gap: a frame-dir corpus (same ``root/<vid>/<vid>-%06d.jpg``
layout as Charades) with a JSON annotation ``{vid: {"label": int,
"subset": "training"|"validation", "num_frames": int}}`` trains the Fine
stream in ``task='class'`` mode; the resulting checkpoint feeds
``DriverConfig.kinetics_ckpt`` (head-swap transfer, ``train_fine.py:111``).
"""

from __future__ import annotations

import json
import os
import random
from typing import List, Optional

import numpy as np

from . import native
from .dataset import load_clip_frames
from .transforms import RandomHorizontalFlip


class KineticsDataset:
    """Clip sampler for single-label video classification.

    Training draws a random ``frames``-frame window at stride ``gamma_tau``;
    validation uses the centre window.  Returns ``(clips (1,T,H,W,3) uint8,
    label int, vid)`` samples; :func:`collate_kinetics` stacks them.
    """

    def __init__(
        self,
        anno: str,
        split: str,
        root: str,
        spatial_transform=None,
        frames: int = 16,
        gamma_tau: int = 5,
        min_frames: Optional[int] = None,
        crop_size: int = 224,
        decode_backend: str = "auto",
        seed: int = 0,
    ):
        with open(anno) as f:
            raw = json.load(f)
        self.data: List[tuple] = []
        for vid, info in sorted(raw.items()):
            if info.get("subset", "training") != split:
                continue
            nf = info.get("num_frames", 0)
            if min_frames and nf < min_frames:
                continue
            self.data.append((vid, int(info["label"]), nf))
        self.root = root
        self.split = split
        self.frames = frames
        self.gamma_tau = gamma_tau
        self.spatial_transform = spatial_transform
        self.crop_size = crop_size
        self.rng = random.Random(seed)
        from .transforms import (
            CenterCropScaled,
            Compose,
            MultiScaleRandomCropMultigrid,
        )

        use_native = decode_backend in ("auto", "native") and native.available()
        ts = (spatial_transform.transforms
              if isinstance(spatial_transform, Compose) else [])
        self.native_crop = (
            ts[0].size[0]
            if len(ts) == 1 and isinstance(ts[0], CenterCropScaled)
            and use_native else None)
        self.native_train = (
            ts[0]
            if len(ts) == 2 and isinstance(ts[0], MultiScaleRandomCropMultigrid)
            and isinstance(ts[1], RandomHorizontalFlip) and ts[1].deferred
            and use_native else None)

    def __len__(self) -> int:
        return len(self.data)

    def num_frames(self, index: int) -> int:
        return self.data[index][2]

    def __getitem__(self, index: int):
        vid, label, nf = self.data[index]
        window = self.frames * self.gamma_tau
        if self.split == "training":
            start = self.rng.randint(1, max(1, nf - window))
        else:
            start = max(1, (nf - window) // 2)

        flip = False
        if self.native_crop is not None or self.native_train is not None:
            paths = []
            for i in range(start, start + window, self.gamma_tau):
                p = os.path.join(self.root, vid, f"{vid}-{i:06d}.jpg")
                if not os.path.exists(p):
                    break
                paths.append(p)
            if self.native_train is not None:
                self.spatial_transform.randomize_parameters(self.crop_size)
                mt = self.native_train
                for t in self.spatial_transform.transforms:
                    if isinstance(t, RandomHorizontalFlip) and t.deferred:
                        flip = t.flipped
                arr = native.decode_batch_random_crop(
                    paths, mt.size, mt.scale, mt.tl_x, mt.tl_y)
            else:
                arr = native.decode_batch(paths, self.native_crop)
        else:
            imgs = load_clip_frames(self.root, vid, start, window,
                                    self.gamma_tau)
            if self.spatial_transform is not None:
                self.spatial_transform.randomize_parameters(self.crop_size)
                for t in getattr(self.spatial_transform, "transforms",
                                 [self.spatial_transform]):
                    if isinstance(t, RandomHorizontalFlip) and t.deferred:
                        flip = t.flipped
                imgs = [self.spatial_transform(img) for img in imgs]
            arr = np.stack([np.asarray(im, np.uint8) for im in imgs], axis=0)

        return {"clips": arr[None], "label": label, "vid": vid, "flip": flip}


def collate_kinetics(batch, pad_t_multiple: Optional[int] = None):
    """Stack clips (loop-padding short ones to the batch max) + int labels."""
    max_t = max(b["clips"].shape[1] for b in batch)
    if pad_t_multiple:
        max_t = ((max_t + pad_t_multiple - 1) // pad_t_multiple
                 ) * pad_t_multiple
    n, h, w = batch[0]["clips"].shape[0], *batch[0]["clips"].shape[2:4]
    clips = np.zeros((len(batch), n, max_t, h, w, 3), np.uint8)
    clip_mask = np.zeros((len(batch), max_t), np.float32)
    for i, b in enumerate(batch):
        t = b["clips"].shape[1]
        clips[i, :, :t] = b["clips"]
        clip_mask[i, :t] = 1.0
    return {
        "clips": clips,
        "clip_mask": clip_mask,
        "labels": np.asarray([b["label"] for b in batch], np.int32),
        "flip": np.asarray([b["flip"] for b in batch]),
        "vids": [b["vid"] for b in batch],
    }


def generate_mini_kinetics(root: str, num_videos: int = 8,
                           num_frames: int = 40, hw: int = 64,
                           num_classes: int = 10, seed: int = 0) -> str:
    """Synthetic Kinetics-style corpus for tests/demos."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    frames_dir = os.path.join(root, "frames")
    os.makedirs(frames_dir, exist_ok=True)
    anno = {}
    for v in range(num_videos):
        vid = f"KIN{v:03d}"
        vdir = os.path.join(frames_dir, vid)
        os.makedirs(vdir, exist_ok=True)
        base = rng.randint(0, 200, size=(hw, hw, 3)).astype(np.uint8)
        for fr in range(1, num_frames + 1):
            img = np.clip(base + rng.randint(-20, 20, size=base.shape), 0,
                          255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(vdir, f"{vid}-{fr:06d}.jpg"), quality=85)
        anno[vid] = {
            "label": int(v % num_classes),
            "subset": "training" if v % 4 else "validation",
            "num_frames": num_frames,
        }
    path = os.path.join(root, "kinetics.json")
    with open(path, "w") as f:
        json.dump(anno, f)
    return path

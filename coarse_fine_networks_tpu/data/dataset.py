"""Charades clip datasets and padded-batch collation.

Re-design of ``charades_fine.py:126-224`` and
``charades_coarse_fineFEAT.py:131-252`` with a single shared implementation
(the reference duplicates the loader halves).  Clips come out **channels-last
uint8** ``(N_crops, T, H, W, 3)`` with a per-clip flip flag; normalisation
happens on device (:func:`..data.transforms.device_normalize`).  Labels are
time-major ``(T_l, C)``.

Static-shape discipline for XLA: :func:`collate_clips` can pad the temporal
axes up to fixed bucket multiples so jit sees a small number of shapes
(SURVEY.md §7 hard part #3); masks carry the true lengths.
"""

from __future__ import annotations

import os
import random
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from . import bufpool, native
from .annotations import make_dataset
from .transforms import RandomHorizontalFlip

FEAT_CAP = 128  # fine-feature temporal cap (charades_coarse_fineFEAT.py:210)


def load_frame(root: str, vid: str, index: int) -> Optional[Image.Image]:
    """Frame-JPEG layout ``root/<vid>/<vid>-%06d.jpg``
    (``charades_fine.py:47-57``)."""
    path = os.path.join(root, vid, f"{vid}-{index:06d}.jpg")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        with Image.open(f) as img:
            return img.convert("RGB")


def load_clip_frames(root: str, vid: str, start: int, num: int,
                     stride: int) -> List[Image.Image]:
    """Load frames ``start, start+stride, ...`` until ``start+num`` or the
    first missing frame (reference stops at the first gap,
    ``charades_fine.py:54-55``)."""
    frames = []
    for i in range(start, start + num, stride):
        img = load_frame(root, vid, i)
        if img is None:
            break
        frames.append(img)
    return frames


class CharadesDataset:
    """Clip sampler over the Charades per-frame-JPEG layout.

    Mirrors the reference sampling exactly (``charades_fine.py:141-195``):

    * training: random window of ``frames*2`` frames at stride
      ``gamma_tau*2``;
    * testing: the whole video from frame 1; for ``task='loc'`` with
      ``crops>1`` the stride is divided by ``crops`` and N interleaved crop
      clips are built;
    * ``meta = [start_f, frames, nf, stride] // gamma_tau`` feeds the
      Gaussian alignment (``charades_fine.py:192-193``).

    When ``fine_feat_dir`` is given, cached fine features are loaded per video
    (``charades_coarse_fineFEAT.py:77-89``); ``.npy`` (ours) and torch ``.pt``
    (reference cache) formats are both understood.
    """

    def __init__(
        self,
        split_file: str,
        split: str,
        root: str,
        spatial_transform=None,
        task: str = "loc",
        frames: int = 80,
        gamma_tau: int = 5,
        crops: int = 1,
        extract_feat: bool = False,
        fine_feat_dir: Optional[str] = None,
        feature_keys: Sequence[str] = ("layer1", "layer2", "layer3",
                                       "layer4", "conv5"),
        min_frames: Optional[int] = None,
        num_classes: int = 157,
        crop_size: int = 224,
        decode_backend: str = "auto",
        pack_dir: Optional[str] = None,
        seed: int = 0,
    ):
        kwargs = {} if min_frames is None else {"min_frames": min_frames}
        self.data = make_dataset(split_file, split, root,
                                 num_classes=num_classes, **kwargs)
        self.root = root
        self.frames = frames * 2            # charades_fine.py:133
        self.gamma_tau = gamma_tau * 2      # charades_fine.py:134
        self.spatial_transform = spatial_transform
        self.crops = crops
        self.split = "testing" if extract_feat else split
        self.task = task
        self.fine_feat_dir = fine_feat_dir
        self.feature_keys = tuple(feature_keys)
        self.crop_size = crop_size  # passed to randomize_parameters (the
        # multigrid dynamic crop size; charades_fine.py:171 hardcodes 224)
        # native C++ fast paths: decode+CenterCropScaled when the pipeline is
        # exactly a centre-crop-scale (val/extract), and decode+random-crop
        # for the train pipeline (MultiScaleRandomCropMultigrid + deferred
        # HFlip — the crop runs in C++, the flip on device).  'auto' enables
        # them when the library is built.
        from .transforms import (
            CenterCropScaled,
            Compose,
            MultiScaleRandomCropMultigrid,
            RandomHorizontalFlip,
        )

        use_native = decode_backend in ("auto", "native") and native.available()
        ts = (spatial_transform.transforms
              if isinstance(spatial_transform, Compose) else [])
        is_ccs = len(ts) == 1 and isinstance(ts[0], CenterCropScaled)
        self.native_crop = ts[0].size[0] if is_ccs and use_native else None
        is_train_t = (
            len(ts) == 2
            and isinstance(ts[0], MultiScaleRandomCropMultigrid)
            and isinstance(ts[1], RandomHorizontalFlip)
            and ts[1].deferred
        )
        self.native_train = ts[0] if is_train_t and use_native else None
        if decode_backend == "native" and self.native_crop is None \
                and self.native_train is None:
            raise ValueError(
                "native decode requires a CenterCropScaled-only or "
                "MultiScaleRandomCropMultigrid+deferred-flip transform and a "
                "built native library")
        # .cfnpack packed containers (native/cfn_data.cpp): one indexed file
        # per video instead of thousands of frame JPEGs — one open+seek per
        # clip rather than T file opens, the dominant host cost on networked
        # filesystems.  Falls back per-video to the JPEG layout when the
        # pack is absent.
        self.pack_dir = pack_dir if pack_dir and use_native else None
        self._pack_nf: Dict[str, int] = {}
        self.rng = random.Random(seed)

    def _pack_for(self, vid: str):
        """(pack_path, num_frames) or (None, 0) when not packed."""
        if self.pack_dir is None:
            return None, 0
        path = os.path.join(self.pack_dir, vid + ".cfnpack")
        nf = self._pack_nf.get(vid)
        if nf is None:
            nf = native.pack_num_frames(path) if os.path.exists(path) else -1
            self._pack_nf[vid] = nf
        return (path, nf) if nf >= 0 else (None, 0)

    def __len__(self) -> int:
        return len(self.data)

    def num_frames(self, index: int) -> int:
        """Frame count of video ``index`` — the length-bucketing sort key."""
        return self.data[index][3]

    def _load_feats(self, vid: str) -> Dict[str, np.ndarray]:
        """Cached fine features → ``(T_f, 7, 7, C)`` float32 per key."""
        feats = {}
        for k in self.feature_keys:
            path = os.path.join(self.fine_feat_dir, k, vid)
            if os.path.exists(path + ".npy"):
                f = np.load(path + ".npy")  # our cache: (T, 7, 7, C)
            else:
                import torch  # reference cache: (1, C, T, 7, 7) via torch.save

                f = torch.load(path, map_location="cpu").squeeze(0).numpy()
                f = np.transpose(f, (1, 2, 3, 0))
            feats[k] = np.asarray(f, np.float32)
        return feats

    def __getitem__(self, index: int):
        vid, label, dur, nf = self.data[index]
        label = np.asarray(label)  # (nf, C) time-major

        if self.split == "testing":
            frames, start_f = nf, 1
        else:
            frames = min(self.frames, nf)
            start_f = self.rng.randint(1, max(self.gamma_tau, nf - frames))

        stride_f = self.gamma_tau
        if self.split == "testing" and self.task == "loc":
            stride_f = stride_f // self.crops

        use_native = (self.native_crop is not None
                      or (self.native_train is not None
                          and self.split != "testing"))
        flip = False
        if use_native:
            pack, pack_nf = self._pack_for(vid)
            if pack is not None:
                # pack index f-1 holds frame vid-%06d.jpg with f 1-based;
                # stopping at pack_nf matches the JPEG path's stop-at-gap
                # (the pack is built from the contiguous frame listing)
                indices = [i - 1 for i in
                           range(start_f, start_f + frames, stride_f)
                           if i - 1 < pack_nf]
            else:
                paths = []
                for i in range(start_f, start_f + frames, stride_f):
                    p = os.path.join(self.root, vid, f"{vid}-{i:06d}.jpg")
                    if not os.path.exists(p):
                        break  # stop at first gap (charades_fine.py:54-55)
                    paths.append(p)
            if self.native_train is not None and self.split != "testing":
                # same per-clip randomisation protocol (and RNG consumption)
                # as the Python path (charades_fine.py:170-173); the crop
                # itself runs in the C++ pool, the flip on device.
                self.spatial_transform.randomize_parameters(self.crop_size)
                mt = self.native_train
                for t in self.spatial_transform.transforms:
                    if isinstance(t, RandomHorizontalFlip) and t.deferred:
                        flip = t.flipped
                if pack is not None:
                    arr = native.decode_packed_random_crop(
                        pack, indices, mt.size, mt.scale, mt.tl_x, mt.tl_y)
                else:
                    arr = native.decode_batch_random_crop(
                        paths, mt.size, mt.scale, mt.tl_x, mt.tl_y)
            elif pack is not None:
                arr = native.decode_packed(pack, indices, self.native_crop)
            else:
                arr = native.decode_batch(paths, self.native_crop)
        else:
            imgs = load_clip_frames(self.root, vid, start_f, frames, stride_f)
        label = label[start_f - 1 : start_f - 1 + frames]
        if self.task == "class":
            label = label.max(axis=0)

        if not use_native:
            if self.spatial_transform is not None:
                self.spatial_transform.randomize_parameters(self.crop_size)
                for t in getattr(self.spatial_transform, "transforms",
                                 [self.spatial_transform]):
                    if isinstance(t, RandomHorizontalFlip) and t.deferred:
                        flip = t.flipped
                imgs = [self.spatial_transform(img) for img in imgs]
            arr = np.stack([np.asarray(im, np.uint8) for im in imgs], axis=0)
            # (T, H, W, 3) uint8

        if self.split == "testing":
            if self.task == "class":
                tclip = self.frames // self.gamma_tau
                step = (arr.shape[0] - 1 - tclip) // max(self.crops - 1, 1)
                if step <= 0:
                    clips = np.stack([arr[:tclip]] * self.crops, 0)
                else:
                    clips = np.stack(
                        [arr[i : i + tclip]
                         for i in range(0, step * self.crops, step)], 0)
            else:
                tclip = frames // self.gamma_tau
                clips = np.stack(
                    [arr[i :: self.crops][:tclip] for i in range(self.crops)],
                    0)  # (N, T, H, W, 3), interleaved crops
                label = label[: tclip * self.gamma_tau]
        else:
            clips = arr[None]  # (1, T, H, W, 3)

        meta = np.asarray(
            [start_f // self.gamma_tau, frames // self.gamma_tau,
             nf // self.gamma_tau, stride_f // self.gamma_tau], np.int32)

        sample = {
            "clips": clips,
            "label": label.astype(np.float32),
            "vid": vid,
            "meta": meta,
            "dur": float(dur),
            "flip": flip,
        }
        if self.fine_feat_dir is not None:
            sample["feats"] = self._load_feats(vid)
        return sample


def _round_up(n: int, multiple: Optional[int]) -> int:
    if not multiple:
        return n
    return ((n + multiple - 1) // multiple) * multiple


def _bucket_up(n: int, multiple: Optional[int]) -> int:
    """Round up to ``multiple * 2^k`` — geometric padding buckets, so the
    number of distinct padded shapes (= XLA programs) is O(log T_max) instead
    of O(T_max / multiple)."""
    if not multiple:
        return n
    m = multiple
    while m < n:
        m *= 2
    return m


def collate_clips(
    batch: List[dict],
    pad_t_multiple: Optional[int] = None,
    pad_label_multiple: Optional[int] = None,
    bucket: bool = False,
) -> Dict[str, np.ndarray]:
    """Zero-pad clips/labels to the batch max (optionally bucketed up to a
    multiple to bound XLA recompiles) and emit the label-validity mask
    (``mt_collate_fn``, ``charades_fine.py:201-224``).

    ``bucket=True`` pads to geometric ``multiple * 2^k`` buckets instead of
    the next multiple — whole-video validation then compiles O(log T) shapes
    total (pair with the loader's length-sorted order for tight batches)."""
    up = _bucket_up if bucket else _round_up
    max_t = up(max(b["clips"].shape[1] for b in batch), pad_t_multiple)
    max_l = up(max(b["label"].shape[0] for b in batch),
               pad_label_multiple)
    n, h, w = batch[0]["clips"].shape[0], *batch[0]["clips"].shape[2:4]
    c = batch[0]["label"].shape[-1]

    # pooled buffers: fresh page-faulted allocations dominate collate cost
    # on virtualised hosts (see data/bufpool.py); only the padded tails are
    # re-zeroed, the valid region is overwritten anyway
    clips = bufpool.borrow((len(batch), n, max_t, h, w, 3), np.uint8)
    labels = bufpool.borrow((len(batch), max_l, c), np.float32)
    masks = bufpool.borrow((len(batch), max_l), np.float32, zero=True)
    clip_mask = bufpool.borrow((len(batch), max_t), np.float32, zero=True)
    metas = np.stack([b["meta"] for b in batch])
    flips = np.asarray([b["flip"] for b in batch])
    for i, b in enumerate(batch):
        t = b["clips"].shape[1]
        clips[i, :, :t] = b["clips"]
        clips[i, :, t:] = 0
        clip_mask[i, :t] = 1.0
        l = b["label"].shape[0]
        labels[i, :l] = b["label"]
        labels[i, l:] = 0.0
        masks[i, :l] = 1.0
    # clip_mask marks valid input frames: after on-device normalisation the
    # padded tail is re-zeroed so it matches the reference's post-normalise
    # zero padding (mt_collate_fn pads normalised tensors,
    # charades_fine.py:214-218) and the convs' own zero padding.
    return {
        "clips": clips, "labels": labels, "masks": masks,
        "clip_mask": clip_mask, "meta": metas, "flip": flips,
        "vids": [b["vid"] for b in batch],
        "durs": np.asarray([b["dur"] for b in batch], np.float32),
    }


def collate_coarse(
    batch: List[dict],
    feat_cap: int = FEAT_CAP,
    pad_t_multiple: Optional[int] = None,
    pad_label_multiple: Optional[int] = None,
    bucket: bool = False,
) -> Dict[str, np.ndarray]:
    """Coarse-stream collate: also pads cached fine features, **capped at
    ``feat_cap`` frames**, with a feature mask
    (``charades_coarse_fineFEAT.py:208-252``)."""
    out = collate_clips(batch, pad_t_multiple, pad_label_multiple,
                        bucket=bucket)
    keys = list(batch[0]["feats"].keys())
    max_f = max(b["feats"][keys[0]].shape[0] for b in batch)
    if bucket:
        max_f = _bucket_up(max_f, 16)
    max_f = min(max_f, feat_cap)

    feats = {}
    for k in keys:
        c = batch[0]["feats"][k].shape[-1]
        f = bufpool.borrow((len(batch), max_f, 7, 7, c), np.float32)
        for i, b in enumerate(batch):
            t = min(b["feats"][k].shape[0], feat_cap)
            f[i, :t] = b["feats"][k][:t]
            f[i, t:] = 0.0
        feats[k] = f
    feat_mask = bufpool.borrow((len(batch), max_f), np.float32,
                               zero=True)
    for i, b in enumerate(batch):
        feat_mask[i, : min(b["feats"][keys[0]].shape[0], feat_cap)] = 1.0
    out["feats"] = feats
    out["feat_mask"] = feat_mask
    return out

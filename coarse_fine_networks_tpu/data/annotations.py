"""Charades annotation parsing and per-frame label rasterisation.

Mirrors ``make_dataset`` (``charades_fine.py:87-123``): parse
``charades.json`` (``{vid: {subset, duration, actions: [[cls, start_s,
end_s]]}}``), rasterise actions to a dense binary per-frame label matrix at
``fps = num_frames / duration``, skip videos with fewer than ``min_frames``
frames, and cache the result next to the split file.

Differences from the reference: rasterisation is vectorised (the reference
loops Python-per-frame), labels are stored time-major ``(T, C)``, and the
cache is a compressed ``.npz``.
"""

from __future__ import annotations

import json
import os
from typing import List, Tuple

import numpy as np

DEFAULT_MIN_FRAMES = 2 * 80 + 2  # charades_fine.py:107

Entry = Tuple[str, np.ndarray, float, int]  # (vid, label (T, C), duration, nf)


def rasterize_annotations(actions, duration: float, num_frames: int,
                          num_classes: int = 157) -> np.ndarray:
    """Dense per-frame binary labels, time-major ``(num_frames, num_classes)``.

    Frame ``fr`` is positive for class ``c`` iff
    ``start < fr/fps < end`` (strict, matching ``charades_fine.py:115``).
    """
    label = np.zeros((num_frames, num_classes), np.float32)
    if duration <= 0 or num_frames <= 0:
        return label
    fps = num_frames / duration
    t = np.arange(num_frames) / fps
    for cls, start, end in actions:
        label[(t > start) & (t < end), int(cls)] = 1.0
    return label


def _num_frames_on_disk(root: str, vid: str) -> int:
    d = os.path.join(root, vid)
    if not os.path.isdir(d):
        return 0
    return len(os.listdir(d))


def make_dataset(
    split_file: str,
    split: str,
    root: str,
    num_classes: int = 157,
    min_frames: int = DEFAULT_MIN_FRAMES,
    use_cache: bool = True,
    frame_counts=None,
    cache_dir: str | None = None,
) -> List[Entry]:
    """Build (and cache) the per-video label table for a split.

    ``frame_counts`` (optional ``{vid: num_frames}``) overrides the on-disk
    frame-directory listing — e.g. from a ``.cfnpack`` index, or to exercise
    the rasteriser on the real 9,848-video ``charades.json`` when the JPEG
    mirror is absent.  ``cache_dir`` redirects the ``.npz`` cache (the
    default writes next to ``split_file``, which may be read-only)."""
    base = (os.path.join(cache_dir, os.path.basename(split_file))
            if cache_dir else split_file)
    cache = f"{base[:-5]}_{split}_labels_tpu.npz"
    if use_cache and os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        return list(map(tuple, z["entries"]))

    with open(split_file) as f:
        data = json.load(f)

    entries: List[Entry] = []
    for vid, info in data.items():
        if info["subset"] != split:
            continue
        nf = (frame_counts.get(vid, 0) if frame_counts is not None
              else _num_frames_on_disk(root, vid))
        if nf < min_frames:
            continue
        label = rasterize_annotations(info["actions"], info["duration"], nf,
                                      num_classes)
        entries.append((vid, label, float(info["duration"]), nf))

    if use_cache:
        np.savez_compressed(
            cache, entries=np.asarray(entries, dtype=object)
        )
    return entries

"""Charades_v1_localize evaluation, in-house.

The reference's "reported numbers" come from the official external
``Charades_v1_localize`` evaluation script applied to the CSV the coarse
driver writes (README.md:39, ``train_coarse_fineFEAT.py:255-263``).  This
module reimplements that protocol natively so the whole loop closes without
the external zip: parse a submission CSV (``vid, timestamp, 157 scores``),
sample the ground truth at 25 uniform timestamps per video, and compute
per-class average precision over all (video, frame) pairs.
"""

from __future__ import annotations

import csv
from typing import Dict, Iterable, List, Mapping, Tuple

import numpy as np

from .ap import APMeter


def load_submission(path: str) -> Dict[str, List[Tuple[float, np.ndarray]]]:
    """Submission CSV → {vid: [(timestamp_sec, scores (C,)), ...]}."""
    out: Dict[str, List[Tuple[float, np.ndarray]]] = {}
    with open(path) as f:
        for row in csv.reader(f):
            if len(row) < 3:
                continue
            vid, ts, scores = row[0], float(row[1]), row[2]
            arr = np.asarray([float(s) for s in scores.split()], np.float32)
            out.setdefault(vid, []).append((ts, arr))
    return out


def frame_labels_at(annotation: Mapping, timestamp: float,
                    num_classes: int) -> np.ndarray:
    """Binary labels for one timestamp: class active iff
    ``start < t < end`` (the rasteriser's convention,
    ``charades_fine.py:115``)."""
    y = np.zeros(num_classes, np.float32)
    for cls, start, end in annotation["actions"]:
        if start < timestamp < end:
            y[int(cls)] = 1.0
    return y


def evaluate_localization(
    submission_path: str,
    annotations: Mapping[str, Mapping],
    num_classes: int = 157,
) -> Tuple[float, np.ndarray]:
    """Per-frame mAP of a localisation submission against annotations.

    Args:
      submission_path: CSV in the official format.
      annotations: the charades.json dict (``{vid: {duration, actions}}``).

    Returns:
      ``(mAP, per-class AP (C,))`` over every submitted (video, frame) row
      whose video has annotations.
    """
    sub = load_submission(submission_path)
    apm = APMeter()
    for vid, rows in sub.items():
        ann = annotations.get(vid)
        if ann is None:
            continue
        scores = np.stack([r[1] for r in rows])
        labels = np.stack([
            frame_labels_at(ann, r[0], num_classes) for r in rows
        ])
        apm.add(scores, labels)
    ap = apm.value()
    return (float(ap.mean()) if ap.size else 0.0), ap

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


def canonical_timestamps(duration: float, n: int = 25) -> List[float]:
    """The emitter's 25 per-video timestamps: ``1 + i*duration/25``
    (``train_coarse_fineFEAT.py:255-263``)."""
    return [1.0 + i * duration / float(n) for i in range(n)]


def evaluate_localization(
    submission_path: str,
    annotations: Mapping[str, Mapping],
    num_classes: int = 157,
    subset: str | None = "testing",
    count_missing: bool = True,
) -> Tuple[float, np.ndarray]:
    """Per-frame mAP of a localisation submission against annotations,
    following the official ``Charades_v1_localize`` protocol: ground truth is
    defined by the annotations for *every* evaluation video — a video absent
    from the submission contributes zero scores at the canonical 25
    timestamps rather than silently dropping out (the official script scores
    the full test set regardless of what was submitted).

    Args:
      submission_path: CSV in the official format.
      annotations: the charades.json dict (``{vid: {duration, actions}}``);
        entries may carry a ``subset`` field.
      subset: if set, only annotations whose ``subset`` matches (or that have
        no subset field) are evaluated.
      count_missing: include annotated evaluation videos that are missing
        from the submission as zero-score rows.

    Returns:
      ``(mAP, per-class AP (C,))`` pooled over all (video, frame) pairs.
    """
    sub = load_submission(submission_path)
    apm = APMeter()
    n_missing = 0
    for vid, ann in annotations.items():
        vsub = ann.get("subset")
        if subset is not None and vsub is not None and vsub != subset:
            continue
        rows = sub.get(vid)
        if rows is None:
            if not count_missing:
                continue
            n_missing += 1
            ts = canonical_timestamps(float(ann.get("duration", 0.0)))
            scores = np.zeros((len(ts), num_classes), np.float32)
        else:
            ts = [r[0] for r in rows]
            scores = np.stack([r[1] for r in rows])
        labels = np.stack([
            frame_labels_at(ann, t, num_classes) for t in ts
        ])
        apm.add(scores, labels)
    # submitted videos without annotations are ignored (unknown ground truth)
    ap = apm.value()
    return (float(ap.mean()) if ap.size else 0.0), ap

"""APMeter parity against the reference apmeter.py, and localize CSV format."""

import csv
import os
import sys

import numpy as np
import pytest

from coarse_fine_networks_tpu.metrics import (
    APMeter,
    LocalizeCSVWriter,
    subsample_25,
)

REF_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="no reference")
def test_apmeter_matches_reference():
    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    import apmeter as ref_apmeter

    rng = np.random.RandomState(0)
    ours = APMeter()
    ref = ref_apmeter.APMeter()
    for _ in range(3):
        scores = rng.rand(40, 6).astype(np.float32)
        targets = (rng.rand(40, 6) > 0.7).astype(np.float32)
        ours.add(scores, targets)
        ref.add(scores, targets)
    np.testing.assert_allclose(
        ours.value(), ref.value().numpy(), rtol=1e-5, atol=1e-6
    )


def test_apmeter_perfect_and_worst():
    m = APMeter()
    scores = np.asarray([[0.9], [0.8], [0.1]], np.float32)
    targets = np.asarray([[1], [1], [0]], np.float32)
    m.add(scores, targets)
    assert m.value()[0] == pytest.approx(1.0)
    m.reset()
    m.add(scores, 1 - targets)
    assert m.value()[0] == pytest.approx(1 / 3)


def test_subsample_25_matches_reference_slicing():
    rng = np.random.RandomState(0)
    tc = rng.rand(300, 157).astype(np.float32)
    valid = 260
    p = subsample_25(tc, valid)
    sc = int(valid / 25.0)
    ref = tc[:valid][1::sc][:25]
    np.testing.assert_array_equal(p, ref)
    assert p.shape[0] == 25


def test_localize_csv_rows(tmp_path):
    path = str(tmp_path / "loc.csv")
    probs = np.random.RandomState(0).rand(25, 4).astype(np.float32)
    with LocalizeCSVWriter(path) as w:
        w.add_video("VID01", probs, duration=30.0)
    rows = list(csv.reader(open(path)))
    assert len(rows) == 25
    assert rows[0][0] == "VID01"
    assert float(rows[1][1]) == pytest.approx(1 + 30.0 / 25.0)
    assert len(rows[0][2].split(" ")) == 4


def test_evaluate_localization_end_to_end(tmp_path):
    """Write a submission with our CSV writer, evaluate with the in-house
    Charades_v1_localize evaluator; a perfect submission scores mAP 1."""
    from coarse_fine_networks_tpu.metrics import evaluate_localization

    rng = np.random.RandomState(0)
    num_classes = 6
    annotations = {
        "V0": {"duration": 25.0, "actions": [[0, 2.0, 10.0], [3, 12.0, 20.0]]},
        "V1": {"duration": 25.0, "actions": [[1, 0.5, 24.0]]},
    }
    path = str(tmp_path / "sub.csv")
    with LocalizeCSVWriter(path) as w:
        for vid, ann in annotations.items():
            probs = np.zeros((25, num_classes), np.float32)
            for i in range(25):
                t = 1 + i * ann["duration"] / 25.0
                for cls, s, e in ann["actions"]:
                    if s < t < e:
                        probs[i, cls] = 0.9
            probs += rng.rand(25, num_classes).astype(np.float32) * 0.05
            w.add_video(vid, probs, ann["duration"])

    mAP, ap = evaluate_localization(path, annotations, num_classes)
    assert ap.shape == (num_classes,)
    # annotated classes are ranked perfectly; classes with no positives score
    # AP 0 by the reference convention (apmeter.py:135)
    assert ap[[0, 1, 3]].min() > 0.95
    assert ap[[2, 4, 5]].max() == 0.0

    # a random submission scores much lower on the annotated classes
    path2 = str(tmp_path / "rand.csv")
    with LocalizeCSVWriter(path2) as w:
        for vid, ann in annotations.items():
            w.add_video(vid, rng.rand(25, num_classes).astype(np.float32),
                        ann["duration"])
    mAP2, _ = evaluate_localization(path2, annotations, num_classes)
    assert mAP2 < mAP

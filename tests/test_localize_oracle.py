"""Official ``Charades_v1_localize`` protocol oracle.

The reference's reported numbers come from the official external evaluation
script (``/root/reference/README.md:39``) applied to the CSV written at
``train_coarse_fineFEAT.py:255-263``.  This file implements the official
algorithm *independently* of ``metrics/charades_eval.py`` and checks the
in-house evaluator against it, including the edge cases the official script
defines behaviour for:

  * videos missing from a submission are scored as all-zero predictions over
    the full evaluation set (not silently dropped);
  * ground truth is sampled at the canonical 25 per-video timestamps,
    independently of what the submission contains;
  * short videos (``valid_t < 25``) emit fewer rows (the 25-frame subsample
    clamps its stride, ``train_coarse_fineFEAT.py:249-253``).

Tie-breaking among equal scores is unspecified by the protocol; the oracle
uses the same stable-sort convention as the evaluator so ties (the all-zero
rows of missing videos) compare deterministically.
"""

import csv

import numpy as np
import pytest

from coarse_fine_networks_tpu.metrics import (
    LocalizeCSVWriter,
    evaluate_localization,
    subsample_25,
)


def _gt_at(ann, t, num_classes):
    y = np.zeros(num_classes, np.float32)
    for cls, s, e in ann["actions"]:
        if s < t < e:
            y[int(cls)] = 1.0
    return y


def official_localize_map(submission_path, annotations, num_classes):
    """Independent oracle: pool scores/gt over every annotated test video at
    its canonical timestamps (missing videos → zero scores), then per-class
    AP via the official cumsum-precision-at-positives formula."""
    # parse the submission into {vid: {timestamp: scores}}
    sub = {}
    with open(submission_path) as f:
        for row in csv.reader(f):
            vid, ts = row[0], float(row[1])
            sub.setdefault(vid, {})[round(ts, 6)] = np.asarray(
                [float(x) for x in row[2].split()], np.float32)

    score_rows, gt_rows = [], []
    for vid, ann in annotations.items():
        if ann.get("subset") not in (None, "testing"):
            continue
        dur = float(ann["duration"])
        if vid in sub:
            # evaluate the rows the submission provided (short videos emit
            # fewer than 25), gt sampled at the row timestamps
            for ts, sc in sorted(sub[vid].items()):
                score_rows.append(sc)
                gt_rows.append(_gt_at(ann, ts, num_classes))
        else:
            for i in range(25):
                t = 1.0 + i * dur / 25.0
                score_rows.append(np.zeros(num_classes, np.float32))
                gt_rows.append(_gt_at(ann, t, num_classes))
    scores = np.stack(score_rows)
    gt = np.stack(gt_rows)

    aps = np.zeros(num_classes, np.float32)
    for c in range(num_classes):
        order = np.argsort(-scores[:, c], kind="stable")
        tp = gt[order, c]
        npos = tp.sum()
        if npos == 0:
            aps[c] = 0.0  # reference APMeter convention (apmeter.py:135)
            continue
        prec = np.cumsum(tp) / np.arange(1, len(tp) + 1)
        aps[c] = float((prec * tp).sum() / npos)
    return float(aps.mean()), aps


@pytest.fixture
def annotations():
    return {
        "V0": {"subset": "testing", "duration": 25.0,
               "actions": [[0, 2.0, 10.0], [3, 12.0, 20.0]]},
        "V1": {"subset": "testing", "duration": 30.0,
               "actions": [[1, 0.5, 24.0], [2, 5.0, 6.0]]},
        "V2": {"subset": "testing", "duration": 18.0,
               "actions": [[0, 1.0, 9.0], [4, 2.0, 17.0]]},
        "VTRAIN": {"subset": "training", "duration": 10.0,
                   "actions": [[5, 0.0, 10.0]]},
    }


def _write_submission(path, annotations, vids, rng, num_classes=6, rows=25):
    with LocalizeCSVWriter(str(path)) as w:
        for vid in vids:
            ann = annotations[vid]
            probs = rng.rand(rows, num_classes).astype(np.float32)
            for i in range(rows):
                t = 1 + i * ann["duration"] / rows
                for cls, s, e in ann["actions"]:
                    if s < t < e:
                        probs[i, cls] += 1.0
            w.add_video(vid, probs, ann["duration"])


def test_evaluator_matches_official_oracle(tmp_path, annotations):
    rng = np.random.RandomState(0)
    path = tmp_path / "sub.csv"
    _write_submission(path, annotations, ["V0", "V1", "V2"], rng)
    m_ref, ap_ref = official_localize_map(str(path), annotations, 6)
    m_got, ap_got = evaluate_localization(str(path), annotations, 6)
    np.testing.assert_allclose(ap_got, ap_ref, rtol=1e-6)
    assert m_got == pytest.approx(m_ref)
    # the training-subset video must not contribute: class 5 has no test gt
    assert ap_got[5] == 0.0


def test_missing_video_scored_as_zeros(tmp_path, annotations):
    """V2 left out of the submission: the official protocol still scores its
    frames (zero predictions), pulling down classes 0 and 4."""
    rng = np.random.RandomState(1)
    full, part = tmp_path / "full.csv", tmp_path / "part.csv"
    _write_submission(full, annotations, ["V0", "V1", "V2"], rng)
    rng = np.random.RandomState(1)
    _write_submission(part, annotations, ["V0", "V1"], rng)

    m_ref, ap_ref = official_localize_map(str(part), annotations, 6)
    m_got, ap_got = evaluate_localization(str(part), annotations, 6)
    np.testing.assert_allclose(ap_got, ap_ref, rtol=1e-6)

    _, ap_full = evaluate_localization(str(full), annotations, 6)
    assert ap_got[4] < ap_full[4]  # class 4 only in the dropped video
    # dropping the video changes the score — silently skipping it would not
    _, ap_skip = evaluate_localization(str(part), annotations, 6,
                                       count_missing=False)
    assert not np.allclose(ap_skip, ap_got)


def test_short_video_fewer_rows(tmp_path, annotations):
    """valid_t < 25: subsample_25 clamps its stride and emits valid_t-1 rows;
    the evaluator and the oracle agree on the reduced row set."""
    probs = np.random.RandomState(2).rand(40, 6).astype(np.float32)
    sub7 = subsample_25(probs, valid_t=7)
    assert sub7.shape[0] == 6  # x[:7][1::1][:25]

    path = tmp_path / "short.csv"
    with LocalizeCSVWriter(str(path)) as w:
        w.add_video("V0", sub7, annotations["V0"]["duration"])
        _ = w  # V1/V2 missing on purpose
    m_ref, ap_ref = official_localize_map(str(path), annotations, 6)
    m_got, ap_got = evaluate_localization(str(path), annotations, 6)
    np.testing.assert_allclose(ap_got, ap_ref, rtol=1e-6)


def test_subsample_25_matches_reference_slicing():
    """For valid_t >= 25 the slice is exactly the reference's
    ``p1[:, 1::int(sc)][:, :25]`` (train_coarse_fineFEAT.py:249-253)."""
    rng = np.random.RandomState(3)
    for valid_t in (25, 26, 49, 50, 51, 100, 999):
        p = rng.rand(valid_t + 8, 6).astype(np.float32)
        got = subsample_25(p, valid_t)
        sc = valid_t / 25.0
        want = p[:valid_t][1::int(sc)][:25]
        np.testing.assert_array_equal(got, want)
        assert got.shape[0] <= 25

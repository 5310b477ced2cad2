"""Real-scale annotation handling: the actual 9,848-video ``charades.json``
shipped with the reference (``/root/reference/data/charades.json``).

Every other data test runs a synthetic mini-corpus; these run the annotation
parser, the >=162-frame skip logic, the vectorised rasteriser, the ``.npz``
label cache and the 25-frame localize evaluator against the real file at
full-split scale (the JPEG mirror is stripped, so frame counts are emulated
at the Charades 24 fps via ``make_dataset(frame_counts=...)``).

Reference accounting (``log_coarse_fine_train.txt:3-5``): 7,985 training /
1,863 testing annotated videos; usable = those whose frame directory holds
at least ``2*80+2 = 162`` frames (``charades_fine.py:107-108``).
"""

import json
import os
import time
from collections import Counter

import numpy as np
import pytest

from coarse_fine_networks_tpu.data.annotations import (
    DEFAULT_MIN_FRAMES,
    make_dataset,
    rasterize_annotations,
)

REF_JSON = "/root/reference/data/charades.json"
FPS = 24  # Charades-v1 frame rate (frames stripped from this mirror)

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_JSON), reason="reference charades.json not mounted"
)


@pytest.fixture(scope="module")
def real():
    with open(REF_JSON) as f:
        data = json.load(f)
    frame_counts = {vid: int(round(info["duration"] * FPS))
                    for vid, info in data.items()}
    return data, frame_counts


def _loop_rasterize(actions, duration, nf, nc=157):
    """The reference's per-frame Python loop (charades_fine.py:110-117),
    transposed to time-major."""
    label = np.zeros((nc, nf), np.float32)
    fps = nf / duration
    for ann in actions:
        for fr in range(nf):
            if fr / fps > ann[1] and fr / fps < ann[2]:
                label[int(ann[0]), fr] = 1.0
    return label.T


def test_real_subset_counts(real):
    data, _ = real
    assert len(data) == 9848
    counts = Counter(v["subset"] for v in data.values())
    assert counts["training"] == 7985
    assert counts["testing"] == 1863
    # every entry carries the fields the rasteriser consumes
    for info in data.values():
        assert info["duration"] > 0
        for cls, s, e in info["actions"]:
            assert 0 <= int(cls) < 157


def test_real_testing_split_make_dataset(real):
    """Full real testing split through make_dataset: skip logic + vectorised
    rasteriser at 1,863-video scale, spot-checked against the reference's
    per-frame loop."""
    data, frame_counts = real
    t0 = time.monotonic()
    entries = make_dataset(REF_JSON, "testing", root="/nonexistent",
                           frame_counts=frame_counts, use_cache=False)
    dt = time.monotonic() - t0

    testing = {v: i for v, i in data.items() if i["subset"] == "testing"}
    usable = [v for v in testing if frame_counts[v] >= DEFAULT_MIN_FRAMES]
    assert len(entries) == len(usable)
    # at 24 fps the usable count reproduces the reference's logged dataset
    # size EXACTLY (log_coarse_fine_train.txt:5 — "dataset size:1851"):
    # Charades frames were extracted at 24 fps, so duration*24 matches the
    # on-disk frame counts the reference's skip logic saw
    assert len(entries) == 1851
    by_vid = {e[0]: e for e in entries}
    # skip logic: every skipped video is genuinely short
    for v in testing:
        if v not in by_vid:
            assert frame_counts[v] < DEFAULT_MIN_FRAMES

    # rasteriser parity vs the reference loop on a deterministic sample
    sample = sorted(by_vid)[:: max(len(by_vid) // 10, 1)][:10]
    for v in sample:
        _, label, dur, nf = by_vid[v]
        assert label.shape == (nf, 157)
        ref = _loop_rasterize(testing[v]["actions"], dur, nf)
        np.testing.assert_array_equal(label, ref)
    print(f"\n[real-charades] testing-split rasterise: {len(entries)} videos "
          f"in {dt:.2f}s ({len(entries) / dt:.0f} videos/s)")


def test_real_training_split_scale(real):
    """The full 7,985-video training split rasterises in one pass (the
    reference's first-run make_dataset path, charades_fine.py:96-120)."""
    data, frame_counts = real
    t0 = time.monotonic()
    entries = make_dataset(REF_JSON, "training", root="/nonexistent",
                           frame_counts=frame_counts, use_cache=False)
    dt = time.monotonic() - t0
    training = {v: i for v, i in data.items() if i["subset"] == "training"}
    usable = [v for v in training if frame_counts[v] >= DEFAULT_MIN_FRAMES]
    assert len(entries) == len(usable)
    # reproduces "dataset size:7909" (log_coarse_fine_train.txt:3) — see the
    # 24 fps note in test_real_testing_split_make_dataset
    assert len(entries) == 7909
    total_frames = sum(e[3] for e in entries)
    print(f"\n[real-charades] training-split rasterise: {len(entries)} "
          f"videos / {total_frames / 1e6:.1f}M frames in {dt:.2f}s")


def test_real_cache_roundtrip(real, tmp_path):
    """.npz label cache at a few-hundred-video scale: second call loads the
    cache (the reference's `<split>_labeldata_160.npy` contract,
    charades_fine.py:92-95) and reproduces the entries exactly."""
    data, frame_counts = real
    sub = dict(sorted(data.items())[:400])
    sub_json = tmp_path / "charades_sub.json"
    sub_json.write_text(json.dumps(sub))
    kw = dict(root="/nonexistent", frame_counts=frame_counts,
              cache_dir=str(tmp_path))
    built = make_dataset(str(sub_json), "training", **kw)
    cache = tmp_path / "charades_sub_training_labels_tpu.npz"
    assert cache.exists()
    loaded = make_dataset(str(sub_json), "training", **kw)
    assert len(loaded) == len(built) > 100
    for (v1, l1, d1, n1), (v2, l2, d2, n2) in zip(built, loaded):
        assert v1 == v2 and n1 == n2 and d1 == d2
    np.testing.assert_array_equal(built[7][1], loaded[7][1])


def test_real_localize_eval_full_test_split(real, tmp_path):
    """25-frame Charades_v1_localize protocol over the FULL real test split:
    a perfect-oracle submission scores ~1.0 mAP, a mislabelled one collapses
    — the evaluator (metrics/charades_eval.py) is exercised at the exact
    scale the official script sees (README.md:39)."""
    from coarse_fine_networks_tpu.metrics.charades_eval import (
        canonical_timestamps,
        evaluate_localization,
        frame_labels_at,
    )

    data, _ = real
    testing = {v: i for v, i in data.items() if i["subset"] == "testing"}
    rng = np.random.RandomState(0)
    path = tmp_path / "submission.csv"
    with open(path, "w") as f:
        for vid, info in testing.items():
            for ts in canonical_timestamps(info["duration"]):
                y = frame_labels_at(info, ts, 157)
                scores = y + 0.01 * rng.rand(157)  # oracle + tie-break noise
                f.write(f"{vid},{ts:.6f}," +
                        " ".join(f"{s:.4f}" for s in scores) + "\n")
    t0 = time.monotonic()
    mAP, per_class = evaluate_localization(str(path), testing)
    dt = time.monotonic() - t0
    assert mAP > 0.99, mAP
    assert per_class.shape == (157,)
    print(f"\n[real-charades] localize eval: {len(testing)} videos x 25 "
          f"frames in {dt:.2f}s, oracle mAP {mAP:.4f}")

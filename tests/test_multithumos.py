"""Multi-THUMOS annotation adapter → framework dataset round trip."""

import json
import os

import numpy as np

from coarse_fine_networks_tpu.data import make_dataset
from coarse_fine_networks_tpu.data.multithumos import (
    convert_annotations,
    load_class_list,
)
from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades


def test_convert_and_rasterize(tmp_path):
    # frame dirs (reuse the synthetic generator's tree)
    generate_mini_charades(str(tmp_path), num_videos=2, num_frames=30, hw=24)
    frames = os.path.join(str(tmp_path), "frames")
    # rename to THUMOS-style ids
    os.rename(os.path.join(frames, "SYN000"),
              os.path.join(frames, "video_validation_0001"))
    os.rename(os.path.join(frames, "SYN001"),
              os.path.join(frames, "video_test_0001"))

    anno_dir = tmp_path / "annos"
    anno_dir.mkdir()
    (tmp_path / "class_list.txt").write_text("1 Run\n2 Jump\n")
    (anno_dir / "Run.txt").write_text(
        "video_validation_0001 0.1 0.5\nvideo_test_0001 0.2 0.8\n")
    (anno_dir / "Jump.txt").write_text("video_validation_0001 0.4 0.9\n")

    classes = load_class_list(str(tmp_path / "class_list.txt"))
    assert classes == {"Run": 0, "Jump": 1}

    out = convert_annotations(str(anno_dir), str(tmp_path / "class_list.txt"),
                              frames, str(tmp_path / "mt.json"), fps=30.0)
    data = json.load(open(out))
    assert data["video_validation_0001"]["subset"] == "training"
    assert data["video_test_0001"]["subset"] == "testing"
    assert len(data["video_validation_0001"]["actions"]) == 2

    entries = make_dataset(out, "training", frames, num_classes=2,
                           min_frames=5, use_cache=False)
    assert len(entries) == 1
    vid, label, dur, nf = entries[0]
    assert label.shape == (30, 2)
    assert label[:, 0].sum() > 0  # Run rasterised

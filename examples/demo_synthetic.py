"""End-to-end demo on generated data — no Charades download needed.

Runs the full three-stage pipeline at toy scale:

    1. train the Fine stream a few steps,
    2. extract the fine-feature cache (both splits),
    3. train the Coarse stream (Grid Pool + fusion) and emit + score the
       Charades_v1_localize CSV with the in-house evaluator.

    python examples/demo_synthetic.py [workdir]
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades
from coarse_fine_networks_tpu.metrics import evaluate_localization
from coarse_fine_networks_tpu.train import (
    coarse_driver,
    extract_driver,
    fine_driver,
)
from coarse_fine_networks_tpu.train.config import DriverConfig


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="cfn_demo_")
    print(f"workdir: {root}")
    anno = generate_mini_charades(root, num_videos=6, num_frames=48, hw=64)

    common = dict(
        anno=anno, root=os.path.join(root, "frames"),
        save_dir=os.path.join(root, "models"),
        batch_size=2, val_batch_size=1, frames=8, min_frames=10,
        crop_size_override=32, max_epochs=2, train_phases_per_val=1,
        num_workers=2, ckpt_every=1, max_steps=3, pad_t_multiple=4,
        pad_label_multiple=8, resume=False, compute_dtype="float32",
    )

    print("== stage 1: fine training ==")
    fine_res = fine_driver.run(DriverConfig(**common))
    print("fine:", fine_res)

    print("== stage 2: feature extraction ==")
    feat_dir = os.path.join(root, "fine_feats")
    ckpts = sorted(os.listdir(common["save_dir"]))
    fine_ckpt = os.path.join(common["save_dir"],
                             [c for c in ckpts if c.startswith("fine")][-1])
    n = extract_driver.run(DriverConfig(**common), feat_dir, fine_ckpt)
    print(f"extracted {n} videos -> {feat_dir}")

    print("== stage 3: coarse training + localisation ==")
    csv_path = os.path.join(root, "localize.csv")
    coarse_res = coarse_driver.run(DriverConfig(
        **common, fine_feat_dir=feat_dir, align_corners=False,
        fusion_lr_mult=10.0, localize_csv=csv_path,
    ))
    print("coarse:", coarse_res)

    mAP, _ = evaluate_localization(csv_path, json.load(open(anno)))
    print(f"Charades_v1_localize mAP (in-house evaluator): {mAP:.4f}")


if __name__ == "__main__":
    main()

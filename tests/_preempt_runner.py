"""Subprocess body for the preemption-recovery test: train the fine stream
on synthetic data indefinitely; the parent SIGTERMs us mid-training and the
preemption guard must checkpoint the in-flight step on the way out."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coarse_fine_networks_tpu.train import fine_driver  # noqa: E402
from coarse_fine_networks_tpu.train.config import DriverConfig  # noqa: E402


def main():
    root = sys.argv[1]
    anno = os.path.join(root, "annotations.json")
    cfg = DriverConfig(
        anno=anno, root=os.path.join(root, "frames"),
        save_dir=os.path.join(root, "models"),
        num_classes=11, batch_size=2, val_batch_size=1, init_lr=0.01,
        frames=8, min_frames=10, crop_size_override=32,
        max_epochs=10 ** 6, train_phases_per_val=10 ** 6, num_workers=2,
        ckpt_every=10 ** 9,          # ONLY the preemption guard may save
        pad_t_multiple=4, pad_label_multiple=8, resume=False,
        compute_dtype="float32", log_every_frac=10 ** 6,
    )
    fine_driver.run(cfg)


if __name__ == "__main__":
    main()

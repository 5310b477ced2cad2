"""Kinetics pretraining driver: dataset/collate, a short training run, and
the pretrain → detection transfer (head swap) the reference assumes
(``train_fine.py:104-111``)."""

import os

import numpy as np
import pytest

from coarse_fine_networks_tpu.data.kinetics import (
    KineticsDataset,
    collate_kinetics,
    generate_mini_kinetics,
)
from coarse_fine_networks_tpu.data.transforms import CenterCropScaled, Compose
from coarse_fine_networks_tpu.train.config import DriverConfig


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("kinetics")
    anno = generate_mini_kinetics(str(root), num_videos=8, num_frames=40,
                                  hw=48, num_classes=5)
    return str(root), anno


def test_dataset_and_collate(corpus):
    root, anno = corpus
    ds = KineticsDataset(anno, "training", os.path.join(root, "frames"),
                         spatial_transform=Compose([CenterCropScaled(32)]),
                         frames=4, gamma_tau=2, crop_size=32)
    assert len(ds) == 6  # 3/4 of 8 are training
    s = ds[0]
    assert s["clips"].shape == (1, 4, 32, 32, 3)
    assert isinstance(s["label"], int)
    batch = collate_kinetics([ds[0], ds[1]], pad_t_multiple=4)
    assert batch["clips"].shape == (2, 1, 4, 32, 32, 3)
    assert batch["labels"].shape == (2,)
    assert batch["clip_mask"].sum() == 8


@pytest.mark.slow
def test_pretrain_and_transfer(corpus, tmp_path):
    root, anno = corpus
    from coarse_fine_networks_tpu.ckpt import latest_checkpoint
    from coarse_fine_networks_tpu.train import fine_driver, kinetics_driver

    cfg = DriverConfig(
        anno=anno, root=os.path.join(root, "frames"),
        save_dir=str(tmp_path / "models"),
        num_classes=5, batch_size=2, val_batch_size=2, init_lr=0.01,
        frames=4, min_frames=10, crop_size_override=32,
        max_epochs=1, num_workers=2, ckpt_every=100, max_steps=2,
        max_val_batches=1, pad_t_multiple=4, resume=False,
        compute_dtype="float32",
    )
    results = kinetics_driver.run(cfg)
    assert np.isfinite(results["train_loss"])
    assert "val_top1" in results
    ckpt = latest_checkpoint(str(tmp_path / "models"), "kinetics_x3d")
    assert ckpt is not None

    # transfer: detection fine-tuning from the pretrained trunk (the 5→11
    # class-head shape mismatch keeps the fresh head — replace_logits)
    from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades

    det_anno = generate_mini_charades(str(tmp_path / "det"), num_videos=4,
                                      num_frames=40, hw=48, num_classes=11)
    det_cfg = DriverConfig(
        anno=det_anno, root=str(tmp_path / "det" / "frames"),
        save_dir=str(tmp_path / "det" / "models"),
        num_classes=11, batch_size=2, val_batch_size=1, init_lr=0.01,
        frames=8, min_frames=10, crop_size_override=32,
        max_epochs=1, train_phases_per_val=1, num_workers=2,
        ckpt_every=100, max_steps=1, max_val_batches=1,
        pad_t_multiple=4, pad_label_multiple=8, resume=False,
        compute_dtype="float32", kinetics_ckpt=ckpt,
    )
    det_results = fine_driver.run(det_cfg)
    # max_steps=1 returns after the first train step (before the val phase);
    # the transfer itself is proven by the load log + finite train mAP
    assert np.isfinite(det_results["train_map"])


@pytest.mark.slow
def test_pretrain_under_mesh(corpus, tmp_path):
    """Kinetics pretraining under a data-parallel mesh: state replicated,
    batch sharded, same train surface as the detection drivers (the driver
    used to jit plain per-host numpy batches)."""
    import jax

    from coarse_fine_networks_tpu.train import kinetics_driver

    assert jax.device_count() >= 2
    root, anno = corpus
    cfg = DriverConfig(
        anno=anno, root=os.path.join(root, "frames"),
        save_dir=str(tmp_path / "models_mesh"),
        num_classes=5, batch_size=2, val_batch_size=2, init_lr=0.01,
        frames=4, min_frames=10, crop_size_override=32,
        max_epochs=1, num_workers=2, ckpt_every=100, max_steps=2,
        max_val_batches=1, pad_t_multiple=4, resume=False,
        compute_dtype="float32", mesh_devices=2,
    )
    results = kinetics_driver.run(cfg)
    assert np.isfinite(results["train_loss"])

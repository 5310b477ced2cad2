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


def test_cosine_schedule():
    from coarse_fine_networks_tpu.train.optim import CosineSchedule

    s = CosineSchedule(0.1, total_steps=110, warmup_steps=10, final_lr=0.001)
    # linear warmup ramps to init_lr
    assert s.lr(0) == pytest.approx(0.01)
    assert s.lr(9) == pytest.approx(0.1)
    # half-period cosine: midpoint = mean(init, final), end = final
    assert s.lr(60) == pytest.approx((0.1 + 0.001) / 2)
    assert s.lr(110) == pytest.approx(0.001)
    assert s.lr(10_000) == pytest.approx(0.001)  # clamped past horizon
    # state round-trip (interface parity with MultiStepSchedule)
    s.epoch_step()
    s2 = CosineSchedule(0.1, 110, 10, 0.001)
    s2.load_state_dict(s.state_dict())
    assert s2.epoch == 1


def test_build_schedule_factory():
    from coarse_fine_networks_tpu.train.optim import (
        CosineSchedule,
        MultiStepSchedule,
        build_schedule,
    )

    cfg = DriverConfig(anno="x", root="x", max_epochs=4)
    assert isinstance(build_schedule(cfg, 10), MultiStepSchedule)
    cfg = DriverConfig(anno="x", root="x", lr_schedule="cosine", max_epochs=4)
    s = build_schedule(cfg, steps_per_epoch=25)
    assert isinstance(s, CosineSchedule) and s.total_steps == 100
    cfg = DriverConfig(anno="x", root="x", lr_schedule="cosine",
                       total_steps=7)
    assert build_schedule(cfg, 25).total_steps == 7
    with pytest.raises(ValueError):
        build_schedule(DriverConfig(anno="x", root="x", lr_schedule="bogus"))


def test_smoothed_ce():
    import jax.numpy as jnp

    from coarse_fine_networks_tpu.train.kinetics_driver import smoothed_ce

    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 6).astype(np.float32))
    labels = jnp.asarray([0, 3, 5, 2])
    # eps=0 is plain NLL
    logp = np.log(np.exp(logits) / np.exp(logits).sum(1, keepdims=True))
    nll = -logp[np.arange(4), np.asarray(labels)]
    np.testing.assert_allclose(smoothed_ce(logits, labels), nll, rtol=1e-5)
    # smoothed = (1-eps)*nll + eps*mean_c(-logp)
    eps = 0.1
    want = (1 - eps) * nll + eps * (-logp.mean(axis=1))
    np.testing.assert_allclose(smoothed_ce(logits, labels, eps), want,
                               rtol=1e-5)


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
def test_pretrain_cosine_multigrid(tmp_path):
    """The at-scale pretraining recipe: cosine LR + label smoothing +
    long-cycle multigrid through the kinetics driver (the policy behind the
    reference's pretrained trunk, which it assumes but never ships)."""
    from coarse_fine_networks_tpu.train import kinetics_driver

    anno = generate_mini_kinetics(str(tmp_path), num_videos=12,
                                  num_frames=40, hw=48, num_classes=5)
    cfg = DriverConfig(
        anno=anno, root=os.path.join(str(tmp_path), "frames"),
        save_dir=str(tmp_path / "models"),
        num_classes=5, batch_size=1, val_batch_size=2, init_lr=0.01,
        frames=8, min_frames=10, crop_size_override=32,
        max_epochs=2, num_workers=2, ckpt_every=100,
        max_val_batches=1, pad_t_multiple=4, resume=False,
        compute_dtype="float32",
        lr_schedule="cosine", warmup_steps=2, label_smoothing=0.1,
        multigrid=True, multigrid_epochs_per_phase=1,
    )
    results = kinetics_driver.run(cfg)
    phases = results["multigrid_phases"]
    assert len(phases) >= 2, phases
    # DEFAULT_LONG_CYCLE @ base (frames=8, crop=32, batch=1):
    # phase 0 -> frames 2, crop 16, batch 8, splits 8; phase 1 -> 4, 16, 4, 4
    assert phases[0][1:] == (2, 16, 8, 8)
    assert (phases[1][1], phases[1][3], phases[1][4]) == (4, 4, 4)
    assert np.isfinite(results["train_loss"])
    assert "val_top1" in results


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

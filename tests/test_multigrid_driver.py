"""Driven multigrid (VERDICT #8): the long-cycle schedule actually changes
training shapes and SubBN split counts mid-run through the fine driver — the
reference ships these hooks dormant (``x3d_fine.py:313-318``,
``spatial_transforms.py:505-509``)."""

import os

import pytest

from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades
from coarse_fine_networks_tpu.train import fine_driver
from coarse_fine_networks_tpu.train.config import DriverConfig
from coarse_fine_networks_tpu.train.multigrid import (
    LongCyclePhase,
    LongCycleSchedule,
)


def test_long_cycle_transition_is_absolute():
    """Phase transitions set absolute split counts (8 → 4, not 8 → 32)."""
    import numpy as np

    stats = {"bn": {"mean": np.zeros(3), "var": np.ones(3),
                    "split_mean": np.zeros(3), "split_var": np.ones(3)}}
    sched = LongCycleSchedule(8, 32, 2, epochs_per_phase=1)
    s0, n0 = sched.transition(0, stats)
    assert n0 == 8 and s0["bn"]["split_mean"].shape == (24,)
    s1, n1 = sched.transition(1, s0)
    assert n1 == 4 and s1["bn"]["split_mean"].shape == (12,)


@pytest.mark.slow
def test_multigrid_two_phase_fine_training(tmp_path):
    """Two-phase run: dataset window, crop size, batch size and bn_splits all
    change at the phase boundary and training stays green."""
    anno = generate_mini_charades(str(tmp_path), num_videos=10, num_frames=40,
                                  hw=48, num_classes=11, train_fraction=0.9)
    cfg = DriverConfig(
        anno=anno, root=os.path.join(str(tmp_path), "frames"),
        save_dir=os.path.join(str(tmp_path), "models"),
        num_classes=11, batch_size=1, val_batch_size=1, init_lr=0.01,
        frames=8, min_frames=10, crop_size_override=32,
        max_epochs=2, train_phases_per_val=1, num_workers=2,
        ckpt_every=100, max_val_batches=1,
        pad_t_multiple=4, pad_label_multiple=8, resume=False,
        compute_dtype="float32", multigrid=True,
        multigrid_epochs_per_phase=1,
    )
    results = fine_driver.run(cfg)
    phases = results["multigrid_phases"]
    assert len(phases) >= 2, phases
    (e0, f0, c0, b0, s0), (e1, f1, c1, b1, s1) = phases[0], phases[1]
    assert (e0, e1) == (0, 1)
    # phase 0: frames/4, crop/2, batch x8, splits x8; phase 1: frames/2,
    # crop x0.707, batch x4, splits x4 (DEFAULT_LONG_CYCLE)
    assert (f0, c0, b0, s0) == (2, 16, 8, 8)
    assert (f1, b1, s1) == (4, 4, 4)
    assert "val_map" in results


@pytest.mark.slow
def test_multigrid_under_mesh_with_accumulation(tmp_path):
    """Multigrid x data-parallel mesh x gradient accumulation (VERDICT r2
    #8): the long-cycle schedule changes batch size / crop / bn_splits while
    the batch is sharded over a 2-device mesh and every optimizer update
    accumulates 2 micro-batches.  The bn-split transition's rebuilt stats
    re-replicate over the mesh (fine_driver.mg_apply)."""
    import numpy as np

    anno = generate_mini_charades(str(tmp_path), num_videos=20,
                                  num_frames=40, hw=48, num_classes=11,
                                  train_fraction=0.9)
    cfg = DriverConfig(
        anno=anno, root=os.path.join(str(tmp_path), "frames"),
        save_dir=os.path.join(str(tmp_path), "models"),
        num_classes=11, batch_size=1, val_batch_size=1, init_lr=0.01,
        frames=8, min_frames=10, crop_size_override=32,
        max_epochs=2, train_phases_per_val=1, num_workers=2,
        ckpt_every=100, max_val_batches=1,
        pad_t_multiple=4, pad_label_multiple=8, resume=False,
        compute_dtype="float32", multigrid=True,
        multigrid_epochs_per_phase=1,
        mesh_devices=2, num_steps_per_update=2,
    )
    results = fine_driver.run(cfg)
    phases = results["multigrid_phases"]
    assert len(phases) >= 2, phases
    # phase batches (8 then 4, both mesh-divisible) with accum=2: phase 0
    # has 18//8=2 micro-batches -> 1 update; phase 1 has 4 -> 2 updates
    assert (phases[0][3], phases[1][3]) == (8, 4)
    assert (phases[0][4], phases[1][4]) == (8, 4)  # bn_splits transitioned
    assert "val_map" in results and np.isfinite(results["val_map"])

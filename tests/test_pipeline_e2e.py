"""End-to-end pipeline test on synthetic mini-Charades: train the fine stream
a few steps, extract the fine-feature cache, train the coarse stream a few
steps, and emit the localisation CSV — the reference's full three-script
workflow (SURVEY.md §1 dataflow) at toy scale."""

import csv
import os

import numpy as np
import pytest

from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades
from coarse_fine_networks_tpu.train import (
    coarse_driver,
    extract_driver,
    fine_driver,
)
from coarse_fine_networks_tpu.train.config import DriverConfig


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    anno = generate_mini_charades(str(root), num_videos=4, num_frames=40,
                                  hw=48, num_classes=157)
    return str(root), anno


def _cfg(root, anno, **kw):
    base = dict(
        anno=anno, root=os.path.join(root, "frames"),
        save_dir=os.path.join(root, "models"),
        batch_size=2, val_batch_size=1, init_lr=0.01,
        frames=8, min_frames=10, crop_size_override=32,
        max_epochs=2, train_phases_per_val=1, num_workers=2,
        ckpt_every=1, max_steps=2, max_val_batches=2,
        pad_t_multiple=4, pad_label_multiple=8, resume=False,
        compute_dtype="float32",
    )
    base.update(kw)
    return DriverConfig(**base)


@pytest.mark.slow
def test_full_pipeline(mini):
    root, anno = mini

    # 1. fine training: a couple of steps + val, checkpoint lands
    cfg = _cfg(root, anno)
    results = fine_driver.run(cfg)
    assert np.isfinite(results["val_loss"])
    ckpts = os.listdir(cfg.save_dir)
    assert any(c.startswith("fine_charades") for c in ckpts), ckpts
    fine_ckpt = os.path.join(
        cfg.save_dir, sorted(c for c in ckpts if c.startswith("fine"))[-1]
    )

    # 2. feature extraction from the trained checkpoint
    feat_dir = os.path.join(root, "fine_feats")
    ecfg = _cfg(root, anno, frames=8)
    n = extract_driver.run(ecfg, feat_dir, fine_ckpt)
    assert n == 4  # both splits
    l1 = [f for f in os.listdir(os.path.join(feat_dir, "layer1"))]
    assert len(l1) == 4
    arr = np.load(os.path.join(feat_dir, "layer1", l1[0]))
    assert arr.shape[1:] == (7, 7, 24)
    assert np.isfinite(arr).all()

    # 3. coarse training on the cache + localisation CSV
    csv_path = os.path.join(root, "localize.csv")
    ccfg = _cfg(root, anno, fine_feat_dir=feat_dir, align_corners=False,
                fusion_lr_mult=10.0, localize_csv=csv_path,
                train_phases_per_val=1)
    cres = coarse_driver.run(ccfg)
    assert "val_map" in cres and np.isfinite(cres["val_map"])
    rows = list(csv.reader(open(csv_path)))
    assert rows and len(rows[0]) == 3
    assert len(rows[0][2].split(" ")) == 157

    # coarse checkpoint landed too
    assert any(c.startswith("coarse_fineFEAT") for c in os.listdir(cfg.save_dir))


@pytest.mark.slow
def test_fine_driver_resume(mini):
    root, anno = mini
    cfg = _cfg(root, anno, resume=True, max_steps=2,
               save_dir=os.path.join(root, "models_resume"))
    fine_driver.run(cfg)
    cfg2 = _cfg(root, anno, resume=True, max_steps=4,
                save_dir=os.path.join(root, "models_resume"))
    res = fine_driver.run(cfg2)  # resumes from step-2 checkpoint
    assert res is not None


@pytest.mark.slow
def test_coarse_driver_multicrop_eval(mini):
    """crops=2 validation: interleaved crop clips, per-crop Gaussian offsets,
    max-reduced probabilities."""
    root, anno = mini
    feat_dir = os.path.join(root, "fine_feats")
    if not os.path.isdir(feat_dir):
        ecfg = _cfg(root, anno, frames=8)
        extract_driver.run(ecfg, feat_dir, None)
    ccfg = _cfg(root, anno, fine_feat_dir=feat_dir, align_corners=False,
                crops=2, max_steps=None, max_epochs=1,
                save_dir=os.path.join(root, "models_mc"))
    res = coarse_driver.run(ccfg)
    assert "val_map" in res and np.isfinite(res["val_map"])


@pytest.mark.slow
def test_fine_driver_multicrop_eval(mini):
    root, anno = mini
    cfg = _cfg(root, anno, crops=2, max_steps=None, max_epochs=1,
               save_dir=os.path.join(root, "models_fine_mc"))
    res = fine_driver.run(cfg)
    assert "val_map" in res and np.isfinite(res["val_map"])


@pytest.mark.slow
def test_no_recompiles_across_val_phases(mini):
    """The chunked-eval jit is hoisted out of the val phase: a second
    validation over the same (bucketed) shapes must not compile anything new
    (the per-val-phase rebuild used to discard the compile cache every
    epoch).  Counts compiled programs via jit_cache_size (exposed in
    results['val_jit_shapes'])."""
    root, anno = mini
    feat_dir = os.path.join(root, "fine_feats")
    if not os.path.isdir(feat_dir):
        extract_driver.run(_cfg(root, anno, frames=8), feat_dir, None)
    ccfg = _cfg(root, anno, fine_feat_dir=feat_dir, align_corners=False,
                max_steps=None, max_epochs=2, train_phases_per_val=1,
                t_lim_inference=4,
                save_dir=os.path.join(root, "models_novalrecompile"))
    res = coarse_driver.run(ccfg)
    shapes = res["val_jit_shapes"]
    assert len(shapes) == 2, shapes
    if shapes[0][0] >= 0:  # runtime exposes cache sizes
        assert shapes[1] == shapes[0], (
            f"val-phase recompiles: {shapes[0]} -> {shapes[1]}")


@pytest.mark.slow
def test_coarse_driver_chunked_long_video_eval(mini):
    """Force the 1000-frame-window chunked inference path
    (train_coarse_fineFEAT.py:215-224) with a tiny window."""
    root, anno = mini
    feat_dir = os.path.join(root, "fine_feats")
    if not os.path.isdir(feat_dir):
        extract_driver.run(_cfg(root, anno, frames=8), feat_dir, None)
    ccfg = _cfg(root, anno, fine_feat_dir=feat_dir, align_corners=False,
                max_steps=None, max_epochs=1, t_lim_inference=4,
                save_dir=os.path.join(root, "models_chunk"))
    res = coarse_driver.run(ccfg)
    assert "val_map" in res and np.isfinite(res["val_map"])


@pytest.mark.tpu
def test_coarse_driver_stem_s2d_input(mini):
    """DriverConfig.stem_s2d_input: the coarse driver trains and validates
    with pre-s2d clips in the stem conv's preferred layout
    (device_normalize_s2d -> CoarseNet(stem_s2d_input=True)) — the
    single-device TPU fast path the bench runs.  Loss parity with the
    default input path on the same data/seed."""
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("needs the real TPU backend (CFN_TEST_TPU=1)")
    root, anno = mini
    feat_dir = os.path.join(root, "fine_feats_s2d")
    fine_driver.run(_cfg(root, anno, save_dir=os.path.join(root, "m_s2d")))
    ck = sorted(os.listdir(os.path.join(root, "m_s2d")))
    extract_driver.run(
        _cfg(root, anno, save_dir=os.path.join(root, "m_s2d")), feat_dir,
        os.path.join(root, "m_s2d",
                     [c for c in ck if c.startswith("fine")][-1]))
    losses = {}
    for s2d in (False, True):
        cfg = _cfg(root, anno, save_dir=os.path.join(root, f"m_s2d{s2d}"),
                   fine_feat_dir=feat_dir, align_corners=False,
                   stem_s2d_input=s2d, record_trajectory=True)
        res = coarse_driver.run(cfg)
        losses[s2d] = [l for _, _, l in res["trajectory"]]
    assert len(losses[True]) == len(losses[False])
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-2)

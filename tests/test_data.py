"""Data-pipeline tests: rasteriser semantics, synthetic mini-Charades
end-to-end sampling/collate, prefetch loader, device normalisation."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from coarse_fine_networks_tpu.data import (
    CharadesDataset,
    Compose,
    CenterCropScaled,
    MultiScaleRandomCropMultigrid,
    PrefetchLoader,
    RandomHorizontalFlip,
    collate_clips,
    collate_coarse,
    device_normalize,
    make_dataset,
)
from coarse_fine_networks_tpu.data.annotations import rasterize_annotations
from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades

REF_DIR = os.environ.get("REFERENCE_DIR", "/root/reference")


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_charades")
    anno = generate_mini_charades(str(root), num_videos=4, num_frames=48, hw=64)
    return str(root), anno


def test_rasterizer_matches_reference_loop():
    """Vectorised rasteriser == the reference's per-frame Python loop
    (charades_fine.py:110-117)."""
    rng = np.random.RandomState(0)
    nf, nc, dur = 37, 9, 5.3
    actions = [[int(rng.randint(nc)), float(rng.uniform(0, 4)),
                float(rng.uniform(1, 5.3))] for _ in range(6)]
    got = rasterize_annotations(actions, dur, nf, nc)
    ref = np.zeros((nc, nf), np.float32)
    fps = nf / dur
    for ann in actions:
        for fr in range(nf):
            if fr / fps > ann[1] and fr / fps < ann[2]:
                ref[ann[0], fr] = 1
    np.testing.assert_array_equal(got.T, ref)


def test_make_dataset_and_cache(mini):
    root, anno = mini
    frames_dir = os.path.join(root, "frames")
    entries = make_dataset(anno, "training", frames_dir, min_frames=10)
    assert len(entries) == 2
    vid, label, dur, nf = entries[0]
    assert nf == 48 and label.shape == (48, 157)
    # cached round-trip
    again = make_dataset(anno, "training", frames_dir, min_frames=10)
    assert len(again) == len(entries)
    np.testing.assert_array_equal(np.asarray(again[0][1]), label)


def _train_transform(size=32):
    return Compose([
        MultiScaleRandomCropMultigrid([size / 40.0, size / 50.0], size),
        RandomHorizontalFlip(deferred=True),
    ])


def test_dataset_train_sampling(mini):
    root, anno = mini
    ds = CharadesDataset(
        anno, "training", os.path.join(root, "frames"),
        spatial_transform=_train_transform(), task="loc",
        frames=8, gamma_tau=1, min_frames=10, crop_size=32,
    )
    s = ds[0]
    assert s["clips"].shape == (1, 8, 32, 32, 3)  # frames*2 / (gamma_tau*2)
    assert s["clips"].dtype == np.uint8
    assert s["label"].shape == (16, 157)
    assert s["meta"].tolist()[0] >= 0


def test_dataset_test_whole_video_and_crops(mini):
    root, anno = mini
    ds = CharadesDataset(
        anno, "testing", os.path.join(root, "frames"),
        spatial_transform=Compose([CenterCropScaled(32)]), task="loc",
        frames=8, gamma_tau=2, crops=2, min_frames=10,
    )
    s = ds[0]
    # stride = gamma_tau*2 // crops = 2; whole video 48 frames → 24 loaded,
    # interleave 2 crops → T = 48 // 4 = 12 each
    assert s["clips"].shape == (2, 12, 32, 32, 3)
    assert s["label"].shape[0] == 12 * 4


def test_collate_pads_and_masks(mini):
    root, anno = mini
    ds = CharadesDataset(
        anno, "training", os.path.join(root, "frames"),
        spatial_transform=_train_transform(), task="loc",
        frames=8, gamma_tau=1, min_frames=10, crop_size=32,
    )
    batch = collate_clips([ds[0], ds[1]], pad_t_multiple=4,
                          pad_label_multiple=8)
    assert batch["clips"].shape[0] == 2
    assert batch["clips"].shape[2] % 4 == 0
    assert batch["labels"].shape[1] % 8 == 0
    assert batch["masks"].sum() > 0


def test_collate_coarse_caps_features(mini):
    root, anno = mini
    sample = {
        "clips": np.zeros((1, 4, 8, 8, 3), np.uint8),
        "label": np.zeros((8, 157), np.float32),
        "vid": "x", "meta": np.zeros(4, np.int32), "dur": 1.0, "flip": False,
        "feats": {"layer1": np.zeros((200, 7, 7, 24), np.float32)},
    }
    batch = collate_coarse([sample], feat_cap=128)
    assert batch["feats"]["layer1"].shape[1] == 128
    assert batch["feat_mask"].shape == (1, 128)
    assert batch["feat_mask"].sum() == 128


def test_prefetch_loader_order_and_coverage(mini):
    root, anno = mini
    ds = CharadesDataset(
        anno, "testing", os.path.join(root, "frames"),
        spatial_transform=Compose([CenterCropScaled(32)]), task="loc",
        frames=8, gamma_tau=2, min_frames=10,
    )
    loader = PrefetchLoader(ds, batch_size=1, collate_fn=collate_clips,
                            num_workers=2)
    vids = [b["vids"][0] for b in loader]
    assert sorted(vids) == sorted(d[0] for d in ds.data)


def test_device_normalize_matches_host():
    rng = np.random.RandomState(0)
    clips = rng.randint(0, 255, (2, 3, 8, 8, 3)).astype(np.uint8)
    flip = np.asarray([True, False])
    mean, std = (0.4, 0.3, 0.2), (0.1, 0.2, 0.3)
    out = np.asarray(device_normalize(jnp.asarray(clips), flip, mean, std))
    ref = (clips.astype(np.float32) / 255.0 - np.asarray(mean)) / np.asarray(std)
    ref[0] = ref[0][:, :, ::-1]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_DIR), reason="no reference")
def test_center_crop_scaled_matches_reference():
    from PIL import Image

    if REF_DIR not in sys.path:
        sys.path.insert(0, REF_DIR)
    from transforms import spatial_transforms as ref_st

    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (60, 80, 3)).astype(np.uint8))
    ref = ref_st.CenterCropScaled(32)(img)
    got = CenterCropScaled(32)(img)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bucketing_bounds_shape_count(mini):
    """Temporal bucketing pads batch shapes to multiples so jit sees a small,
    bounded set of shapes (SURVEY.md §7 hard part #3)."""
    root, anno = mini
    ds = CharadesDataset(
        anno, "training", os.path.join(root, "frames"),
        spatial_transform=_train_transform(), task="loc",
        frames=8, gamma_tau=1, min_frames=10, crop_size=32,
    )
    shapes = set()
    for _ in range(6):
        b = collate_clips([ds[0], ds[1]], pad_t_multiple=8,
                          pad_label_multiple=16)
        shapes.add((b["clips"].shape, b["labels"].shape))
    assert len(shapes) == 1  # all batches land in the same bucket
    t = b["clips"].shape[2]
    assert t % 8 == 0 and b["labels"].shape[1] % 16 == 0


def test_bucketed_collate_bounds_shapes():
    """Geometric padding buckets + length-sorted order: mixed-length videos
    produce O(log T) distinct padded shapes (VERDICT #4)."""
    from coarse_fine_networks_tpu.data.dataset import collate_clips
    from coarse_fine_networks_tpu.data.loader import PrefetchLoader

    rng = np.random.RandomState(0)
    lengths = rng.randint(17, 400, size=40).tolist()

    class FakeDS:
        def __len__(self):
            return len(lengths)

        def num_frames(self, i):
            return lengths[i]

        def __getitem__(self, i):
            t = lengths[i]
            return {
                "clips": np.zeros((1, t, 8, 8, 3), np.uint8),
                "label": np.zeros((t * 2, 5), np.float32),
                "vid": f"v{i}", "meta": np.zeros(4, np.int32),
                "dur": 1.0, "flip": False,
            }

    ds = FakeDS()
    loader = PrefetchLoader(
        ds, 4, lambda b: collate_clips(b, 16, 64, bucket=True),
        shuffle=False, num_workers=2, sort_key=ds.num_frames)
    shapes = set()
    seen_max = 0
    for batch in loader:
        shapes.add((batch["clips"].shape[2], batch["labels"].shape[1]))
        # length-sorted: batch maxima are non-decreasing
        assert batch["clips"].shape[2] >= seen_max
        seen_max = batch["clips"].shape[2]
    # buckets are 16*2^k up to 512: at most 6 clip shapes; unbucketed
    # pad-to-16 would give up to 24
    assert len(shapes) <= 6, shapes
    for t_pad, l_pad in shapes:
        assert t_pad in (16, 32, 64, 128, 256, 512)
        assert l_pad in (64, 128, 256, 512, 1024)


def test_bucketed_coarse_collate_feats():
    from coarse_fine_networks_tpu.data.dataset import collate_coarse

    def sample(t, tf):
        return {
            "clips": np.zeros((1, t, 8, 8, 3), np.uint8),
            "label": np.zeros((t, 5), np.float32),
            "vid": "v", "meta": np.zeros(4, np.int32), "dur": 1.0,
            "flip": False,
            "feats": {"layer1": np.zeros((tf, 7, 7, 4), np.float32)},
        }

    out = collate_coarse([sample(20, 21), sample(33, 40)], feat_cap=128,
                         pad_t_multiple=16, pad_label_multiple=16,
                         bucket=True)
    assert out["clips"].shape[2] == 64        # bucket_up(33, 16)
    assert out["feats"]["layer1"].shape[1] == 64  # bucket_up(40, 16)
    assert out["feat_mask"].shape[1] == 64
    # cap still enforced
    out2 = collate_coarse([sample(20, 300)], feat_cap=128,
                          pad_t_multiple=16, pad_label_multiple=16,
                          bucket=True)
    assert out2["feats"]["layer1"].shape[1] == 128


def test_loader_mid_epoch_checkpoint_resume():
    """Deterministic global shuffle + input-pipeline position checkpointing:
    a loader resumed from ``state_dict`` replays exactly the batches an
    uninterrupted loader would have produced — mid-epoch and across the
    epoch boundary (preemption recovery restores *data* position, not just
    model state)."""
    from coarse_fine_networks_tpu.data.loader import PrefetchLoader

    data = list(range(37))
    collate = lambda xs: xs  # noqa: E731

    def run_epochs(loader, n_batches):
        out = []
        while len(out) < n_batches:
            for b in loader:
                out.append(b)
                if len(out) == n_batches:
                    break
        return out

    full = PrefetchLoader(data, 4, collate, shuffle=True, num_workers=2,
                          seed=11, drop_last=True)
    reference = run_epochs(full, 20)  # 9 batches/epoch -> spans 3 epochs

    # interrupted run: consume 5 batches, checkpoint, resume in a NEW loader
    first = PrefetchLoader(data, 4, collate, shuffle=True, num_workers=2,
                           seed=11, drop_last=True)
    got = run_epochs(first, 5)
    sd = first.state_dict()
    assert sd == {"epoch": 0, "pos": 5}

    resumed = PrefetchLoader(data, 4, collate, shuffle=True, num_workers=2,
                             seed=11, drop_last=True)
    resumed.load_state_dict(sd)
    got += run_epochs(resumed, 15)
    assert got == reference

    # checkpoint exactly at an epoch boundary resumes into the next epoch
    b2 = PrefetchLoader(data, 4, collate, shuffle=True, num_workers=2,
                        seed=11, drop_last=True)
    run_epochs(b2, 9)
    sd2 = b2.state_dict()
    assert sd2 == {"epoch": 0, "pos": 9}
    r2 = PrefetchLoader(data, 4, collate, shuffle=True, num_workers=2,
                        seed=11, drop_last=True)
    r2.load_state_dict(sd2)
    assert run_epochs(r2, 9) == reference[9:18]

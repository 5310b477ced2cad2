"""Native C++ data-plane tests: threaded JPEG decode parity with PIL, and the
packed-video container round trip.  Skipped when the toolchain/library is
unavailable."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from coarse_fine_networks_tpu.data import native
from coarse_fine_networks_tpu.data.synthetic import generate_mini_charades
from coarse_fine_networks_tpu.data.transforms import CenterCropScaled

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture(autouse=True)
def exact_decode():
    """PIL-parity assertions run against the exact full-decode path; the
    DCT-scaled fast path (approximate by design) has its own tests below,
    which re-enable it explicitly.  Mini-charades frames are random noise —
    the worst case for any resample-chain difference — so parity tolerances
    only make sense in exact mode."""
    prev = native.set_fast_decode(False)
    yield
    native.set_fast_decode(prev)


@pytest.fixture(scope="module")
def frames(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_data")
    generate_mini_charades(str(root), num_videos=1, num_frames=8, hw=50)
    vid_dir = glob.glob(os.path.join(str(root), "frames", "*"))[0]
    return sorted(glob.glob(os.path.join(vid_dir, "*.jpg")))


def test_decode_batch_matches_pil(frames):
    out = native.decode_batch(frames, out_size=32, num_threads=2)
    assert out.shape == (len(frames), 32, 32, 3)
    ref_t = CenterCropScaled(32)
    for i, p in enumerate(frames):
        ref = np.asarray(ref_t(Image.open(p).convert("RGB")))
        # decode is exact; our C++ bilinear uses half-pixel sampling while PIL
        # uses an antialiased triangle filter — allow small deviation
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.mean() < 12, diff.mean()


def test_pack_roundtrip(frames, tmp_path):
    pack = str(tmp_path / "vid.cfnpack")
    native.pack_video(frames, pack)
    assert native.pack_num_frames(pack) == len(frames)
    got = native.decode_packed(pack, [0, 3, 7], out_size=32)
    direct = native.decode_batch([frames[0], frames[3], frames[7]], 32)
    np.testing.assert_array_equal(got, direct)


def test_decode_batch_reports_missing(frames, tmp_path):
    bad = str(tmp_path / "missing.jpg")
    with pytest.raises(IOError):
        native.decode_batch([frames[0], bad], out_size=16)


def test_dataset_native_fast_path(tmp_path):
    """CenterCropScaled val sampling via the C++ decoder matches the PIL path
    closely (resize filters differ slightly)."""
    from coarse_fine_networks_tpu.data import (
        CharadesDataset,
        CenterCropScaled,
        Compose,
    )

    anno = generate_mini_charades(str(tmp_path), num_videos=2, num_frames=24,
                                  hw=40)
    kwargs = dict(task="loc", frames=4, gamma_tau=1, min_frames=5)
    tform = Compose([CenterCropScaled(32)])
    ds_pil = CharadesDataset(anno, "testing", os.path.join(str(tmp_path), "frames"),
                             spatial_transform=tform, decode_backend="pil",
                             **kwargs)
    ds_nat = CharadesDataset(anno, "testing", os.path.join(str(tmp_path), "frames"),
                             spatial_transform=tform, decode_backend="native",
                             **kwargs)
    a = ds_pil[0]
    b = ds_nat[0]
    assert a["clips"].shape == b["clips"].shape
    diff = np.abs(a["clips"].astype(int) - b["clips"].astype(int))
    assert diff.mean() < 12
    np.testing.assert_array_equal(a["label"], b["label"])


def test_decode_random_crop_matches_pil(frames):
    """Train-path random crop: same box as MultiScaleRandomCropMultigrid,
    bilinear resize within tolerance of PIL."""
    from coarse_fine_networks_tpu.data.transforms import (
        MultiScaleRandomCropMultigrid,
    )

    scale, tl_x, tl_y, size = 0.84089642, 0.3, 0.7, 32
    out = native.decode_batch_random_crop(frames, size, scale, tl_x, tl_y,
                                          num_threads=2)
    assert out.shape == (len(frames), size, size, 3)
    t = MultiScaleRandomCropMultigrid([scale], size)
    t.scale, t.tl_x, t.tl_y, t.size = scale, tl_x, tl_y, size
    for i, p in enumerate(frames):
        ref = np.asarray(t(Image.open(p).convert("RGB")))
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        assert diff.mean() < 12, diff.mean()


def test_decode_packed_random_crop(frames, tmp_path):
    pack = str(tmp_path / "vid.cfnpack")
    native.pack_video(frames, pack)
    got = native.decode_packed_random_crop(pack, [1, 4], 24, 0.9, 0.2, 0.4)
    direct = native.decode_batch_random_crop([frames[1], frames[4]], 24,
                                             0.9, 0.2, 0.4)
    np.testing.assert_array_equal(got, direct)


def test_dataset_pack_dir_matches_jpeg_path(tmp_path):
    """CharadesDataset(pack_dir=...) yields byte-identical samples to the
    per-frame-JPEG native path (same seed -> same crop windows), for both
    the train random-crop and the val center-crop pipelines, and falls back
    to JPEGs for unpacked videos."""
    from coarse_fine_networks_tpu.data import (
        CharadesDataset,
        CenterCropScaled,
        Compose,
        MultiScaleRandomCropMultigrid,
        RandomHorizontalFlip,
    )

    anno = generate_mini_charades(str(tmp_path), num_videos=3, num_frames=24,
                                  hw=40)
    frames_root = os.path.join(str(tmp_path), "frames")
    pack_dir = os.path.join(str(tmp_path), "packs")
    vids = sorted(os.listdir(frames_root))
    # pack all but the last video: exercises the per-video JPEG fallback
    n = native.pack_directory(frames_root, pack_dir, vids=vids[:-1])
    assert n == len(vids) - 1

    kwargs = dict(task="loc", frames=4, gamma_tau=1, min_frames=5)
    train_t = lambda: Compose([  # noqa: E731
        MultiScaleRandomCropMultigrid([1.0, 0.875], 32),
        RandomHorizontalFlip(deferred=True),
    ])
    for split, tf in (("training", train_t()), ("testing",
                                                Compose([CenterCropScaled(32)]))):
        a = CharadesDataset(anno, split, frames_root, spatial_transform=tf,
                            decode_backend="native", seed=7, **kwargs)
        tf2 = train_t() if split == "training" else Compose(
            [CenterCropScaled(32)])
        b = CharadesDataset(anno, split, frames_root, spatial_transform=tf2,
                            decode_backend="native", pack_dir=pack_dir,
                            seed=7, **kwargs)
        import random as _random

        for i in range(len(a)):
            # transforms draw crop params from the global `random` module;
            # pin it so both datasets see identical crop windows
            _random.seed(1000 + i)
            sa = a[i]
            # decode outputs are bufpool views — copy before the next decode
            sa_clips = np.array(sa["clips"])
            _random.seed(1000 + i)
            sb = b[i]
            np.testing.assert_array_equal(sa_clips, sb["clips"])
            np.testing.assert_array_equal(sa["label"], sb["label"])
            assert sa["flip"] == sb["flip"]


def test_dataset_native_train_path(tmp_path):
    """Training sampling via the C++ random-crop decoder: same RNG protocol
    (crop window + flip decision identical to the PIL path under the same
    seed), content within resize-filter tolerance."""
    from coarse_fine_networks_tpu.data import (
        CharadesDataset,
        Compose,
        MultiScaleRandomCropMultigrid,
        RandomHorizontalFlip,
    )

    anno = generate_mini_charades(str(tmp_path), num_videos=2, num_frames=24,
                                  hw=40)
    kwargs = dict(task="loc", frames=4, gamma_tau=1, min_frames=5,
                  crop_size=32)
    root = os.path.join(str(tmp_path), "frames")

    def make(backend):
        import random as _random

        _random.seed(5)
        tform = Compose([
            MultiScaleRandomCropMultigrid([1.0, 0.875, 0.75], 32),
            RandomHorizontalFlip(deferred=True),
        ])
        ds = CharadesDataset(anno, "training", root, spatial_transform=tform,
                             decode_backend=backend, seed=11, **kwargs)
        return ds[0]

    a = make("pil")
    b = make("native")
    assert b["clips"].shape == a["clips"].shape
    assert a["clips"].shape[-3:] == (32, 32, 3)
    assert a["flip"] == b["flip"]
    np.testing.assert_array_equal(a["label"], b["label"])
    diff = np.abs(a["clips"].astype(int) - b["clips"].astype(int))
    assert diff.mean() < 12, diff.mean()


def _smooth_jpeg(tmp_path, w=640, h=480, name="smooth.jpg"):
    """A natural-image-like (low-frequency) test frame: gradients + slow
    sinusoids.  Noise frames maximally amplify resample-chain differences;
    the fast path's quality contract is about real video frames."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([
        127 + 90 * np.sin(xx / 97.0) * np.cos(yy / 71.0),
        127 + 110 * (xx / w - 0.5),
        127 + 110 * (yy / h - 0.5),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    p = str(tmp_path / name)
    Image.fromarray(img).save(p, quality=90)
    return p


def test_fast_decode_close_to_exact_on_smooth_image(tmp_path):
    """DCT-scaled partial decode vs exact full decode on a smooth frame:
    the approximation the fast path trades for ~3-5x less IDCT work stays
    small where it matters (real frames, not noise)."""
    p = _smooth_jpeg(tmp_path)
    args = ([p], 224, 0.7, 0.31, 0.67)
    native.set_fast_decode(False)
    exact = native.decode_batch_random_crop(*args)
    native.set_fast_decode(True)
    fast = native.decode_batch_random_crop(*args)
    diff = np.abs(fast[0].astype(int) - exact[0].astype(int))
    assert diff.mean() < 3.0, diff.mean()

    # centre-crop-scaled val path too
    native.set_fast_decode(False)
    exact = native.decode_batch([p], 224)
    native.set_fast_decode(True)
    fast = native.decode_batch([p], 224)
    diff = np.abs(fast[0].astype(int) - exact[0].astype(int))
    assert diff.mean() < 3.0, diff.mean()


def test_fast_decode_unscaled_is_exact(frames):
    """When the crop already fits the output (no DCT scaling possible), the
    partial decode must be BITWISE identical to the full decode — column
    trim + scanline skip decode the same iMCU blocks."""
    native.set_fast_decode(False)
    exact = native.decode_batch_random_crop(frames, 64, 0.8, 0.4, 0.2)
    native.set_fast_decode(True)
    fast = native.decode_batch_random_crop(frames, 64, 0.8, 0.4, 0.2)
    np.testing.assert_array_equal(fast, exact)

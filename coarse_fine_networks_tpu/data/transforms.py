"""Spatial clip transforms (re-design of ``transforms/spatial_transforms.py``).

Same per-clip randomisation protocol as the reference
(``randomize_parameters()`` once per clip, then apply to every frame,
``charades_fine.py:170-173``), but:

* host side stays in PIL/uint8 only for decode + crop + resize — the cheap,
  unavoidable parts;
* ``ToTensor``-division, mean/std normalisation and horizontal flips run
  *batched on device* via :func:`device_normalize` (uint8 H2D transfer is 4×
  smaller than float32, and XLA fuses the arithmetic into the first conv).

The PIL-compatible classes (``ToArray``/``Normalize``) are kept for parity
testing and CPU-only use.
"""

from __future__ import annotations

import functools
import random
from typing import Optional, Sequence

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

CHARADES_MEAN = (0.413, 0.368, 0.338)  # train_fine.py:48-49
CHARADES_STD = (0.131, 0.125, 0.132)


class Compose:
    """transforms/spatial_transforms.py:18-34."""

    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img

    def randomize_parameters(self, c_size=0, index=0):
        for t in self.transforms:
            t.randomize_parameters(c_size, index)


class _Static:
    def randomize_parameters(self, c_size=0, index=0):
        pass


class ToArray(_Static):
    """PIL → float32 HWC in [0, 1] (ToTensor ÷ norm_value,
    spatial_transforms.py:37-90 — but channels-last for TPU)."""

    def __init__(self, norm_value: float = 255.0):
        self.norm_value = norm_value

    def __call__(self, img):
        a = np.asarray(img, dtype=np.float32)
        if a.ndim == 2:
            a = a[:, :, None]
        return a / self.norm_value


class Normalize(_Static):
    """(x - mean) / std per channel (spatial_transforms.py:93-121)."""

    def __init__(self, mean: Sequence[float], std: Sequence[float]):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        return (arr - self.mean) / self.std


class Scale(_Static):
    """Resize so the smaller edge matches ``size``
    (spatial_transforms.py:124-166)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = size
        self.interpolation = interpolation

    def __call__(self, img):
        if isinstance(self.size, int):
            w, h = img.size
            if (w <= h and w == self.size) or (h <= w and h == self.size):
                return img
            if w < h:
                return img.resize(
                    (self.size, int(self.size * h / w)), self.interpolation
                )
            return img.resize(
                (int(self.size * w / h), self.size), self.interpolation
            )
        return img.resize(tuple(self.size), self.interpolation)


class CenterCrop(_Static):
    """spatial_transforms.py:169-197."""

    def __init__(self, size):
        self.size = (int(size), int(size)) if np.isscalar(size) else size

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
        x1 = int(round((w - tw) / 2.0))
        y1 = int(round((h - th) / 2.0))
        return img.crop((x1, y1, x1 + tw, y1 + th))


class CenterCropScaled(_Static):
    """Min-side centre crop then resize (spatial_transforms.py:201-233) —
    the val/extract pipeline (``train_fine.py:78-80``)."""

    def __init__(self, size, interpolation=Image.BILINEAR):
        self.size = (int(size), int(size)) if np.isscalar(size) else size
        self.interpolation = interpolation

    def __call__(self, img):
        crop = min(img.size)
        w, h = img.size
        x1 = int(round((w - crop) / 2.0))
        y1 = int(round((h - crop) / 2.0))
        img = img.crop((x1, y1, x1 + crop, y1 + crop))
        return img.resize(self.size, self.interpolation)




def _corner_box(position: str, width: int, height: int, crop: int):
    """Crop box (left, top, right, bottom) for a named corner/centre."""
    if position == "c":
        x1 = int(round((width - crop) / 2.0))
        y1 = int(round((height - crop) / 2.0))
    elif position == "tl":
        x1, y1 = 0, 0
    elif position == "tr":
        x1, y1 = width - crop, 0
    elif position == "bl":
        x1, y1 = 0, height - crop
    elif position == "br":
        x1, y1 = width - crop, height - crop
    else:
        raise ValueError(position)
    return (x1, y1, x1 + crop, y1 + crop)


class CornerCrop:
    """Index-driven 5-position crop (spatial_transforms.py:280-336)."""

    POSITIONS = ("c", "tl", "tr", "bl", "br")

    def __init__(self, size, crop_position: Optional[str] = None,
                 interpolation=Image.BILINEAR):
        self.size = size
        self.crop_position = crop_position
        self.interpolation = interpolation

    def __call__(self, img):
        w, h = img.size
        crop = min(w - 28, h - 28)
        img = img.crop(_corner_box(self.crop_position, w, h, crop))
        return img.resize((int(self.size), int(self.size)), self.interpolation)

    def randomize_parameters(self, c_size=0, index=0):
        self.crop_position = self.POSITIONS[index]


class RandomHorizontalFlip:
    """spatial_transforms.py:339-357.  Exposes ``.p`` so the device path can
    defer the actual flip to :func:`device_normalize`."""

    def __init__(self, deferred: bool = False):
        self.p = 1.0
        self.deferred = deferred

    def __call__(self, img):
        if self.p < 0.5 and not self.deferred:
            if isinstance(img, np.ndarray):
                return np.ascontiguousarray(img[:, ::-1])
            return img.transpose(Image.FLIP_LEFT_RIGHT)
        return img

    @property
    def flipped(self) -> bool:
        return self.p < 0.5

    def randomize_parameters(self, c_size=0, index=0):
        self.p = random.random()


class RandomVerticalFlip:
    """spatial_transforms.py:360-378."""

    def __init__(self):
        self.p = 1.0

    def __call__(self, img):
        if self.p < 0.5:
            if isinstance(img, np.ndarray):
                return np.ascontiguousarray(img[::-1])
            return img.transpose(Image.FLIP_TOP_BOTTOM)
        return img

    def randomize_parameters(self, c_size=0, index=0):
        self.p = random.random()


class MultiScaleCornerCrop:
    """spatial_transforms.py:381-447."""

    def __init__(self, scales, size, interpolation=Image.BILINEAR,
                 crop_positions=("c", "tl", "tr", "bl", "br")):
        self.scales = scales
        self.size = size
        self.interpolation = interpolation
        self.crop_positions = crop_positions
        self.scale = scales[0]
        self.crop_position = crop_positions[0]

    def __call__(self, img):
        crop = int(min(img.size) * self.scale)
        w, h = img.size
        if self.crop_position == "c":
            # reference uses a floor-division centre box here rather than the
            # rounded one (spatial_transforms.py:410-417)
            cx, cy, half = w // 2, h // 2, crop // 2
            box = (cx - half, cy - half, cx + half, cy + half)
        else:
            box = _corner_box(self.crop_position, w, h, crop)
        return img.crop(box).resize((self.size, self.size), self.interpolation)

    def randomize_parameters(self, c_size=0, index=0):
        self.scale = self.scales[random.randint(0, len(self.scales) - 1)]
        self.crop_position = self.crop_positions[
            random.randint(0, len(self.scales) - 1)
        ]


class MultiScaleRandomCrop:
    """spatial_transforms.py:450-477."""

    def __init__(self, scales, size, interpolation=Image.BILINEAR):
        self.scales = scales
        self.size = size
        self.interpolation = interpolation
        self.scale = scales[0]
        self.tl_x = 0.0
        self.tl_y = 0.0

    def __call__(self, img):
        crop = int(min(img.size) * self.scale)
        w, h = img.size
        x1 = int(self.tl_x * (w - crop))
        y1 = int(self.tl_y * (h - crop))
        img = img.crop((x1, y1, x1 + crop, y1 + crop))
        return img.resize((self.size, self.size), self.interpolation)

    def randomize_parameters(self, c_size=0, index=0):
        self.scale = self.scales[random.randint(0, len(self.scales) - 1)]
        self.tl_x = random.random()
        self.tl_y = random.random()


class MultiScaleRandomCropMultigrid(MultiScaleRandomCrop):
    """Random scale+position crop whose output size is set at randomise time —
    the multigrid hook (spatial_transforms.py:480-509); the train pipeline
    (``train_fine.py:74-77``)."""

    def __init__(self, scales, size, interpolation=Image.BILINEAR):
        super().__init__(scales, size, interpolation)
        self.init_size = size

    def randomize_parameters(self, c_size=0, index=0):
        self.size = c_size if c_size else self.init_size
        self.scale = self.scales[random.randint(0, len(self.scales) - 1)]
        self.tl_x = random.random()
        self.tl_y = random.random()


@functools.partial(jax.jit, static_argnums=(4,))
def _device_normalize(clips_u8, flip, mean, std, out_dtype):
    x = clips_u8.astype(jnp.float32) / 255.0
    x = ((x - mean) / std).astype(out_dtype)
    flipped = x[:, :, :, ::-1, :]
    return jnp.where(flip[:, None, None, None, None], flipped, x)


# The layout the stem conv's TPU emitter wants for the pre-s2d input
# (HLO {4,0,3,2,1}: s2d channels in lanes, batch in sublanes).  Producing
# clips directly in this format outside the train step removes the
# relayout-copy chain XLA otherwise inserts inside the hot program
# (~4.5 ms/step at the bench shape — PERF.md round-4).
_S2D_MAJOR_TO_MINOR = (1, 2, 3, 0, 4)


@functools.lru_cache(maxsize=None)
def _s2d_input_format(device):
    from jax.experimental.layout import Format, Layout

    return Format(Layout(major_to_minor=_S2D_MAJOR_TO_MINOR),
                  jax.sharding.SingleDeviceSharding(device))


@functools.lru_cache(maxsize=None)
def _device_normalize_s2d_fn(out_dtype, out_sharding):
    from ..models.x3d_fold import s2d_pack

    def fn(clips_u8, flip, clip_mask, mean, std):
        x = clips_u8.astype(jnp.float32) / 255.0
        x = ((x - mean) / std).astype(out_dtype)
        flipped = x[:, :, :, ::-1, :]
        x = jnp.where(flip[:, None, None, None, None], flipped, x)
        x = x * clip_mask[:, :, None, None, None].astype(out_dtype)
        return s2d_pack(x)

    if out_sharding is not None:
        return jax.jit(fn, out_shardings=out_sharding)
    return jax.jit(fn)


def device_normalize_s2d(
    clips_u8: jax.Array,          # (B, T, H, W, 3) uint8
    flip: jax.Array,              # (B,) bool
    clip_mask: jax.Array,         # (B, T) — padded frames re-zeroed
    mean: Sequence[float] = CHARADES_MEAN,
    std: Sequence[float] = CHARADES_STD,
    out_dtype=jnp.float32,
    mesh=None,
) -> jax.Array:
    """:func:`device_normalize` fused with the 2x2 space-to-depth pack,
    emitted directly in the stem conv's preferred parameter layout — the
    producer half of the ``stem_s2d_input`` fast path (models/x3d_fold.py).
    Output: ``(B, T, H/2, W/2, 12)``.

    ``mesh``: emit the packed clips already batch-sharded over the mesh's
    ``data`` axis (the layout pin composes with the sharding), so the fast
    path survives data-parallel training — ``shard_batch`` then sees the
    target sharding and leaves the array alone (VERDICT r04 #7).

    ``CFN_S2D_PIN_LAYOUT=0`` disables the explicit stem-layout pin on the
    output (XLA then relays out inside the consumer program).

    The pin is BEST-EFFORT: executables restored from the persistent
    compilation cache on the tunneled TPU backend drop custom output
    layouts (measured, PERF.md round-5), so the emitted array may come back
    in the default layout.  That is purely a performance event — the train
    step then contains one ~3 ms relayout copy of the clips tensor —
    never a correctness one; callers must not assume the pinned layout.
    ``bench.py`` reports the actual layout as ``s2d_clips_layout``."""
    import os

    pin = (os.environ.get("CFN_S2D_PIN_LAYOUT", "1") == "1"
           and jax.default_backend() == "tpu")
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(mesh, PartitionSpec("data"))
        if pin:
            from jax.experimental.layout import Format, Layout

            sharding = Format(Layout(major_to_minor=_S2D_MAJOR_TO_MINOR),
                              sharding)
    elif pin:
        sharding = _s2d_input_format(jax.devices()[0])
    else:
        sharding = None
    return _device_normalize_s2d_fn(jnp.dtype(out_dtype), sharding)(
        clips_u8, jnp.asarray(flip), jnp.asarray(clip_mask),
        jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32))


def device_normalize(
    clips_u8: jax.Array,          # (B, T, H, W, 3) uint8
    flip: jax.Array,              # (B,) bool — per-clip horizontal flip
    mean: Sequence[float] = CHARADES_MEAN,
    std: Sequence[float] = CHARADES_STD,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Batched on-device ToTensor + Normalize + RandomHorizontalFlip.

    ``out_dtype=bfloat16`` feeds the trunk directly in its compute dtype —
    no separate convert pass over the biggest tensor in the model."""
    return _device_normalize(
        clips_u8, jnp.asarray(flip),
        jnp.asarray(mean, jnp.float32), jnp.asarray(std, jnp.float32),
        jnp.dtype(out_dtype),
    )

"""Data pipeline: Charades annotations, clip sampling, transforms, loaders.

Host side decodes JPEGs and crops/resizes to uint8; ToTensor-normalisation and
flips run batched on device (uint8 over PCIe/DMA is 4× cheaper than float32,
and the arithmetic fuses into the first conv's HLO).
"""

from .annotations import make_dataset, rasterize_annotations
from .dataset import CharadesDataset, collate_clips, collate_coarse
from .transforms import (
    Compose,
    ToArray,
    Normalize,
    Scale,
    CenterCrop,
    CenterCropScaled,
    CornerCrop,
    RandomHorizontalFlip,
    RandomVerticalFlip,
    MultiScaleCornerCrop,
    MultiScaleRandomCrop,
    MultiScaleRandomCropMultigrid,
    device_normalize,
)
from .device_prefetch import DevicePrefetcher, overlap_iter
from .loader import PrefetchLoader

__all__ = [
    "make_dataset",
    "rasterize_annotations",
    "CharadesDataset",
    "collate_clips",
    "collate_coarse",
    "Compose",
    "ToArray",
    "Normalize",
    "Scale",
    "CenterCrop",
    "CenterCropScaled",
    "CornerCrop",
    "RandomHorizontalFlip",
    "RandomVerticalFlip",
    "MultiScaleCornerCrop",
    "MultiScaleRandomCrop",
    "MultiScaleRandomCropMultigrid",
    "device_normalize",
    "DevicePrefetcher",
    "PrefetchLoader",
    "overlap_iter",
]

"""Flax model definitions: the shared X3D trunk, the Fine stream and the
Coarse stream with Grid Pool / Unpool and multi-stage fusion."""

from .layers import SubBatchNorm, SqueezeExcite, Swish, round_width
from .x3d import Bottleneck, X3DStage, X3DStem, X3DHead, get_inplanes, get_blocks
from .fine import FineNet
from .coarse import CoarseNet, GridPool, RewightLayer, MixingLayer
from .pipeline import CoarseFinePipeline

__all__ = [
    "SubBatchNorm",
    "SqueezeExcite",
    "Swish",
    "round_width",
    "Bottleneck",
    "X3DStage",
    "X3DStem",
    "X3DHead",
    "get_inplanes",
    "get_blocks",
    "FineNet",
    "CoarseNet",
    "CoarseFinePipeline",
    "GridPool",
    "RewightLayer",
    "MixingLayer",
]

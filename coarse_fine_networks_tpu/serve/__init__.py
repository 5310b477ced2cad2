"""Serving: a continuous-batching scheduler around the joint Coarse-Fine
inference pipeline.

The reference has no serving story at all — its inference surface is the
batch-1 validation loop inside ``train_coarse_fineFEAT.py:215-263``.  Here
whole-video requests are queued, bucketed by padded length, batched up to a
deadline and executed through one jitted program per bucket shape (the
static-shape discipline that keeps XLA recompiles bounded).
"""

from .feature_cache import CachingVideoServer, FeatureCache
from .http import InferenceHTTPServer
from .router import ModelRouter, UnknownModelError
from .scheduler import (
    InferenceRequest,
    ServerOverloadedError,
    VideoServer,
)

__all__ = ["CachingVideoServer", "FeatureCache", "InferenceHTTPServer",
           "InferenceRequest", "ModelRouter", "ServerOverloadedError",
           "UnknownModelError", "VideoServer"]

"""Metrics: streaming per-class average precision + Charades_v1_localize CSV."""

from .ap import APMeter
from .localize import LocalizeCSVWriter, subsample_25

__all__ = ["APMeter", "LocalizeCSVWriter", "subsample_25"]

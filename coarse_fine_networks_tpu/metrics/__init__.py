"""Metrics: streaming per-class average precision + Charades_v1_localize CSV."""

from .ap import APMeter
from .localize import LocalizeCSVWriter, subsample_25
from .charades_eval import evaluate_localization

__all__ = ["APMeter", "LocalizeCSVWriter", "subsample_25",
           "evaluate_localization"]

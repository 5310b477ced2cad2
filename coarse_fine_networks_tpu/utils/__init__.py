"""Utilities: structured logging, progress, debug flags."""

from .logging import get_logger, Progress

__all__ = ["get_logger", "Progress"]

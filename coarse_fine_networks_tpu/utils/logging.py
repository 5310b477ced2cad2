"""Structured logging + progress (replaces the reference's ``print`` +
``pkbar`` observability, ``train_fine.py:148-149``)."""

from __future__ import annotations

import logging
import sys
import time


def get_logger(name: str = "cfn_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s",
                              "%H:%M:%S")
        )
        logger.addHandler(h)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


class Progress:
    """Minimal rate-printing progress tracker."""

    def __init__(self, name: str, total: int, log_every: int = 50,
                 logger: logging.Logger | None = None):
        self.name = name
        self.total = total
        self.log_every = log_every
        self.logger = logger or get_logger()
        self.start = time.time()
        self.n = 0

    def update(self, n: int = 1) -> None:
        self.n += n
        if self.n % self.log_every == 0 or self.n == self.total:
            dt = time.time() - self.start
            rate = self.n / max(dt, 1e-9)
            self.logger.info(
                "%s %d/%d (%.2f it/s)", self.name, self.n, self.total, rate
            )

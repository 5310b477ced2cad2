"""Reusable numpy buffer rings for the host input pipeline.

The reference allocates fresh tensors for every decoded clip and every
collated batch (``charades_fine.py:201-224``).  At our shapes that is
~10 MB per clip and ~80 MB per batch of *brand-new* pages each step: glibc
returns >128 KB frees to the OS (``M_MMAP_THRESHOLD``), so every batch pays
the kernel page-fault path to fault the pages back in — measured at two
orders of magnitude below steady-state copy bandwidth on virtualised TPU
hosts (PERF.md "Host data plane").  Decode outputs and collate buffers are
therefore drawn from per-shape rings of pre-touched arrays that cycle
through a fixed number of slots.

Borrow contract: an array obtained from :func:`borrow` is valid until the
same (shape, dtype) key has been borrowed ``slots`` more times.  The train
drivers copy each batch to device (``jnp.asarray``) before requesting the
next one, and the loader keeps at most ``prefetch`` batches plus one clip
per worker in flight, so the defaults (8 slots for >32 MB buffers, 64
below) leave a wide margin.  Set ``CFN_POOL_SLOTS=0`` to disable pooling
(every borrow allocates fresh).
"""

from __future__ import annotations

import os
import threading
from typing import Dict, List, Tuple

import numpy as np

_LARGE_BYTES = 32 << 20

# ring-size floors, raised by the loader to cover its in-flight window:
# sample-size buffers (decode outputs) live per worker-held sample, batch
# buffers per queued batch
_MIN_SMALL = [0]
_MIN_LARGE = [0]
# extra slots reserved by downstream consumers that extend the in-flight
# window past the loader's own bound (the device-prefetch stage holds
# `depth` host batches alive while their H2D runs)
_EXTRA = [0]


def ensure_slots(small: int, large: int) -> None:
    """Raise the ring-size floors so every buffer in a consumer's in-flight
    window has its own slot (called by :class:`..data.loader.PrefetchLoader`
    with ``prefetch``/``num_workers``/``batch_size``-derived bounds)."""
    _MIN_SMALL[0] = max(_MIN_SMALL[0], int(small))
    _MIN_LARGE[0] = max(_MIN_LARGE[0], int(large))


def reserve_extra(n: int) -> None:
    """Downstream pipeline stages that keep borrowed batches alive beyond
    the loader's own window (e.g. :class:`..data.device_prefetch
    .DevicePrefetcher` with lookahead ``depth``) must reserve that many
    extra slots, or the rings can wrap and overwrite a live batch."""
    _EXTRA[0] = max(_EXTRA[0], int(n))


def _default_slots(nbytes: int) -> Tuple[int, int]:
    spec = os.environ.get("CFN_POOL_SLOTS")
    if spec is not None:
        n = int(spec)
        return (n, n)
    return (max(8, _MIN_LARGE[0]) + _EXTRA[0],
            max(64, _MIN_SMALL[0]) + _EXTRA[0])  # (large, small)


class ArrayRing:
    """Per-(shape, dtype) rings of reusable pre-touched numpy buffers."""

    def __init__(self):
        self._lock = threading.Lock()
        self._rings: Dict[Tuple, Tuple[List[np.ndarray], List[int]]] = {}

    def borrow(self, shape, dtype, zero: bool = False) -> np.ndarray:
        shape = tuple(int(s) for s in shape)
        dtype = np.dtype(dtype)
        nbytes = int(np.prod(shape)) * dtype.itemsize if shape else \
            dtype.itemsize
        large, small = _default_slots(nbytes)
        slots = large if nbytes >= _LARGE_BYTES else small
        if slots <= 0:
            return np.zeros(shape, dtype) if zero else np.empty(shape, dtype)
        key = (shape, dtype.str)
        with self._lock:
            bufs, cursor = self._rings.setdefault(key, ([], [0]))
            if len(bufs) < slots:
                buf = np.empty(shape, dtype)
                bufs.append(buf)
            else:
                buf = bufs[cursor[0] % len(bufs)]
                cursor[0] += 1
        if zero:
            buf.fill(0)
        return buf

    def clear(self) -> None:
        with self._lock:
            self._rings.clear()


_POOL = ArrayRing()


def borrow(shape, dtype, zero: bool = False) -> np.ndarray:
    """Borrow a reusable array from the process-wide pool (see module doc
    for the validity window)."""
    return _POOL.borrow(shape, dtype, zero=zero)


def clear() -> None:
    """Drop all pooled buffers (tests / memory pressure)."""
    _POOL.clear()

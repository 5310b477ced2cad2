"""Input/compute overlap: double-buffered device prefetch.

The reference overlaps input with compute via
``DataLoader(num_workers=8, pin_memory=True)`` + CUDA's async H2D
(``train_fine.py:84-85``).  The TPU-native equivalent: JAX dispatch is
already asynchronous, so the host thread is free while the step runs — but
the drivers were preparing batch N+1 (numpy assembly + H2D transfer + the
``device_normalize_s2d`` producer program) *between* step dispatches, in the
measuring thread.  :class:`DevicePrefetcher` moves that work into a
background thread that stays ``depth`` batches ahead, so the achieved step
time becomes ``max(decode, h2d + producer, device_step)`` instead of their
sum.

The background thread only touches JAX through ``put_fn`` (H2D transfers +
dispatching the producer program); transfers to distinct buffers don't
serialise against the running step program.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterable, Iterator, Tuple

_SENTINEL = object()


class DevicePrefetcher:
    """Wrap a host-batch iterable; yield ``put_fn(host_batch)`` results
    prepared ``depth`` batches ahead in a background thread.

    ``put_fn`` does the host→device work (``jnp.asarray`` / ``device_put`` /
    producer programs).  Exceptions in ``put_fn`` or the source iterator
    propagate to the consumer at the matching ``__next__``.
    """

    def __init__(self, source: Iterable, put_fn: Callable[[Any], Any],
                 depth: int = 2):
        from . import bufpool

        self._source = source
        self._put = put_fn
        self._depth = max(1, depth)
        # this stage keeps up to depth+1 host batches alive past the
        # loader's own in-flight window — reserve pool slots so the buffer
        # rings can't wrap onto a live batch
        bufpool.reserve_extra(self._depth + 1)

    def __iter__(self) -> Iterator:
        q: "queue.Queue" = queue.Queue(maxsize=self._depth)

        def producer():
            try:
                for hb in self._source:
                    q.put(("ok", self._put(hb)))
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(("err", e))
                return
            q.put(("end", _SENTINEL))

        t = threading.Thread(target=producer, daemon=True,
                             name="device-prefetch")
        t.start()
        while True:
            kind, item = q.get()
            if kind == "err":
                raise item
            if kind == "end":
                return
            yield item


def overlap_iter(source: Iterable, put_fn: Callable[[Any], Any],
                 depth: int = 2) -> Iterator[Tuple[Any, Any]]:
    """Like :class:`DevicePrefetcher` but yields ``(device_batch,
    host_batch)`` pairs — the shape the drivers' metric accumulation needs."""
    return iter(DevicePrefetcher(source, lambda hb: (put_fn(hb), hb), depth))

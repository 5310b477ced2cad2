"""Continuous-batching video inference server.

Requests carry whole videos of arbitrary length; the scheduler pads each to a
geometric length bucket (``multiple * 2^k`` — the same O(log T) static-shape
discipline as validation, :mod:`..data.dataset`), groups same-bucket requests
up to ``max_batch`` within a ``max_wait_ms`` deadline, and runs one jitted
program per (batch, bucket) shape.  Each request's result is sliced back to
its true frame count.

Replaces the reference's only inference surface — the batch-1 whole-video
val loop (``train_coarse_fineFEAT.py:215-263``) — with an actual serving
component.
"""

from __future__ import annotations

import collections
import dataclasses
import threading
import time
from concurrent.futures import Future
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _bucket_up(n: int, multiple: int) -> int:
    m = multiple
    while m < n:
        m *= 2
    return m


@dataclasses.dataclass
class InferenceRequest:
    clips: np.ndarray        # (T, H, W, 3) float32 — coarse-stream frames
    fine_clips: np.ndarray   # (T_f, H, W, 3) float32 — fine-stream frames
    meta: Optional[np.ndarray] = None   # (4,) int32; default whole video
    future: Future = dataclasses.field(default_factory=Future)
    enqueued_at: float = dataclasses.field(default_factory=time.monotonic)

    @property
    def label_len(self) -> int:
        return 4 * self.clips.shape[0]


class VideoServer:
    """Batching scheduler over a jittable whole-video apply function.

    Args:
      apply_fn: ``(clips, fine_clips, meta, label_len) -> probs`` — e.g.
        ``functools.partial(pipeline.apply, variables)``.  Called under jit
        with static ``label_len``.
      max_batch: upper bound on requests fused into one program call.
      max_wait_ms: how long the scheduler holds a non-full batch open for
        same-bucket stragglers.
      bucket_multiple: base of the geometric padding buckets.
    """

    def __init__(
        self,
        apply_fn: Callable,
        max_batch: int = 4,
        max_wait_ms: float = 5.0,
        bucket_multiple: int = 16,
    ):
        self._apply = apply_fn
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.bucket_multiple = bucket_multiple
        self._buckets: Dict[Tuple[int, int], collections.deque] = {}
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._jitted: Dict[int, Callable] = {}
        self.batches_run = 0
        self.batch_sizes: list = []

    # -- public API ----------------------------------------------------------

    def start(self) -> "VideoServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        self._wake.set()
        if self._thread is not None:
            self._thread.join(timeout=30)

    def submit(self, clips: np.ndarray, fine_clips: np.ndarray,
               meta: Optional[np.ndarray] = None) -> Future:
        """Queue one whole-video request; the Future resolves to per-frame
        class probabilities ``(4*T, n_classes)`` float32."""
        req = InferenceRequest(np.asarray(clips, np.float32),
                               np.asarray(fine_clips, np.float32),
                               None if meta is None
                               else np.asarray(meta, np.int32))
        key = self._bucket_key(req)
        with self._lock:
            self._buckets.setdefault(key, collections.deque()).append(req)
        self._wake.set()
        return req.future

    # -- internals -----------------------------------------------------------

    def _bucket_key(self, req: InferenceRequest) -> Tuple[int, int]:
        return (_bucket_up(req.clips.shape[0], self.bucket_multiple),
                _bucket_up(req.fine_clips.shape[0], self.bucket_multiple))

    def _take_batch(self):
        """Pick the bucket with the oldest head request; take up to
        max_batch requests from it."""
        with self._lock:
            best_key, best_age = None, None
            for key, dq in self._buckets.items():
                if dq and (best_age is None
                           or dq[0].enqueued_at < best_age):
                    best_key, best_age = key, dq[0].enqueued_at
            if best_key is None:
                return None, []
            dq = self._buckets[best_key]
            if (len(dq) < self.max_batch
                    and time.monotonic() - best_age < self.max_wait):
                return None, []   # hold the batch open for stragglers
            out = []
            while dq and len(out) < self.max_batch:
                out.append(dq.popleft())
            return best_key, out

    def _run_batch(self, key, reqs):
        t_pad, tf_pad = key
        b = len(reqs)
        h = reqs[0].clips.shape[1]
        clips = np.zeros((b, t_pad, h, h, 3), np.float32)
        fine = np.zeros((b, tf_pad, h, h, 3), np.float32)
        meta = np.zeros((b, 4), np.int32)
        for i, r in enumerate(reqs):
            clips[i, : r.clips.shape[0]] = r.clips
            fine[i, : r.fine_clips.shape[0]] = r.fine_clips
            t = r.clips.shape[0]
            meta[i] = (r.meta if r.meta is not None
                       else np.asarray([0, t, 2 * t, 1], np.int32))
        label_len = 4 * t_pad
        if label_len not in self._jitted:
            self._jitted[label_len] = jax.jit(
                lambda c, f, m: self._apply(c, f, m, label_len))
        probs = np.asarray(self._jitted[label_len](
            jnp.asarray(clips), jnp.asarray(fine), jnp.asarray(meta)))
        self.batches_run += 1
        self.batch_sizes.append(b)
        for i, r in enumerate(reqs):
            r.future.set_result(probs[i, : r.label_len])

    def _loop(self):
        while not self._stop.is_set():
            key, reqs = self._take_batch()
            if not reqs:
                self._wake.wait(timeout=self.max_wait / 2 or 0.002)
                self._wake.clear()
                continue
            try:
                self._run_batch(key, reqs)
            except Exception as e:  # surface errors to the callers
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

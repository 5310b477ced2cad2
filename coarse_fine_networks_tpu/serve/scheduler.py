"""Continuous-batching video inference server.

Requests carry whole videos of arbitrary length; the scheduler pads each to a
geometric length bucket (``multiple * 2^k`` — the same O(log T) static-shape
discipline as validation, :mod:`..data.dataset`), groups same-bucket requests
up to ``max_batch`` within a ``max_wait_ms`` deadline, and runs one jitted
program per (batch, bucket) shape.  Each request's result is sliced back to
its true frame count, and padded fine frames are masked out of the fusion
(``fine_mask`` → :class:`..models.CoarseFinePipeline`).

Hardening (production-serving semantics the reference has no equivalent of —
its only inference surface is the batch-1 whole-video val loop,
``train_coarse_fineFEAT.py:215-263``):

* **bounded queue / backpressure** — ``submit`` raises
  :class:`ServerOverloadedError` once ``max_queue`` requests are pending;
* **per-request timeout** — requests older than ``request_timeout_s`` fail
  with ``TimeoutError`` instead of waiting forever;
* **cancellation** — a ``Future.cancel()`` before the batch launches removes
  the request from its batch;
* **error isolation** — an exception in one batch fails only that batch's
  futures; the scheduler keeps serving;
* **priority classes** — higher-priority requests schedule first, with
  time-based aging (``priority_aging_s``) so background traffic is never
  starved.

Buckets key on both temporal lengths *and* the spatial sizes of both streams,
so mixed-resolution traffic can never be fused into one (shape-invalid)
program call.
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


class ServerOverloadedError(RuntimeError):
    """Raised by ``submit`` when the pending-request queue is full."""


def _bucket_up(n: int, multiple: int) -> int:
    m = multiple
    while m < n:
        m *= 2
    return m


def _shard_rows(arrays, mesh, b: int):
    """Place host batch arrays row-sharded over ``mesh`` axis 0, padding the
    batch up to a device multiple first (pad rows replicate row 0 so the
    model math stays benign; their outputs are sliced away).  Returns the
    device arrays and the padded batch size.

    Only axis 0 of the mesh carries rows — on a 2-D ``(data, model)``
    tensor-parallel mesh (:mod:`..parallel.tensor`) the batch pads to the
    ``data`` extent and every ``model`` column sees the full row set."""
    from jax.sharding import NamedSharding, PartitionSpec

    n = mesh.shape[mesh.axis_names[0]]
    pb = -(-b // n) * n
    out = []
    for a in arrays:
        if pb != b:
            a = np.concatenate([a, np.repeat(a[:1], pb - b, axis=0)], axis=0)
        sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        out.append(jax.device_put(a, sh))
    return out, pb


@dataclasses.dataclass
class InferenceRequest:
    clips: np.ndarray        # (T, H, W, 3) float32 — coarse-stream frames
    fine_clips: np.ndarray   # (T_f, H', W', 3) float32 — fine-stream frames
    meta: Optional[np.ndarray] = None   # (4,) int32; default whole video
    priority: int = 0        # higher preempts; aging prevents starvation
    future: Future = dataclasses.field(default_factory=Future)
    enqueued_at: float = dataclasses.field(default_factory=time.monotonic)
    # set by serve.feature_cache.CachingVideoServer
    video_id: Optional[str] = None
    cached: Optional[tuple] = None      # (feats dict, true fine length)

    @property
    def label_len(self) -> int:
        return 4 * self.clips.shape[0]


class VideoServer:
    """Batching scheduler over a jittable whole-video apply function.

    Args:
      apply_fn: ``(clips, fine_clips, meta, label_len, fine_mask) -> probs``
        — e.g. ``functools.partial(pipeline.apply, variables)``.  Called
        under jit with static ``label_len``.
      max_batch: upper bound on requests fused into one program call.
      max_wait_ms: how long the scheduler holds a non-full batch open for
        same-bucket stragglers.
      bucket_multiple: base of the geometric padding buckets.
      max_queue: pending-request bound; ``submit`` raises
        :class:`ServerOverloadedError` beyond it (backpressure).
      request_timeout_s: if set, requests that wait longer fail with
        ``TimeoutError``.
      priority_aging_s: seconds of waiting worth one priority level — a
        lower-priority bucket eventually outranks a busy high-priority one
        (no starvation).
    """

    def __init__(
        self,
        apply_fn: Callable,
        max_batch: int = 4,
        max_wait_ms: float = 5.0,
        bucket_multiple: int = 16,
        max_queue: int = 256,
        request_timeout_s: Optional[float] = None,
        mesh=None,
        priority_aging_s: float = 1.0,
    ):
        self._apply = apply_fn
        self.mesh = mesh  # data-parallel serving: batches shard over axis 0
        self.priority_aging = priority_aging_s
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.bucket_multiple = bucket_multiple
        self.max_queue = max_queue
        self.request_timeout = request_timeout_s
        self._buckets: Dict[Tuple[int, ...], collections.deque] = {}
        self._pending = 0
        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._jitted: Dict[Tuple[int, int], Callable] = {}
        self.batches_run = 0
        self.batch_sizes: list = []
        self.timeouts = 0
        self.cancelled = 0

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
               meta: Optional[np.ndarray] = None,
               priority: int = 0) -> Future:
        """Queue one whole-video request; the Future resolves to per-frame
        class probabilities ``(4*T, n_classes)`` float32.

        Raises :class:`ServerOverloadedError` when ``max_queue`` requests are
        already pending, and ``ValueError`` on malformed inputs."""
        clips = np.asarray(clips, np.float32)
        fine_clips = np.asarray(fine_clips, np.float32)
        if clips.ndim != 4 or clips.shape[-1] != 3:
            raise ValueError(f"clips must be (T, H, W, 3), got {clips.shape}")
        if fine_clips.ndim != 4 or fine_clips.shape[-1] != 3:
            raise ValueError(
                f"fine_clips must be (T_f, H, W, 3), got {fine_clips.shape}")
        req = InferenceRequest(clips, fine_clips,
                               None if meta is None
                               else np.asarray(meta, np.int32),
                               priority=priority)
        key = self._bucket_key(req)
        with self._lock:
            if self._pending >= self.max_queue:
                raise ServerOverloadedError(
                    f"{self._pending} requests pending (max_queue="
                    f"{self.max_queue})")
            self._buckets.setdefault(key, collections.deque()).append(req)
            self._pending += 1
        self._wake.set()
        return req.future

    # -- internals -----------------------------------------------------------

    def _bucket_key(self, req: InferenceRequest) -> Tuple[int, ...]:
        """Temporal buckets of both streams + exact spatial sizes of both
        streams: only requests that pad to one program shape share a key."""
        return (_bucket_up(req.clips.shape[0], self.bucket_multiple),
                _bucket_up(req.fine_clips.shape[0], self.bucket_multiple),
                req.clips.shape[1], req.clips.shape[2],
                req.fine_clips.shape[1], req.fine_clips.shape[2])

    def _expire_and_prune(self):
        """Drop timed-out and already-cancelled requests from every bucket;
        fail the timed-out ones.  Called with the lock held."""
        now = time.monotonic()
        for dq in self._buckets.values():
            kept = []
            for r in dq:
                if r.future.cancelled():
                    self.cancelled += 1
                    self._pending -= 1
                    continue
                if (self.request_timeout is not None
                        and now - r.enqueued_at > self.request_timeout):
                    if r.future.set_running_or_notify_cancel():
                        r.future.set_exception(TimeoutError(
                            f"request waited > {self.request_timeout}s"))
                        self.timeouts += 1
                    else:
                        self.cancelled += 1
                    self._pending -= 1
                    continue
                kept.append(r)
            dq.clear()
            dq.extend(kept)

    def _take_batch(self):
        """Pick the bucket whose head request scores highest —
        ``priority + waited/priority_aging_s`` — so urgent traffic
        preempts but waiting requests age upward (no starvation); take up
        to max_batch runnable requests from it."""
        with self._lock:
            self._expire_and_prune()
            now = time.monotonic()
            best_key, best_score, best_age = None, None, None
            for key, dq in self._buckets.items():
                if not dq:
                    continue
                r = dq[0]
                score = r.priority + (now - r.enqueued_at) / max(
                    self.priority_aging, 1e-6)
                if best_score is None or score > best_score:
                    best_key, best_score = key, score
                    best_age = r.enqueued_at
            if best_key is None:
                return None, []
            dq = self._buckets[best_key]
            if (len(dq) < self.max_batch
                    and now - best_age < self.max_wait):
                return None, []   # hold the batch open for stragglers
            out = []
            while dq and len(out) < self.max_batch:
                r = dq.popleft()
                self._pending -= 1
                # transitions PENDING→RUNNING; False if cancelled meanwhile
                if r.future.set_running_or_notify_cancel():
                    out.append(r)
                else:
                    self.cancelled += 1
            return best_key, out

    def _run_batch(self, key, reqs):
        t_pad, tf_pad, h, w, fh, fw = key
        b = len(reqs)
        clips = np.zeros((b, t_pad, h, w, 3), np.float32)
        fine = np.zeros((b, tf_pad, fh, fw, 3), np.float32)
        fine_mask = np.zeros((b, tf_pad), np.float32)
        meta = np.zeros((b, 4), np.int32)
        for i, r in enumerate(reqs):
            t, tf = r.clips.shape[0], r.fine_clips.shape[0]
            clips[i, :t] = r.clips
            fine[i, :tf] = r.fine_clips
            fine_mask[i, :tf] = 1.0
            # [start_f, frames, nf, stride]/gamma_tau with nf the TRUE fine
            # frame count (charades_coarse_fineFEAT.py:199-200)
            meta[i] = (r.meta if r.meta is not None
                       else np.asarray([0, t, tf, 1], np.int32))
        label_len = 4 * t_pad
        jit_key = (label_len, key)
        if jit_key not in self._jitted:
            self._jitted[jit_key] = jax.jit(
                lambda c, f, m, fm: self._apply(c, f, m, label_len,
                                                fine_mask=fm))
        if self.mesh is not None:
            (clips, fine, meta, fine_mask), _ = _shard_rows(
                (clips, fine, meta, fine_mask), self.mesh, b)
            probs = np.asarray(self._jitted[jit_key](
                clips, fine, meta, fine_mask))[:b]
        else:
            probs = np.asarray(self._jitted[jit_key](
                jnp.asarray(clips), jnp.asarray(fine), jnp.asarray(meta),
                jnp.asarray(fine_mask)))
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
            except Exception as e:  # isolate: fail this batch, keep serving
                for r in reqs:
                    if not r.future.done():
                        r.future.set_exception(e)

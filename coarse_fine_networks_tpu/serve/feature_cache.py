"""Fine-feature cache in front of the batching video server.

The reference materialises the fine stream once per video on disk
(``extract_fineFEAT.py:168-173``) and every later fusion run reads it back
(``charades_coarse_fineFEAT.py:77-89``).  At serving time the same property
holds — the fine tower's 7x7 feature banks depend only on the video, while
the coarse+fusion pass is cheap per request — so repeat requests for a video
(re-scoring, threshold sweeps, A/B fusion heads) should not re-run the fine
tower, which dominates whole-video inference cost (T_f = 2T frames through
the full X3D trunk).

:class:`FeatureCache` is a thread-safe byte-bounded LRU keyed by video id;
:class:`CachingVideoServer` extends :class:`.scheduler.VideoServer` with a
two-program path: misses batch through the jitted ``extract`` program
(:meth:`..models.CoarseFinePipeline.extract`), populate the cache, and every
request — hit or miss — batches through the jitted ``fuse`` program.  Cached
features are stored sliced to the video's true fine length and re-padded to
whatever geometric bucket a later request lands in, so a hit is
bucket-independent (the validity mask carries the true extent, exactly as in
the one-program path).
"""

from __future__ import annotations

import collections
import threading
from typing import Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .scheduler import (
    InferenceRequest,
    ServerOverloadedError,
    VideoServer,
    _bucket_up,
    _shard_rows,
)

FeatDict = Dict[str, np.ndarray]


class FeatureCache:
    """Thread-safe byte-bounded LRU of per-video fine-feature banks.

    Values are dicts of ``(t_f, 7, 7, C)`` float32 arrays (one per tower
    tap), stored sliced to the true fine length.
    """

    def __init__(self, capacity_bytes: int = 1 << 30):
        self.capacity = capacity_bytes
        self._data: "collections.OrderedDict[str, Tuple[FeatDict, int]]" = \
            collections.OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    @staticmethod
    def _nbytes(feats: FeatDict) -> int:
        return sum(v.nbytes for v in feats.values())

    def get(self, video_id: str) -> Optional[Tuple[FeatDict, int]]:
        """Return ``(feats, true_fine_len)`` and refresh LRU order."""
        with self._lock:
            entry = self._data.get(video_id)
            if entry is None:
                self.misses += 1
                return None
            self._data.move_to_end(video_id)
            self.hits += 1
            return entry

    def put(self, video_id: str, feats: FeatDict, fine_len: int) -> None:
        size = self._nbytes(feats)
        if size > self.capacity:
            return  # larger than the whole cache: never admit
        with self._lock:
            old = self._data.pop(video_id, None)
            if old is not None:
                self._bytes -= self._nbytes(old[0])
            self._data[video_id] = (feats, fine_len)
            self._bytes += size
            while self._bytes > self.capacity:
                _, (ev, _) = self._data.popitem(last=False)
                self._bytes -= self._nbytes(ev)
                self.evictions += 1

    def __len__(self) -> int:
        with self._lock:
            return len(self._data)

    @property
    def nbytes(self) -> int:
        return self._bytes

    FEATURE_KEYS = ("layer1", "layer2", "layer3", "layer4", "conv5")

    def preload_dir(self, feat_dir: str, keys=FEATURE_KEYS,
                    max_videos: Optional[int] = None) -> int:
        """Warm the cache from an extract-driver bank directory
        (``<feat_dir>/<key>/<vid>.npy``, the disk boundary of
        ``extract_fineFEAT.py:168-173`` — reference ``.pt`` banks load
        too).  Videos are admitted in sorted order; LRU eviction applies
        once capacity is hit, so the most recently loaded survive.
        Returns the number of videos admitted."""
        import os

        d0 = os.path.join(feat_dir, keys[0])
        vids = sorted({f.rsplit(".", 1)[0] if "." in f else f
                       for f in os.listdir(d0)})
        if max_videos is not None:
            vids = vids[:max_videos]
        n = 0
        for vid in vids:
            feats = {}
            for k in keys:
                path = os.path.join(feat_dir, k, vid)
                if os.path.exists(path + ".npy"):
                    f = np.load(path + ".npy")       # ours: (T, 7, 7, C)
                else:
                    import torch  # reference: (1, C, T, 7, 7) torch.save

                    f = torch.load(path, map_location="cpu")
                    f = np.transpose(f.squeeze(0).numpy(), (1, 2, 3, 0))
                feats[k] = np.ascontiguousarray(f, np.float32)
            self.put(vid, feats, feats[keys[0]].shape[0])
            n += 1
        return n


class CachingVideoServer(VideoServer):
    """:class:`VideoServer` with a fine-feature cache between the streams.

    Args:
      extract_fn: jittable ``fine_clips (B, T_f, H, W, 3) -> feats`` — e.g.
        ``partial(m.apply, v, method=CoarseFinePipeline.extract)``.
      fuse_fn: jittable ``(clips, feats, feat_mask, meta, label_len) ->
        probs`` — e.g. ``partial(m.apply, v, method=CoarseFinePipeline.fuse)``
        (``label_len`` static).
      cache: a :class:`FeatureCache`; a fresh 1 GiB one by default.

    ``submit(..., video_id=...)`` enables caching for that request; without a
    video id the request still runs the two-program path but is not stored.
    A hit may omit ``fine_clips`` entirely (pass a ``meta`` whose ``nf`` is
    left default: the cached true fine length is used).
    """

    def __init__(self, extract_fn: Callable, fuse_fn: Callable,
                 cache: Optional[FeatureCache] = None, **kw):
        super().__init__(apply_fn=None, **kw)
        self._extract = jax.jit(extract_fn)
        self._fuse_fn = fuse_fn
        self.cache = cache if cache is not None else FeatureCache()
        self._jfuse: Dict[int, Callable] = {}

    # -- submit/bucketing overrides -------------------------------------------

    def submit(self, clips: np.ndarray,
               fine_clips: Optional[np.ndarray] = None,
               meta: Optional[np.ndarray] = None,
               video_id: Optional[str] = None,
               priority: int = 0):
        clips = np.asarray(clips, np.float32)
        if clips.ndim != 4 or clips.shape[-1] != 3:
            raise ValueError(f"clips must be (T, H, W, 3), got {clips.shape}")
        cached = self.cache.get(video_id) if video_id is not None else None
        if cached is None:
            if fine_clips is None:
                raise ValueError(
                    f"video {video_id!r} not cached: fine_clips required")
            fine_clips = np.asarray(fine_clips, np.float32)
            if fine_clips.ndim != 4 or fine_clips.shape[-1] != 3:
                raise ValueError(
                    f"fine_clips must be (T_f, H, W, 3), got "
                    f"{fine_clips.shape}")
        req = InferenceRequest(clips, fine_clips,
                               None if meta is None
                               else np.asarray(meta, np.int32),
                               priority=priority)
        req.video_id = video_id
        req.cached = cached
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

    def _bucket_key(self, req: InferenceRequest) -> Tuple[int, ...]:
        # hits have no fine pixels: spatial dims 0 keep them out of miss
        # batches (whose extract program needs a real (fh, fw))
        tf = (req.cached[1] if req.cached is not None
              else req.fine_clips.shape[0])
        fh, fw = ((0, 0) if req.cached is not None
                  else req.fine_clips.shape[1:3])
        return (_bucket_up(req.clips.shape[0], self.bucket_multiple),
                _bucket_up(tf, self.bucket_multiple),
                req.clips.shape[1], req.clips.shape[2], fh, fw)

    # -- two-program batch execution ------------------------------------------

    def _run_batch(self, key, reqs):
        t_pad, tf_pad, h, w, fh, fw = key
        b = len(reqs)
        clips = np.zeros((b, t_pad, h, w, 3), np.float32)
        feat_mask = np.zeros((b, tf_pad), np.float32)
        meta = np.zeros((b, 4), np.int32)

        miss = [i for i, r in enumerate(reqs) if r.cached is None]
        miss_feats = None
        if miss:
            fine = np.zeros((len(miss), tf_pad, fh, fw, 3), np.float32)
            for j, i in enumerate(miss):
                tf = reqs[i].fine_clips.shape[0]
                fine[j, :tf] = reqs[i].fine_clips
            if self.mesh is not None:
                (fine_dev,), _ = _shard_rows((fine,), self.mesh, len(miss))
                miss_feats = jax.tree.map(
                    lambda v: np.asarray(v)[:len(miss)],
                    self._extract(fine_dev))
            else:
                miss_feats = jax.tree.map(np.asarray,
                                          self._extract(jnp.asarray(fine)))
            for j, i in enumerate(miss):
                r = reqs[i]
                if r.video_id is not None:
                    tf = r.fine_clips.shape[0]
                    self.cache.put(
                        r.video_id,
                        {k: v[j, :tf].copy() for k, v in miss_feats.items()},
                        tf)

        # assemble the fused-feature batch: every tap (b, tf_pad, 7, 7, C)
        taps = (miss_feats.keys() if miss_feats is not None
                else reqs[0].cached[0].keys())
        feats = {}
        mi = {i: j for j, i in enumerate(miss)}
        for k in taps:
            proto = (miss_feats[k] if miss_feats is not None
                     else reqs[0].cached[0][k])
            fk = np.zeros((b, tf_pad) + proto.shape[-3:], np.float32)
            for i, r in enumerate(reqs):
                if r.cached is not None:
                    fk[i, :r.cached[1]] = r.cached[0][k]
                else:
                    fk[i] = miss_feats[k][mi[i]]
            feats[k] = fk

        for i, r in enumerate(reqs):
            tf = (r.cached[1] if r.cached is not None
                  else r.fine_clips.shape[0])
            t = r.clips.shape[0]
            clips[i, :t] = r.clips
            feat_mask[i, :tf] = 1.0
            meta[i] = (r.meta if r.meta is not None
                       else np.asarray([0, t, tf, 1], np.int32))

        label_len = 4 * t_pad
        if label_len not in self._jfuse:
            fuse = self._fuse_fn
            self._jfuse[label_len] = jax.jit(
                lambda c, f, fm, m: fuse(c, f, fm, m, label_len))
        if self.mesh is not None:
            ks = sorted(feats)
            flat = [clips, feat_mask, meta] + [feats[k] for k in ks]
            dev, _ = _shard_rows(flat, self.mesh, b)
            probs = np.asarray(self._jfuse[label_len](
                dev[0], dict(zip(ks, dev[3:])), dev[1], dev[2]))[:b]
        else:
            probs = np.asarray(self._jfuse[label_len](
                jnp.asarray(clips), jax.tree.map(jnp.asarray, feats),
                jnp.asarray(feat_mask), jnp.asarray(meta)))
        self.batches_run += 1
        self.batch_sizes.append(b)
        for i, r in enumerate(reqs):
            r.future.set_result(probs[i, : r.label_len])

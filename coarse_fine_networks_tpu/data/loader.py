"""Threaded prefetching batch loader.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=8,
pin_memory=True)`` (``train_fine.py:84-85``): worker threads decode/transform
samples ahead of consumption (PIL decode releases the GIL) and batches are
collated on the host.  The device half of the overlap — H2D transfer + the
normalize/s2d producer program staged ahead of the running step — is
:class:`.device_prefetch.DevicePrefetcher`, which the drivers wrap around
this loader (``train/common.py:iter_train_batches``).
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Callable, Iterator, List

from . import bufpool


class PrefetchLoader:
    """Iterate padded batches from a map-style dataset with worker threads."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = False,
        num_workers: int = 4,
        prefetch: int = 4,
        drop_last: bool = False,
        seed: int = 0,
        shard: "tuple[int, int] | None" = None,
        sort_key: "Callable[[int], int] | None" = None,
    ):
        """``shard=(rank, world)`` makes this loader produce the per-host
        slice of each *global* batch for multi-process data parallelism: all
        hosts draw the same seeded global index order (epoch-keyed), form
        global batches of ``batch_size``, and host ``rank`` keeps rows
        ``[rank*bs_local, (rank+1)*bs_local)`` of every batch — matching the
        process order :func:`..parallel.mesh.shard_batch` assembles with
        ``jax.make_array_from_process_local_data``.  ``batch_size`` remains
        the global batch; it must divide by ``world``, and ragged final
        batches are dropped (they cannot be split evenly across hosts)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0
        self.shard = shard
        # input-pipeline position (mid-epoch checkpoint/resume): epoch of
        # the in-flight iteration + batches already yielded from it
        self._iter_epoch = 0
        self._pos = 0
        self._resume_skip = 0
        # length-bucketed batching: order samples by key (e.g. video frame
        # count) so each batch pads to a tight, recompile-friendly max
        self.sort_key = sort_key
        if shard is not None:
            rank, world = shard
            if not (0 <= rank < world):
                raise ValueError(f"bad shard {shard}")
            if batch_size % world != 0:
                raise ValueError(
                    f"global batch {batch_size} not divisible by "
                    f"process count {world}")

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last or self.shard is not None:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self) -> List[List[int]]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        elif self.sort_key is not None:
            idx.sort(key=self.sort_key)
        out = [
            idx[i : i + self.batch_size]
            for i in range(0, len(idx), self.batch_size)
        ]
        if self.drop_last or self.shard is not None:
            out = [b for b in out if len(b) == self.batch_size]
        if self.shard is not None:
            rank, world = self.shard
            bs_local = self.batch_size // world
            out = [b[rank * bs_local : (rank + 1) * bs_local] for b in out]
        return out

    def state_dict(self) -> dict:
        """Input-pipeline position for mid-epoch checkpointing: the shuffle
        is deterministic (seed + epoch), so ``(epoch, batches_consumed)``
        fully determines the remaining data order.  Saved alongside the model
        state so preemption recovery restores *data* position, not just
        parameters (the reference re-reads the epoch from the start,
        double-sampling everything before the crash)."""
        return {"epoch": self._iter_epoch, "pos": self._pos}

    def load_state_dict(self, sd: dict) -> None:
        self.epoch = int(sd["epoch"])
        self._resume_skip = int(sd["pos"])

    def __iter__(self) -> Iterator:
        self._iter_epoch = self.epoch
        batches = self._batches()
        self.epoch += 1
        skip, self._resume_skip = self._resume_skip, 0
        batches = batches[skip:]
        self._pos = skip
        # size the buffer-pool rings to this loader's in-flight window:
        # each worker holds one batch of decoded samples pre-collate, and
        # prefetch+workers collated batches can be queued/reordered at once
        bs = self.batch_size if self.shard is None else \
            self.batch_size // self.shard[1]
        bufpool.ensure_slots(
            small=self.prefetch + self.num_workers * bs + 2,
            large=self.prefetch + self.num_workers + 2,
        )
        work: "queue.Queue" = queue.Queue()
        done: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        results = {}
        lock = threading.Lock()

        for i, b in enumerate(batches):
            work.put((i, b))
        for _ in range(self.num_workers):
            work.put(None)

        def worker():
            while True:
                item = work.get()
                if item is None:
                    done.put(None)
                    return
                i, idxs = item
                try:
                    batch = self.collate_fn([self.dataset[j] for j in idxs])
                    done.put((i, batch))
                except Exception as e:  # surface worker errors to consumer
                    done.put((i, e))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        finished_workers = 0
        next_idx = 0
        try:
            while next_idx < len(batches):
                item = done.get()
                if item is None:
                    finished_workers += 1
                    if finished_workers == self.num_workers and not results:
                        break
                    continue
                i, batch = item
                if isinstance(batch, Exception):
                    raise batch
                with lock:
                    results[i] = batch
                while next_idx in results:
                    with lock:
                        out = results.pop(next_idx)
                    next_idx += 1
                    self._pos += 1
                    yield out
        finally:
            for t in threads:
                t.join(timeout=0.1)

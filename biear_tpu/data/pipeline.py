"""Host-side input pipeline: shuffled batching + async device prefetch.

Replaces the reference's torch DataLoader worker pool
(train_biear.py:340-343). On a TPU host the right shape is: RAM-resident
arrays -> epoch permutation -> contiguous batch slices -> device_put of the
NEXT batch while the current step runs (single background thread), with
optional per-host sharding of the global batch for multi-host DP.
"""

from __future__ import annotations

import threading
import queue as queue_mod

import jax
import numpy as np


def batch_iterator(ds, batch_size: int, *, shuffle: bool, seed: int = 0,
                   epoch: int = 0, drop_last: bool = False,
                   pad_to_full: bool = False,
                   host_id: int = 0, host_count: int = 1):
    """Yield tuples of numpy batches from a dataset with .rows()/__len__.

    pad_to_full: pad the trailing partial batch to exactly batch_size (by
    repeating real rows) and append a float32 (batch_size,) weight vector
    (1 real / 0 padding) to EVERY yielded tuple. One static batch shape
    means the jitted step compiles exactly once per run — without this, a
    9,000-row split at bs=64 costs an extra full XLA compile for its
    40-row tail (5-10 minutes through this image's TPU tunnel).

    With host_count > 1 each host sees a disjoint 1/host_count slice of
    every (globally-permuted) epoch — per-host input sharding for
    multi-host data parallelism. Under pad_to_full every host then emits
    the SAME number of batches (slices differ by up to one row, which can
    differ by a whole batch after ceil-division): short hosts append
    all-padding batches (weights 0), because in a multi-process run each
    step is a collective — a host running one batch fewer would deadlock
    the others at the epoch tail. Zero-weight batches contribute nothing
    to losses or metrics (train/losses._batch_mean)."""
    if drop_last and pad_to_full:
        # contradictory: pad_to_full exists to keep the tail; the multi-host
        # equalization target below also assumes the ceil-division count
        raise ValueError("batch_iterator: drop_last and pad_to_full are "
                         "mutually exclusive")
    n = len(ds)
    idx = np.arange(n)
    if shuffle:
        idx = np.random.default_rng(seed + epoch).permutation(n)
    idx = idx[host_id::host_count]
    end = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
    emitted = 0
    for s in range(0, end, batch_size):
        sel = idx[s:s + batch_size]
        if len(sel) == 0:
            break
        if not pad_to_full:
            yield ds.rows(sel)
            continue
        n_valid = len(sel)
        if n_valid < batch_size:
            fill = sel[np.arange(batch_size - n_valid) % n_valid]
            sel = np.concatenate([sel, fill])
        w = np.zeros(batch_size, np.float32)
        w[:n_valid] = 1.0
        yield (*ds.rows(sel), w)
        emitted += 1
    if pad_to_full and host_count > 1 and n > 0:
        # host 0 always holds the longest slice: ceil(n / host_count)
        global_batches = -(-(-(-n // host_count)) // batch_size)
        while emitted < global_batches:
            sel = np.broadcast_to(idx[:1] if len(idx) else np.zeros(1, np.int64),
                                  (batch_size,)).copy()
            yield (*ds.rows(sel), np.zeros(batch_size, np.float32))
            emitted += 1


class Prefetcher:
    """Wrap a batch iterator; device_put the next batch on a background
    thread while the caller consumes the current one. Exceptions on the
    worker propagate to the consumer (a silently-dead loader looks like an
    empty epoch — the failure mode must be loud)."""

    _DONE = object()

    def __init__(self, it, sharding=None, depth: int = 2, assemble=None):
        """assemble: optional callable(batch_tuple) -> device batch,
        replacing the default device_put — multi-process runs pass a
        make_array_from_process_local_data closure here so per-host
        slices assemble into global arrays off the main thread."""
        self._q = queue_mod.Queue(maxsize=depth)
        self._sharding = sharding
        self._assemble = assemble
        self._shard_div = (dict(sharding.mesh.shape).get("data", 1)
                           if sharding is not None else 1)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _put_batch(self, batch):
        if self._assemble is not None:
            return self._assemble(batch)
        # A trailing partial batch may not divide the data axis; place it
        # replicated instead (the jitted step accepts any input layout).
        if (self._sharding is not None
                and batch[0].shape[0] % self._shard_div == 0):
            return tuple(jax.device_put(b, self._sharding) for b in batch)
        return tuple(jax.device_put(b) for b in batch)

    def _put(self, item) -> bool:
        """Enqueue unless the consumer closed us; returns False to stop."""
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return True
            except queue_mod.Full:
                continue
        return False

    def _run(self, it):
        try:
            for batch in it:
                if not self._put(self._put_batch(batch)):
                    return               # consumer closed early
            self._put(self._DONE)
        except BaseException as e:       # noqa: BLE001 — propagate to consumer
            self._put(e)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def close(self):
        """Release the worker and its queued device batches. Safe to call
        multiple times; consumers that stop early MUST call this (or the
        thread would sit blocked on a full queue holding device memory)."""
        self._stop.set()

        def drain():
            try:
                while True:
                    self._q.get_nowait()
            except queue_mod.Empty:
                pass

        drain()                         # unblock a put-waiting worker
        self._thread.join(timeout=5.0)
        drain()                         # a final put may have raced the join

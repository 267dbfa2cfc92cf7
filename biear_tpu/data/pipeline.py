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

import numpy as np
import jax


def batch_iterator(ds, batch_size: int, *, shuffle: bool, seed: int = 0,
                   epoch: int = 0, drop_last: bool = False,
                   host_id: int = 0, host_count: int = 1):
    """Yield tuples of numpy batches from a dataset with .rows()/__len__.

    With host_count > 1 each host sees a disjoint 1/host_count slice of
    every (globally-permuted) epoch — per-host input sharding for
    multi-host data parallelism."""
    n = len(ds)
    idx = np.arange(n)
    if shuffle:
        idx = np.random.default_rng(seed + epoch).permutation(n)
    idx = idx[host_id::host_count]
    end = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
    for s in range(0, end, batch_size):
        sel = idx[s:s + batch_size]
        if len(sel) == 0:
            return
        yield ds.rows(sel)


class Prefetcher:
    """Wrap a batch iterator; device_put the next batch on a background
    thread while the caller consumes the current one."""

    _DONE = object()

    def __init__(self, it, sharding=None, depth: int = 2):
        self._q = queue_mod.Queue(maxsize=depth)
        self._sharding = sharding
        self._thread = threading.Thread(target=self._run, args=(it,),
                                        daemon=True)
        self._thread.start()

    def _run(self, it):
        try:
            for batch in it:
                if self._sharding is not None:
                    batch = tuple(jax.device_put(b, self._sharding)
                                  for b in batch)
                else:
                    batch = tuple(jax.device_put(b) for b in batch)
                self._q.put(batch)
        finally:
            self._q.put(self._DONE)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            raise StopIteration
        return item

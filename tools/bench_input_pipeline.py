#!/usr/bin/env python
"""Measure the host input pipeline: H5 (lazy + preload) vs native shards.

The training input path is host-side (batch gather -> device_put); this
bench isolates the gather side on the active schema at reference row
geometry (2 x 16000 wav + 100 CC + 56 labels per row) and reports epoch
throughput in rows/s for:

  h5_lazy     ActiveH5Dataset(preload=False) — per-batch h5py fancy reads,
              the closest analogue of the reference's lazy SWMR DataLoader
              workers (data_save.py:282-286)
  h5_preload  ActiveH5Dataset(preload=True) — the repo's previous default;
              the one-off preload cost is reported separately
  shard       native ShardDataset (DATA_FORMAT: shard) — mmap + C++
              multithreaded gather, int16 wav decode fused into the copy

Writes JSON (--json) for RESULTS.md. Pure host benchmark: no TPU needed,
unaffected by tunnel contention.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biear_tpu.data.h5io import save_active_h5, ActiveH5Dataset  # noqa: E402
from biear_tpu.data.native_loader import (write_shard, ShardDataset,  # noqa: E402
                                          native_available)
from biear_tpu.data.pipeline import batch_iterator  # noqa: E402


def _epoch(ds, batch_size, epochs=1, seed=0):
    t0 = time.perf_counter()
    rows = 0
    sink = 0.0
    for e in range(epochs):
        for b in batch_iterator(ds, batch_size, shuffle=True, seed=seed,
                                epoch=e):
            rows += b[0].shape[0]
            sink += float(b[0][0, 0])  # touch the data (defeat lazy pages)
    dt = time.perf_counter() - t0
    return rows / dt, sink


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--rows", type=int, default=4096)
    ap.add_argument("--fs", type=int, default=16000)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workdir", default="/tmp/biear_input_bench")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    rng = np.random.default_rng(0)
    n, fs = args.rows, args.fs
    wavL = rng.uniform(-1, 1, (n, fs)).astype(np.float32)
    wavR = rng.uniform(-1, 1, (n, fs)).astype(np.float32)
    x3 = rng.standard_normal((n, 100)).astype(np.float32)
    y = rng.standard_normal((n, 56)).astype(np.float32)

    h5p = os.path.join(args.workdir, "bench.h5")
    shp = os.path.join(args.workdir, "bench.shard")
    save_active_h5(h5p, wavL, wavR, x3, y)
    write_shard(shp, [wavL, wavR, x3, y], ["i16", "i16", "f32", "f32"])

    out = {"rows": n, "fs": fs, "batch_size": args.batch_size,
           "epochs": args.epochs,
           "h5_bytes": os.path.getsize(h5p),
           "shard_bytes": os.path.getsize(shp)}

    ds = ActiveH5Dataset(h5p, preload=False)
    out["h5_lazy_rows_per_s"], _ = _epoch(ds, args.batch_size, args.epochs)
    ds.close()

    t0 = time.perf_counter()
    ds = ActiveH5Dataset(h5p, preload=True)
    out["h5_preload_s"] = time.perf_counter() - t0
    out["h5_preload_rows_per_s"], _ = _epoch(ds, args.batch_size, args.epochs)

    if native_available():
        t0 = time.perf_counter()
        sd = ShardDataset(shp, shapes=[(fs,), (fs,), (100,), (56,)])
        out["shard_open_s"] = time.perf_counter() - t0
        # cold epoch pulls pages off disk; steady-state epochs measure the
        # gather core itself (training runs 150 epochs over a warm cache)
        out["shard_cold_rows_per_s"], _ = _epoch(sd, args.batch_size, 1)
        out["shard_rows_per_s"], _ = _epoch(sd, args.batch_size, args.epochs)
        sd.close()
        out["shard_vs_h5_lazy"] = (out["shard_rows_per_s"]
                                   / out["h5_lazy_rows_per_s"])
        out["shard_vs_h5_preload"] = (out["shard_rows_per_s"]
                                      / out["h5_preload_rows_per_s"])
    out["max_rss_mb"] = resource.getrusage(
        resource.RUSAGE_SELF).ru_maxrss / 1024

    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

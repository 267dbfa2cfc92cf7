"""Metric logging: JSONL always; TensorBoard when available.

The reference logs per-step scalars, split grad norms and nonfinite flags
to TensorBoard (train_biear.py:189-224, 529-540). We write the same scalar
set to a newline-delimited JSON file (machine-readable without TB) and
mirror to TB if the tensorboard package is importable (it is not baked
into every image, so it is strictly optional).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, tb_dir: str | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a",
                       buffering=1)
        self._tb = None
        if tb_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(tb_dir)
            except Exception:
                self._tb = None

    def scalars(self, tag_prefix: str, values: dict, step: int):
        rec = {"t": time.time(), "step": step,
               **{f"{tag_prefix}/{k}": float(v) for k, v in values.items()}}
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(f"{tag_prefix}/{k}", float(v), step)

    def histograms(self, tag_prefix: str, hists: dict, edges, step: int):
        """Per-tensor gradient histograms (train_biear.py:206-222's
        TB-histogram telemetry): hists maps leaf name -> bin counts over the
        shared magnitude `edges`. JSONL always; TB via add_histogram_raw."""
        rec = {"t": time.time(), "step": step, "kind": "hist",
               "edges": [float(e) for e in edges],
               **{f"{tag_prefix}/{k}": [int(c) for c in v]
                  for k, v in hists.items()}}
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import numpy as np
            e = np.asarray(edges, np.float64)
            for k, v in hists.items():
                counts = np.asarray(v, np.float64)
                # counts has len(edges)+1 buckets (underflow, len(edges)-1
                # bins, overflow); fold the flanks into the edge bins for TB
                folded = counts[1:len(e)].copy()
                folded[0] += counts[0]
                folded[-1] += counts[len(e)]
                total = folded.sum()
                if total == 0:
                    continue
                centers = (e[:-1] + e[1:]) / 2.0
                self._tb.add_histogram_raw(
                    f"{tag_prefix}/{k}", min=float(e[0]), max=float(e[-1]),
                    num=int(total),
                    sum=float((folded * centers).sum()),
                    sum_squares=float((folded * centers ** 2).sum()),
                    bucket_limits=e[1:].tolist(),
                    bucket_counts=folded.tolist(), global_step=step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


class NullLogger:
    """Logger for non-main processes of a multi-process run: same
    interface, no files opened, no writes (jax.process_index() != 0)."""

    def scalars(self, tag_prefix, values, step):
        pass

    def histograms(self, tag_prefix, hists, edges, step):
        pass

    def close(self):
        pass

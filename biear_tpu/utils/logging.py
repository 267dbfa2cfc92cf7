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

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()

#!/usr/bin/env python
"""Reference-compatible entry point for Q-trajectory visualisation
(the reference ships a no-op stub at visualize_q.py:4-6; the real
implementation lives in biear_tpu.utils.qvis)."""

from biear_tpu.utils.qvis import visualize_Q_LR  # noqa: F401

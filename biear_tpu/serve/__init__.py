"""Serving / real-time inference paths.

streaming: stateful frame-by-frame inference for the active models — the
deployment shape the offline reference cannot express (see
streaming.py's module docstring for the contract and limits).
"""

from .streaming import (stream_init, stream_step, stream_readout,
                        stream_apply, stream_plan, stream_reset)

__all__ = ["stream_init", "stream_step", "stream_readout", "stream_apply",
           "stream_plan", "stream_reset"]

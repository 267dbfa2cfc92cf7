#!/usr/bin/env python
"""Convert a reference-schema H5 into a native binary shard.

Waveform fields (x1/x2 in the active schema) are stored as int16 — half
the bytes on disk and in host memory; the native gather decodes to float32
with the 1/32767 scale during batching.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("h5_path")
    ap.add_argument("shard_path")
    ap.add_argument("--wav-i16", action="store_true", default=True,
                    help="store waveform fields as int16 (default)")
    ap.add_argument("--no-wav-i16", dest="wav_i16", action="store_false")
    args = ap.parse_args()

    from biear_tpu.data.h5io import load_arrays_from_h5
    from biear_tpu.data.native_loader import write_shard

    arrays = load_arrays_from_h5(args.h5_path)
    is_active = len(arrays) == 4
    dtypes = ["f32"] * len(arrays)
    if is_active and args.wav_i16:
        dtypes[0] = dtypes[1] = "i16"
    write_shard(args.shard_path, list(arrays), dtypes)
    sizes = {os.path.basename(p): os.path.getsize(p)
             for p in (args.h5_path, args.shard_path)}
    print(f"wrote {args.shard_path} fields={len(arrays)} "
          f"dtypes={dtypes} sizes={sizes}")


if __name__ == "__main__":
    main()

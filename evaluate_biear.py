#!/usr/bin/env python
"""Evaluate a BiEAR checkpoint: overall + per-speaker-count metrics.

Compatibility entry point for the reference's evaluate_biear.py, with a
real CLI instead of an edit-me constant. Accepts our orbax checkpoint
directories AND the reference's raw .pth state_dicts; model configuration
is recovered from the run's meta/settings.json exactly like the reference
(evaluate_biear.py:43-104).
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir (…/checkpoints/best) or "
                         "reference .pth file")
    ap.add_argument("--test-h5", default=None,
                    help="test H5, or a native .shard file "
                         "(default: ROOT/anechoic_test2_* from "
                         "settings.json)")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--out", default=None,
                    help="output JSON (default: evaluate_biear_metrics.json "
                         "beside the checkpoint dir)")
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    from biear_tpu.train.evaluate import evaluate
    evaluate(args.checkpoint, test_h5=args.test_h5,
             batch_size=args.batch_size, out_path=args.out)


if __name__ == "__main__":
    main()

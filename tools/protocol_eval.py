#!/usr/bin/env python
"""Post-hoc protocol evaluation: the test1/test2 stage of
tools/run_full_protocol.py, runnable standalone against an existing run
directory (e.g. after an interrupted run — training results and
checkpoints survive; this recreates the two synthetic test pools with the
driver's exact seeds and writes evaluate_biear_metrics_test{1,2}.json).

Usage:  python tools/protocol_eval.py RUN_DIR [--checkpoint best]
        [--scene anechoic] [--eval-size 9000] [--pool-size 256] [--seed 0]

Seeds must match the original run_full_protocol invocation (defaults
match the driver's defaults): pool A = seed+1, pool B = seed+9999,
split seeds seed+777 / seed+888.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir")
    ap.add_argument("--checkpoint", default="best",
                    help="checkpoint name under RUN_DIR/checkpoints")
    ap.add_argument("--scene", default="anechoic",
                    choices=("anechoic", "auditorium", "spirit"))
    ap.add_argument("--eval-size", type=int, default=9000)
    ap.add_argument("--pool-size", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    from biear_tpu.config import config_from_settings
    from biear_tpu.data.synth import make_test_segments
    from biear_tpu.train.evaluate import load_params
    from biear_tpu.train.runner import SynthEvalDataset
    from tools.generate_binaural_data import build_synthesizer
    from tools.run_full_protocol import predictions_on_device, full_metrics

    with open(os.path.join(args.run_dir, "meta", "settings.json")) as f:
        settings = json.load(f)
    cfg, _, _ = config_from_settings(settings)
    model_kind = str(settings.get("MODEL_KIND", "active")).lower()
    ckpt_path = os.path.join(args.run_dir, "checkpoints", args.checkpoint)
    params = load_params(ckpt_path, cfg, model_kind)
    print(f"[protocol-eval] {args.run_dir} ({model_kind}), "
          f"checkpoint={args.checkpoint}, scene={args.scene}")

    pool_a = make_test_segments(args.pool_size, seed=args.seed + 1)
    pool_b = make_test_segments(args.pool_size, seed=args.seed + 9999)
    bs = int(settings.get("BATCH_SIZE", 64))
    for name, pool, seed_off in (("test1", pool_a, 777),
                                 ("test2", pool_b, 888)):
        synth = build_synthesizer(args.scene, None, pool, cfg.fs,
                                  num_lags=cfg.n_bands)
        ds = SynthEvalDataset(synth, args.eval_size, args.seed + seed_off,
                              bs, test_thirds=True)
        preds = predictions_on_device(params, cfg, ds, model_kind)
        metrics = full_metrics(*preds)
        path = os.path.join(args.run_dir,
                            f"evaluate_biear_metrics_{name}.json")
        with open(path, "w") as f:
            json.dump(metrics, f, indent=2)
        o = metrics["overall"]
        print(f"[{name}] sound_acc={o['sound_acc']*100:.2f}% "
              f"aoa_mae={o['aoa_mae']:.4f} ({o['aoa_mae_deg']:.2f} deg, "
              f"masked {o['aoa_mae_deg_masked']:.2f} deg) "
              f"dist_acc={o['dist_acc']*100:.2f}%")


if __name__ == "__main__":
    main()

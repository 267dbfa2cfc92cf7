#!/usr/bin/env python
"""Train a BiEAR model (TPU-native rebuild).

Compatibility entry point: like the reference script, running with no
arguments reads conf/config.yaml and trains under RUNS_ROOT with the same
run-dir layout, settings.json, history.json and checkpoint naming
(reference train_biear.py:16-157). Improvements over the reference: a real
CLI, crash-resume-capable checkpoints, and optional on-device data
synthesis (SYNTH_ON_DEVICE: true) that removes the H5 precompute stage.
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "conf", "config.yaml"))
    ap.add_argument("--epochs", type=int, default=None,
                    help="override EPOCHS")
    ap.add_argument("--max-steps-per-epoch", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume", default=None, metavar="RUN_DIR",
                    help="continue training from an existing run directory "
                         "(restores params + optimizer state + epoch)")
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    from biear_tpu.config import load_run_config
    from biear_tpu.train.runner import train

    rc = load_run_config(args.config)
    if args.epochs is not None:
        rc.epochs = args.epochs

    synth = None
    if rc.synth_on_device:
        import numpy as np
        from biear_tpu.data.synth import (AnechoicSynthesizer,
                                          make_test_hrir_bank,
                                          make_test_segments)
        from biear_tpu.data.synth_reverb import (ReverbSynthesizer,
                                                 make_test_brir_bank,
                                                 AUDITORIUM3_SPEAKER_XY)
        sofa = rc.raw.get("SOFA_FILE")
        segs_npy = rc.raw.get("SEGMENT_POOL")
        scene = str(rc.raw.get("SCENE", "anechoic")).lower()
        segments = (np.load(segs_npy) if segs_npy
                    else make_test_segments(64))
        if scene == "room":
            if sofa and os.path.exists(sofa):
                from tools.sofa_io import load_sofa_brir
                ir, view, _ = load_sofa_brir(sofa, rc.model_cfg.fs)
                yaw = (np.degrees(np.arctan2(view[:, 1], view[:, 0])) % 360.0
                       if view is not None and view.ndim == 2
                       else np.linspace(-90.0, 90.0, ir.shape[0]) % 360.0)
                sxy = AUDITORIUM3_SPEAKER_XY[:ir.shape[2]]
            else:
                ir, yaw, sxy = make_test_brir_bank()
            synth = ReverbSynthesizer(ir, yaw, sxy, segments,
                                      fs=rc.model_cfg.fs)
        else:
            if sofa and os.path.exists(sofa):
                from tools.sofa_io import load_sofa_hrir
                ir, az, dist = load_sofa_hrir(sofa, fs_target=rc.model_cfg.fs)
            else:
                ir, az, dist = make_test_hrir_bank()
            synth = AnechoicSynthesizer(ir, az, dist, segments,
                                        fs=rc.model_cfg.fs)

    out = train(rc, synth=synth, seed=args.seed, quiet=args.quiet,
                max_steps_per_epoch=args.max_steps_per_epoch,
                resume_from=args.resume)
    print("Training finished.")
    print("[Run dir]", out["run_dir"])


if __name__ == "__main__":
    main()

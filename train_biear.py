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
        from biear_tpu.data.synth import make_test_segments
        from tools.generate_binaural_data import build_synthesizer
        sofa = rc.raw.get("SOFA_FILE")
        segs_npy = rc.raw.get("SEGMENT_POOL")
        # SCENE: anechoic | auditorium | spirit ('room' = auditorium).
        # Scene-correct speaker geometry + 4-tier head-yaw extraction live
        # in build_synthesizer (a Spirit SOFA must never silently get
        # Auditorium coordinates).
        scene = str(rc.raw.get("SCENE", "anechoic")).lower()
        scene = "auditorium" if scene == "room" else scene
        segments = (np.load(segs_npy) if segs_npy
                    else make_test_segments(64))
        if sofa and not os.path.exists(sofa):
            print(f"[Scene] SOFA_FILE {sofa!r} not found; "
                  f"using the built-in {scene} test bank")
            sofa = None
        synth = build_synthesizer(scene, sofa, segments, rc.model_cfg.fs,
                                  num_lags=rc.model_cfg.n_bands)
        if not rc.active or rc.model_kind == "passive":
            # passive family: compute the reference's offline 5-feature
            # set (create_h5_data/data_save.py:122-164) on-device from
            # the synthesized waveforms — no H5 precompute stage
            from biear_tpu.data.passive_synth import PassiveFeatureSynth
            synth = PassiveFeatureSynth(
                synth, data_dim=rc.model_cfg.n_bands,
                timesteps=rc.model_cfg.timesteps)
            print("[Synth] passive mode: on-device 5-feature extraction")

    out = train(rc, synth=synth, seed=args.seed, quiet=args.quiet,
                max_steps_per_epoch=args.max_steps_per_epoch,
                resume_from=args.resume)
    print("Training finished.")
    print("[Run dir]", out["run_dir"])


if __name__ == "__main__":
    main()

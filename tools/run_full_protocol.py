#!/usr/bin/env python
"""Run the reference's full experiment protocol at reference scale.

Protocol shape (generate_anechoic_data.py:22-27, conf/config.yaml:7-8):
72k train / 9k val / 9k test1 (training speech pool) / 9k test2 (UNSEEN
speech pool — the reference's TIMIT-TEST split), batch 64, 150 epochs.
Training data comes from the on-device synthesizer (no H5 precompute);
test1/test2 are fixed on-device splits built 1/3-1/3-1/3 by source count.

Per config this writes, under the run dir:
  logs_json/test_metrics.json            (runner's test1 pass, train-metric defs)
  evaluate_biear_metrics_test1.json      (per-n_src + degree AoA, pool A)
  evaluate_biear_metrics_test2.json      (same, UNSEEN pool B)

Usage (flagship + the paper's ablation axis):
  python tools/run_full_protocol.py --config conf/config.yaml
  python tools/run_full_protocol.py --config conf/config.yaml --fixed-q
  python tools/run_full_protocol.py --config conf/config_single_ctrl.yaml
Scale overrides (smoke test): --train-size 7200 --epochs 3 ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def predictions_on_device(params, cfg, dataset, model_kind="active"):
    """Run the forward over a SynthEvalDataset; pull ONLY the small
    prediction arrays host-side (the waveforms never cross the tunnel).
    Stacked same-shape batch groups run as ONE scanned dispatch each."""
    import jax
    from biear_tpu.models import (active_forward, auralnet_forward,
                                  passive_forward)
    from biear_tpu.train.losses import sanitize_x3, sanitize_wav

    passive = model_kind == "passive"
    n_in = 5 if passive else 3
    fwd = auralnet_forward if model_kind == "auralnet" else active_forward

    def _fwd(p, feats):
        if passive:
            # (x1, x2, x3, x4, x5) from PassiveFeatureSynth batches
            return passive_forward(p, cfg, *feats, train=False)[:3]
        wavL, wavR, x3 = feats
        wavL, wavR = sanitize_wav(wavL, wavR)
        return fwd(p, cfg, wavL, wavR, sanitize_x3(x3), train=False)[:3]

    @jax.jit
    def step(p, feats):
        return _fwd(p, feats)

    @jax.jit
    def stacked(p, batches):
        def body(_, b):
            return None, _fwd(p, b)

        _, (s, a, d) = jax.lax.scan(body, None, batches)
        return s, a, d

    souts, aouts, douts, ys = [], [], [], []
    if getattr(dataset, "stacked_groups", None):
        for g in dataset.stacked_groups:
            s, a, d = stacked(params, g[:n_in])
            nb, bs = g[0].shape[:2]
            souts.append(np.asarray(s).reshape(nb * bs, -1))
            aouts.append(np.asarray(a).reshape(nb * bs, -1))
            douts.append(np.asarray(d).reshape(nb * bs, 8, -1))
            ys.append(np.asarray(g[n_in]).reshape(nb * bs, -1))
    else:
        for batch in dataset.device_batches():
            y = batch[n_in]
            s, a, d = step(params, tuple(batch[:n_in]))
            souts.append(np.asarray(s)); aouts.append(np.asarray(a))
            douts.append(np.asarray(d)); ys.append(np.asarray(y))
    return (np.concatenate(souts), np.concatenate(aouts),
            np.concatenate(douts), np.concatenate(ys))


def full_metrics(s_all, a_all, d_all, y_all):
    """evaluate_biear-parity metrics: overall + per-n_src + degree AoA."""
    from biear_tpu.train.evaluate import (extract_gt_arrays,
                                          extract_pred_arrays,
                                          compute_metrics_like_train)
    sound_gt, aoa_gt_norm, aoa_gt_deg, dist_gt = extract_gt_arrays(y_all)
    sound_pred, aoa_pred_norm, aoa_pred_deg, dist_pred = extract_pred_arrays(
        s_all, a_all, d_all)
    out = {"overall": compute_metrics_like_train(
        sound_gt, sound_pred, aoa_gt_norm, aoa_pred_norm, dist_gt,
        dist_pred, aoa_gt_deg, aoa_pred_deg)}
    n_sources = (sound_gt > 0.5).sum(1)
    for n_src in (1, 2, 3):
        m = n_sources == n_src
        if m.sum():
            out[f"{n_src}spk"] = compute_metrics_like_train(
                sound_gt[m], sound_pred[m], aoa_gt_norm[m],
                aoa_pred_norm[m], dist_gt[m], dist_pred[m],
                aoa_gt_deg[m], aoa_pred_deg[m])
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="conf/config.yaml")
    ap.add_argument("--scene", default="anechoic",
                    choices=("anechoic", "auditorium", "spirit"))
    ap.add_argument("--train-size", type=int, default=72000)
    ap.add_argument("--eval-size", type=int, default=9000)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--fixed-q", action="store_true",
                    help="override FIXED_FRONTEND_Q: true (ablation)")
    ap.add_argument("--pool-size", type=int, default=256,
                    help="synthetic speech segments per pool")
    ap.add_argument("--corpus", default="noise",
                    choices=("noise", "speech"),
                    help="segment pool: 'noise' = modulated noise (round-2 "
                         "protocol; saturates), 'speech' = source-filter "
                         "speech-like corpus (data/speech.py) with disjoint "
                         "speaker sets per pool")
    ap.add_argument("--noise-snr", default=None,
                    help="mix diffuse noise at SNR ~ U[lo,hi] dB, e.g. "
                         "'5,25' (task-hardening; default off)")
    ap.add_argument("--fb-w-dtype", default=None,
                    choices=("float32", "bfloat16"),
                    help="filterbank W contraction dtype (FB_W_DTYPE): "
                         "bfloat16 = DEFAULT-matmul-precision numerics at "
                         "~3.6x lower hot-op cost (ops/filterbank.py), "
                         "float32 = HIGHEST-precision parity surface")
    ap.add_argument("--mix-dtype", default="float32",
                    choices=("float32", "bfloat16"),
                    help="anechoic fast-path HRIR-mix operand dtype "
                         "(SYNTH_MIX_DTYPE): bfloat16 = measured -16%% on "
                         "the synthesis chain at bf16 operand rounding; "
                         "float32 = the synthesis-oracle parity surface "
                         "(protocol default)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--runs-root", default=None)
    ap.add_argument("--comments", default=None)
    ap.add_argument("--resume", default=None, metavar="RUN_DIR",
                    help="continue an interrupted run from its "
                         "checkpoints/last (params + optimizer state + "
                         "epoch), then run the test1/test2 stages")
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax

    from biear_tpu.config import load_run_config
    from biear_tpu.data.synth import make_test_segments
    from biear_tpu.train.runner import train, SynthEvalDataset
    from tools.generate_binaural_data import build_synthesizer

    rc = load_run_config(args.config)
    if args.epochs is not None:
        rc.epochs = args.epochs
    if args.batch_size is not None:
        rc.batch_size = args.batch_size
    import dataclasses
    if args.fixed_q:
        rc.fixed_frontend_q = True
        # BiEARConfig is frozen (hashable for the constants lru_cache)
        rc.model_cfg = dataclasses.replace(rc.model_cfg,
                                           fixed_frontend_q=True)
    if args.fb_w_dtype:
        rc.model_cfg = dataclasses.replace(rc.model_cfg,
                                           fb_w_dtype=args.fb_w_dtype)
        rc.raw["FB_W_DTYPE"] = args.fb_w_dtype
    if args.runs_root:
        rc.runs_root = args.runs_root
    if args.comments is not None:
        rc.comments = args.comments
    rc.synth_on_device = True
    rc.raw["SYNTH_STEPS_PER_EPOCH"] = max(args.train_size // rc.batch_size, 1)
    rc.raw["SYNTH_EVAL_SAMPLES"] = args.eval_size

    # Pool A = "TIMIT TRAIN" stand-in (train/val/test1); pool B = unseen
    # speakers ("TIMIT TEST", generate_anechoic_data.py:22-27). The speech
    # corpus seeds namespace speaker sets too, so pool B is a true
    # new-speakers split.
    if args.corpus == "speech":
        from biear_tpu.data.speech import make_speech_pool
        import time as _time
        t0 = _time.time()
        # seg_len = fs + 7*128: per-use random window offsets (the
        # reference's generate_anechoic_data.py:91-108 richness) while
        # keeping the synthesizer's fast window-gather path (n_q <= 8)
        seg_len = rc.model_cfg.fs + 7 * 128
        pool_a = make_speech_pool(args.pool_size, seg_len=seg_len,
                                  fs=rc.model_cfg.fs, seed=args.seed + 1)
        pool_b = make_speech_pool(args.pool_size, seg_len=seg_len,
                                  fs=rc.model_cfg.fs, seed=args.seed + 9999)
        print(f"[protocol] speech pools built: 2 x {args.pool_size} segs "
              f"in {_time.time()-t0:.0f}s")
    else:
        pool_a = make_test_segments(args.pool_size, seed=args.seed + 1)
        pool_b = make_test_segments(args.pool_size, seed=args.seed + 9999)
    snr = (tuple(float(x) for x in args.noise_snr.split(","))
           if args.noise_snr else None)
    def _wrap(s):
        if rc.model_kind != "passive":
            return s
        # passive family: the reference's offline 5-feature precompute
        # (create_h5_data/data_save.py:122-164) computed on-device
        from biear_tpu.data.passive_synth import PassiveFeatureSynth
        return PassiveFeatureSynth(s, data_dim=rc.model_cfg.n_bands,
                                   timesteps=rc.model_cfg.timesteps)

    synth_a = _wrap(build_synthesizer(args.scene, None, pool_a,
                                      rc.model_cfg.fs,
                                      num_lags=rc.model_cfg.n_bands,
                                      noise_snr_db=snr,
                                      mix_dtype=args.mix_dtype))

    print(f"[protocol] {args.train_size} train x {rc.epochs} epochs, "
          f"bs={rc.batch_size}, eval={args.eval_size}, scene={args.scene}, "
          f"fixed_q={rc.fixed_frontend_q}, ctrl={rc.controller_mode}, "
          f"corpus={args.corpus}(x{args.pool_size}), noise_snr={snr}")
    out = train(rc, synth=synth_a, seed=args.seed,
                resume_from=args.resume)
    run_dir = out["run_dir"]
    params = out["params"]

    # test1 = pool A, fresh seed; test2 = UNSEEN pool B. Both 1/3-1/3-1/3.
    synth_b = _wrap(build_synthesizer(args.scene, None, pool_b,
                                      rc.model_cfg.fs,
                                      num_lags=rc.model_cfg.n_bands,
                                      noise_snr_db=snr,
                                      mix_dtype=args.mix_dtype))
    for name, synth, seed_off in (("test1", synth_a, 777),
                                  ("test2", synth_b, 888)):
        ds = SynthEvalDataset(synth, args.eval_size, args.seed + seed_off,
                              rc.batch_size, test_thirds=True)
        preds = predictions_on_device(params, rc.model_cfg, ds,
                                      rc.model_kind)
        metrics = full_metrics(*preds)
        path = os.path.join(run_dir, f"evaluate_biear_metrics_{name}.json")
        with open(path, "w") as f:
            json.dump(metrics, f, indent=2)
        o = metrics["overall"]
        print(f"[{name}] sound_acc={o['sound_acc']*100:.2f}% "
              f"aoa_mae={o['aoa_mae']:.4f} ({o['aoa_mae_deg']:.2f} deg, "
              f"masked {o['aoa_mae_deg_masked']:.2f} deg) "
              f"dist_acc={o['dist_acc']*100:.2f}%")
    print("[protocol] done:", run_dir)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-SNR evaluation of trained protocol checkpoints.

The adaptive-Q hypothesis (the reference paper's central claim) is that a
controllable filter bandwidth helps most when the input is degraded — so
the honest way to read the round-3 adaptive-vs-fixed-Q gap is sliced by
noise level, not just pooled over SNR ~ U[5, 25] dB. This tool rebuilds
the protocol's UNSEEN test2 pool (speech pool B, seed+9999; split seed
+888 — tools/run_full_protocol.py) at a list of FIXED SNRs plus a clean
slice, evaluates each checkpoint on every slice, and writes one JSON.

Accepts either live run dirs (checkpoints/best) or archived
docs/protocol_r3/<label>/ dirs (best.pth + settings.json).

Usage:
  python tools/eval_by_snr.py docs/protocol_r3/flagship-s1 \
      docs/protocol_r3/fixedq-s1 --seed 1 \
      --out docs/protocol_r3/snr_breakdown.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_checkpoint(d: str) -> str:
    for cand in (os.path.join(d, "best.pth"),
                 os.path.join(d, "checkpoints", "best")):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(f"no best.pth or checkpoints/best under {d}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dirs", nargs="+",
                    help="run dirs or archived label dirs (need "
                         "settings.json[+meta/] and best checkpoint)")
    ap.add_argument("--snrs", default="5,10,15,20,25",
                    help="comma list of fixed SNRs in dB; a clean "
                         "(no-noise) slice is always added")
    ap.add_argument("--eval-size", type=int, default=4500)
    ap.add_argument("--pool-size", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0,
                    help="protocol seed of the runs (fleet: s0=0, s1=1)")
    ap.add_argument("--scene", default="anechoic",
                    choices=("anechoic", "auditorium", "spirit"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    from biear_tpu.config import config_from_settings
    from biear_tpu.data.speech import make_speech_pool
    from biear_tpu.train.evaluate import load_params
    from biear_tpu.train.runner import SynthEvalDataset
    from tools.generate_binaural_data import build_synthesizer
    from tools.run_full_protocol import predictions_on_device, full_metrics

    snrs = [float(s) for s in args.snrs.split(",") if s]

    results: dict = {"seed": args.seed, "eval_size": args.eval_size,
                     "pool": "B (unseen speakers, seed+9999)",
                     "split_seed_offset": 888, "runs": {}}

    # load every checkpoint up front (each slice's synthesis is the
    # expensive part — build it once and run all checkpoints over it)
    models = []
    for d in args.run_dirs:
        sp = os.path.join(d, "meta", "settings.json")
        if not os.path.exists(sp):
            sp = os.path.join(d, "settings.json")
        with open(sp) as f:
            settings = json.load(f)
        cfg, _, _ = config_from_settings(settings)
        kind = str(settings.get("MODEL_KIND", "active"))
        params = load_params(find_checkpoint(d), cfg, kind)
        label = os.path.basename(os.path.normpath(d))
        models.append((label, settings, cfg, kind, params))
        results["runs"][label] = {}

    bss = {int(s.get("BATCH_SIZE", 64)) for _, s, _, _, _ in models}
    if len(bss) != 1:
        raise SystemExit(f"runs disagree on BATCH_SIZE ({bss}); the "
                         f"split would differ per run — evaluate "
                         f"separately")
    bs = bss.pop()
    cfg0 = models[0][2]
    seg_len = cfg0.fs + 7 * 128  # matches run_full_protocol.py
    pool_b = make_speech_pool(args.pool_size, seg_len=seg_len,
                              fs=cfg0.fs, seed=args.seed + 9999)

    for snr in snrs + [None]:
        tag = "clean" if snr is None else f"{snr:g}dB"
        synth = build_synthesizer(
            args.scene, None, pool_b, cfg0.fs, num_lags=cfg0.n_bands,
            noise_snr_db=None if snr is None else (snr, snr))
        ds = SynthEvalDataset(synth, args.eval_size, args.seed + 888,
                              bs, test_thirds=True)
        for label, _, cfg, kind, params in models:
            m = full_metrics(*predictions_on_device(params, cfg, ds, kind))
            o = m["overall"]
            results["runs"][label][tag] = {
                "sound_acc": o["sound_acc"],
                "aoa_mae_deg_masked": o["aoa_mae_deg_masked"],
                "dist_acc": o["dist_acc"]}
            print(f"[{label} @ {tag}] sound_acc={o['sound_acc']*100:.2f}% "
                  f"masked AoA={o['aoa_mae_deg_masked']:.2f} deg "
                  f"dist_acc={o['dist_acc']*100:.2f}%")

    out = args.out or "docs/protocol_r3/snr_breakdown.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()

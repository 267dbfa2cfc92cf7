#!/usr/bin/env python
"""Inference CLI: stereo wav(s) in -> per-sector localisation JSON out.

The serving-path complement to train_biear.py / evaluate_biear.py: loads a
checkpoint (an orbax run checkpoint dir, a run dir, or a reference-format
torch .pth — same resolution rules as the evaluator), batches the input
files, runs ONE jitted forward, and prints per-file predictions:

  {"file": ..., "sectors": [{"sector": 0, "present": 0.97,
    "aoa_deg": 23.4, "distance": "1m", "dist_probs": [...]}, ...]}

Sector s spans [45*s, 45*(s+1)) degrees; AoA is reported in world degrees
(sector start + normalised in-sector AoA * 45, evaluate_biear.py:209-242).
Distance classes follow the reference H5 label convention
(data_save.py:108): 0 = no source, 1..4 = {0.5, 1, 2, 3} m prototypes.

Input audio: stereo wav, any sample rate (resampled to the model's fs via
polyphase), int16 or float; exactly 1 s is used (leading crop, zero-pad if
short) to match the training segment length.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIST_NAMES = ["none", "0.5m", "1m", "2m", "3m"]


def read_stereo_wav(path: str, fs: int):
    """(left, right) float32 at fs, exactly fs samples each."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    rate, data = wavfile.read(path)
    if data.ndim == 1:
        raise ValueError(f"{path}: mono wav — the model is binaural; "
                         "provide stereo (L=ear L, R=ear R)")
    if np.issubdtype(data.dtype, np.integer):
        data = data.astype(np.float32) / 32768.0
    else:
        data = data.astype(np.float32)
    if rate != fs:
        data = resample_poly(data, fs, rate, axis=0).astype(np.float32)
    out = np.zeros((fs, 2), np.float32)
    n = min(fs, data.shape[0])
    out[:n] = data[:n, :2]
    return out[:, 0], out[:, 1]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="run dir, checkpoints/<name> dir, or torch .pth")
    ap.add_argument("wavs", nargs="+", help="stereo wav files")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="presence probability threshold for the summary")
    ap.add_argument("--out", default=None, help="write JSONL here instead "
                    "of stdout")
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    import jax
    import jax.numpy as jnp

    from biear_tpu.config import (load_settings_near_checkpoint,
                                  config_from_settings,
                                  apply_matmul_precision)
    from biear_tpu.models import active_forward, auralnet_forward
    from biear_tpu.ops.xcorr import cross_correlation_feature
    from biear_tpu.train.evaluate import load_params
    from biear_tpu.train.losses import sanitize_wav, sanitize_x3

    ckpt = args.checkpoint
    if os.path.isdir(ckpt) and os.path.isdir(
            os.path.join(ckpt, "checkpoints")):
        for name in ("best", "last"):
            cand = os.path.join(ckpt, "checkpoints", name)
            if os.path.isdir(cand):
                ckpt = cand
                break
    settings = load_settings_near_checkpoint(ckpt)
    if settings is None:
        raise SystemExit("no meta/settings.json found near the checkpoint")
    cfg, _, s = config_from_settings(settings)
    apply_matmul_precision(s.get("MATMUL_PRECISION", "default"))
    if not bool(s.get("Active", True)):
        raise SystemExit("infer.py serves the active (waveform-in) models; "
                         "the passive model needs precomputed features — "
                         "use evaluate_biear.py")
    model_kind = str(s.get("MODEL_KIND", "active"))
    params = load_params(ckpt, cfg, model_kind)
    fwd = auralnet_forward if model_kind == "auralnet" else active_forward

    wavL = np.stack([read_stereo_wav(p, cfg.fs)[0] for p in args.wavs])
    wavR = np.stack([read_stereo_wav(p, cfg.fs)[1] for p in args.wavs])

    @jax.jit
    def predict(p, wavL, wavR):
        wavL, wavR = sanitize_wav(wavL, wavR)
        x3 = sanitize_x3(cross_correlation_feature(
            wavL, wavR, cfg.fs, num_lags=cfg.n_bands))
        sound, aoa, dist, _ = fwd(p, cfg, wavL, wavR, x3, train=False)
        return (jax.nn.sigmoid(sound), aoa,
                jax.nn.softmax(dist, axis=-1))

    probs, aoa, distp = (np.asarray(a) for a in
                         predict(params, jnp.asarray(wavL),
                                 jnp.asarray(wavR)))

    sink = open(args.out, "w") if args.out else sys.stdout
    for i, path in enumerate(args.wavs):
        sectors = []
        for sct in range(probs.shape[1]):
            dc = int(distp[i, sct].argmax())
            sectors.append({
                "sector": sct,
                "present": round(float(probs[i, sct]), 4),
                "aoa_deg": round(45.0 * sct + 45.0 * float(aoa[i, sct]), 2),
                "distance": DIST_NAMES[dc],
                "dist_probs": [round(float(x), 4) for x in distp[i, sct]],
            })
        detected = [s2 for s2 in sectors if s2["present"] >= args.threshold]
        rec = {"file": path, "n_detected": len(detected),
               "detected": [{k: s2[k] for k in
                             ("sector", "present", "aoa_deg", "distance")}
                            for s2 in detected],
               "sectors": sectors}
        sink.write(json.dumps(rec) + "\n")
    if args.out:
        sink.close()
        print(f"wrote {len(args.wavs)} predictions to {args.out}")


if __name__ == "__main__":
    main()

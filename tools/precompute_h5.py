#!/usr/bin/env python
"""Build training H5s — the reference's create_h5_data pipeline, rebuilt.

Two sources:
  * --from-dir: a directory of {name}.npz (+ referenced .wav) pairs as
    written by the binaural generation scripts (reference
    precompute_h5.py / data_save.py) -> active and/or passive H5;
  * --synth: the on-device synthesizer (no offline corpus needed) ->
    active and/or passive H5 with fully batched feature extraction.

The passive features (x1/x2 mag dB, x4/x5 phase) come from the BATCHED
on-device extractor (biear_tpu.ops.features.passive_features) instead of
the reference's per-file ProcessPoolExecutor loop (data_save.py:195-236).
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_wav(path):
    from scipy.io import wavfile
    fs, audio = wavfile.read(path)
    if audio.dtype == np.int16:
        audio = audio.astype(np.float32) / 32768.0
    elif audio.dtype == np.int32:
        audio = audio.astype(np.float32) / 2147483648.0
    else:
        audio = audio.astype(np.float32)
    return audio, fs


def load_samples_from_dir(dataset_dir, max_samples=None):
    """npz/wav pairs -> (wavL (N, T), wavR, y (N, 56), fs)."""
    from biear_tpu.data.labels import build_label_from_npz_dict

    npz_files = sorted(glob.glob(os.path.join(dataset_dir, "*.npz")))
    if max_samples:
        npz_files = npz_files[:max_samples]
    if not npz_files:
        raise FileNotFoundError(f"no .npz files in {dataset_dir}")
    wavLs, wavRs, ys = [], [], []
    fs = None
    for p in npz_files:
        d = np.load(p, allow_pickle=True)
        wav_path = str(d["audio_path"])
        if not os.path.isabs(wav_path) or not os.path.exists(wav_path):
            cand = os.path.join(dataset_dir,
                                os.path.basename(str(d["audio_path"])))
            wav_path = cand if os.path.exists(cand) else wav_path
        audio, fs = _read_wav(wav_path)
        if audio.ndim == 1:
            left = right = audio
        else:
            left, right = audio[:, 0], audio[:, 1]
        wavLs.append(left.astype(np.float32))
        wavRs.append(right.astype(np.float32))
        ys.append(build_label_from_npz_dict(d))
    return np.stack(wavLs), np.stack(wavRs), np.stack(ys), fs


def build_active(wavL, wavR, y, fs, out_path, batch: int = 512):
    """x1/x2 = raw wavs, x3 = CC, y (data_save.py:122-164)."""
    import jax.numpy as jnp
    from biear_tpu.ops.xcorr import cross_correlation_feature
    from biear_tpu.data.h5io import save_active_h5

    ccs = []
    for s in range(0, len(wavL), batch):
        ccs.append(np.asarray(cross_correlation_feature(
            jnp.asarray(wavL[s:s + batch]), jnp.asarray(wavR[s:s + batch]),
            fs)))
    save_active_h5(out_path, wavL, wavR, np.concatenate(ccs), y)
    print(f"[active] wrote {len(wavL)} samples -> {out_path}")


def build_passive(wavL, wavR, y, fs, out_path, batch: int = 512):
    """x1/x2 mag dB, x3 CC, x4/x5 phase (the gt_group_phase schema)."""
    import jax.numpy as jnp
    from biear_tpu.ops.features import passive_features
    from biear_tpu.ops.xcorr import cross_correlation_feature
    from biear_tpu.data.h5io import save_passive_h5

    m1s, p1s, m2s, p2s, ccs = [], [], [], [], []
    for s in range(0, len(wavL), batch):
        l = jnp.asarray(wavL[s:s + batch])
        r = jnp.asarray(wavR[s:s + batch])
        m1, p1 = passive_features(l, fs)
        m2, p2 = passive_features(r, fs)
        m1s.append(np.asarray(m1)); p1s.append(np.asarray(p1))
        m2s.append(np.asarray(m2)); p2s.append(np.asarray(p2))
        ccs.append(np.asarray(cross_correlation_feature(l, r, fs)))
    save_passive_h5(out_path, np.concatenate(m1s), np.concatenate(m2s),
                    np.concatenate(ccs), np.concatenate(p1s),
                    np.concatenate(p2s), y)
    print(f"[passive] wrote {len(wavL)} samples -> {out_path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--from-dir", help="directory of npz/wav sample pairs")
    ap.add_argument("--synth", type=int, default=0,
                    help="synthesize N samples on-device instead")
    ap.add_argument("--sofa", default=None, help="HRIR SOFA for --synth")
    ap.add_argument("--n-src", type=int, default=None,
                    help="force source count (test splits)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-active", default=None)
    ap.add_argument("--out-passive", default=None)
    ap.add_argument("--max-samples", type=int, default=None)
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()

    if args.from_dir:
        wavL, wavR, y, fs = load_samples_from_dir(args.from_dir,
                                                  args.max_samples)
    elif args.synth:
        import jax
        from biear_tpu.data.synth import (AnechoicSynthesizer,
                                          make_test_hrir_bank,
                                          make_test_segments)
        if args.sofa:
            from tools.sofa_io import load_sofa_hrir
            ir, az, dist = load_sofa_hrir(args.sofa)
        else:
            ir, az, dist = make_test_hrir_bank()
        synth = AnechoicSynthesizer(ir, az, dist, make_test_segments(64))
        fs = 16000
        wavLs, wavRs, ys = [], [], []
        key = jax.random.PRNGKey(args.seed)
        bs = 256
        for s in range(0, args.synth, bs):
            key, k = jax.random.split(key)
            wl, wr, _, yy = synth.sample_batch(k, min(bs, args.synth - s),
                                               n_src=args.n_src)
            wavLs.append(np.asarray(wl)); wavRs.append(np.asarray(wr))
            ys.append(np.asarray(yy))
        wavL = np.concatenate(wavLs); wavR = np.concatenate(wavRs)
        y = np.concatenate(ys)
    else:
        ap.error("need --from-dir or --synth N")

    if args.out_active:
        build_active(wavL, wavR, y, fs, args.out_active)
    if args.out_passive:
        build_passive(wavL, wavR, y, fs, args.out_passive)
    if not (args.out_active or args.out_passive):
        ap.error("need --out-active and/or --out-passive")


if __name__ == "__main__":
    main()

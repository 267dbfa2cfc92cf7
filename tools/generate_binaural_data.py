#!/usr/bin/env python
"""Generate binaural datasets (wav + npz pairs) — the reference's
binaural_data_generation scripts, rebuilt on the on-device synthesizers.

Output format parity (generate_anechoic_data.py:266-281): per sample a
stereo {name}_{i:06d}.wav plus an .npz with audio_path, num_sources,
aoa_deg, distance_m, sector_id, sector_angle_norm, distance_class — so the
H5 precompute path (tools/precompute_h5.py --from-dir) consumes either the
reference's datasets or ours interchangeably.

Differences from the reference scripts (all deliberate):
  * the conv/mix/normalise inner loop runs batched on the accelerator
    instead of serial scipy (the 72k-sample train split is minutes, not
    hours);
  * scene: --scene anechoic uses an HRIR SOFA (or the built-in test bank);
    --scene room uses a BRIR SOFA + loudspeaker geometry (Auditorium3
    built in);
  * speech pool: a directory of mono wavs (PCM; NIST-sphere TIMIT needs
    prior conversion since libsndfile is not available here) or the
    built-in synthetic pool.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def collect_speech_pool(wav_dir, fs_target: int, seg_len_sec: float = 1.2,
                        max_files: int | None = None, seed: int = 0):
    """Mono wav dir -> (P, seg_len) float32 pool (resampled, cropped)."""
    from scipy.io import wavfile
    from scipy.signal import resample_poly

    paths = sorted(glob.glob(os.path.join(wav_dir, "**", "*.wav"),
                             recursive=True)
                   + glob.glob(os.path.join(wav_dir, "**", "*.WAV"),
                               recursive=True))
    if max_files:
        paths = paths[:max_files]
    if not paths:
        raise FileNotFoundError(f"no wavs under {wav_dir}")
    rng = np.random.default_rng(seed)
    seg_len = int(seg_len_sec * fs_target)
    pool = []
    for p in paths:
        try:
            fs, x = wavfile.read(p)
        except ValueError:
            continue            # e.g. NIST sphere masquerading as .wav
        if x.ndim > 1:
            x = x[:, 0]
        x = x.astype(np.float32)
        if x.dtype != np.float32 or np.abs(x).max() > 2.0:
            x = x / 32768.0
        if fs != fs_target:
            g = np.gcd(int(fs), int(fs_target))
            x = resample_poly(x, fs_target // g, fs // g)
        if len(x) < seg_len:
            continue
        start = rng.integers(0, len(x) - seg_len + 1)
        pool.append(x[start:start + seg_len].astype(np.float32))
    if not pool:
        raise RuntimeError("no usable speech segments found")
    return np.stack(pool)


def write_split(synth, out_dir, name, num: int, seed: int,
                test_thirds: bool, fs: int):
    """Synthesize `num` samples and write wav+npz pairs.

    test_thirds: first 1/3 forced 1-source, middle 2, last 3
    (generate_anechoic_data.py:251-264)."""
    import jax
    from scipy.io import wavfile
    from biear_tpu.train import unpack_targets

    os.makedirs(out_dir, exist_ok=True)
    third = num // 3
    key = jax.random.PRNGKey(seed)
    bs = 256
    i = 0
    while i < num:
        n = min(bs, num - i)
        if test_thirds:
            n_src = 1 if i < third else (2 if i < 2 * third else 3)
            n = min(n, (third - i % third) if third else n) or n
        else:
            n_src = None
        key, k = jax.random.split(key)
        wavL, wavR, _, y = synth.sample_batch(k, n, n_src=n_src)
        wavL, wavR, y = (np.asarray(a) for a in (wavL, wavR, y))
        ys, ya, yd = (np.asarray(a) for a in
                      unpack_targets(np.asarray(y)))
        for b in range(n):
            idx = i + b
            stereo = np.stack([wavL[b], wavR[b]], axis=1)
            wav_path = os.path.join(out_dir, f"{name}_{idx:06d}.wav")
            wavfile.write(wav_path, fs,
                          (np.clip(stereo, -1, 1) * 32767).astype(np.int16))
            secs = np.nonzero(ys[b] > 0.5)[0]
            np.savez(
                os.path.join(out_dir, f"{name}_{idx:06d}.npz"),
                audio_path=wav_path,
                num_sources=len(secs),
                aoa_deg=np.asarray([s * 45.0 + ya[b, s] * 45.0
                                    for s in secs], np.float32),
                distance_m=np.zeros(len(secs), np.float32),   # class-only
                sector_id=secs.astype(np.int64),
                sector_angle_norm=ya[b, secs].astype(np.float32),
                distance_class=(yd[b, secs].argmax(-1) - 1).astype(np.int64),
            )
        i += n
    print(f"[{name}] wrote {num} samples -> {out_dir}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", choices=("anechoic", "room"),
                    default="anechoic")
    ap.add_argument("--sofa", default=None, help="HRIR/BRIR SOFA file")
    ap.add_argument("--speech-dir", default=None,
                    help="directory of mono speech wavs")
    ap.add_argument("--out-root", required=True)
    ap.add_argument("--name", default="anechoic_train")
    ap.add_argument("--num", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--test-thirds", action="store_true",
                    help="force 1/3-1/3-1/3 source counts (test splits)")
    args = ap.parse_args()

    from biear_tpu.utils.platform import honor_platform_env
    honor_platform_env()
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)
    from biear_tpu.data.synth_reverb import (ReverbSynthesizer,
                                             make_test_brir_bank,
                                             AUDITORIUM3_SPEAKER_XY)

    fs = 16000
    segments = (collect_speech_pool(args.speech_dir, fs)
                if args.speech_dir else make_test_segments(64))

    if args.scene == "anechoic":
        if args.sofa:
            from tools.sofa_io import load_sofa_hrir
            ir, az, dist = load_sofa_hrir(args.sofa, fs)
        else:
            ir, az, dist = make_test_hrir_bank()
        synth = AnechoicSynthesizer(ir, az, dist, segments, fs=fs)
    else:
        if args.sofa:
            from tools.sofa_io import load_sofa_brir
            ir, view, _ = load_sofa_brir(args.sofa, fs)
            if view is not None and view.ndim == 2:
                yaw = np.degrees(np.arctan2(view[:, 1], view[:, 0])) % 360.0
            else:
                yaw = np.linspace(-90.0, 90.0, ir.shape[0]) % 360.0
            sxy = AUDITORIUM3_SPEAKER_XY[:ir.shape[2]]
        else:
            ir, yaw, sxy = make_test_brir_bank()
        synth = ReverbSynthesizer(ir, yaw, sxy, segments, fs=fs)

    write_split(synth, os.path.join(args.out_root, args.name), args.name,
                args.num, args.seed, args.test_thirds, fs)


if __name__ == "__main__":
    main()

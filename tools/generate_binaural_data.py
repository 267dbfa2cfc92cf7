#!/usr/bin/env python
"""Generate binaural datasets (wav + npz pairs) — the reference's
binaural_data_generation scripts, rebuilt on the on-device synthesizers.

Output format parity: per sample a stereo {name}_{i:06d}.wav plus an .npz
with audio_path, num_sources, aoa_deg, distance_m, sector_id,
sector_angle_norm, distance_class (generate_anechoic_data.py:266-281);
Spirit additionally gets the reference's debug fields speaker_id /
head_yaw_deg / head_index / dist_protos / other_thresh_m / other_class_id /
az_offset_deg / head_yaw_offset_deg (generate_spirit_data.py:380-404).
distance_m is the real per-source distance and distance_class the true
5-class id (including room scenes' class-4 "other"), so datasets written
here are drop-in substitutes for reference-written ones.

Scenes (one reference generator each):
  anechoic    HRIR SOFA or built-in test bank (generate_anechoic_data.py)
  auditorium  Auditorium3 BRIR + its 6-speaker geometry
              (generate_auditorium_data.py)
  spirit      Spirit room BRIR + its 3-speaker ~2 m geometry
              (generate_spirit_data.py)

Differences from the reference scripts (all deliberate): the conv/mix/
normalise inner loop runs batched on the accelerator instead of serial
scipy, and the speech pool is a directory of mono wavs (PCM or NIST-sphere
TIMIT via tools/sphere.py) or the built-in synthetic pool.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SECTOR_DEG = 45.0


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
            # NIST sphere masquerading as .wav (TIMIT ships these,
            # generate_anechoic_data.py:97 reads them via libsndfile)
            from tools.sphere import read_sphere
            try:
                fs, x = read_sphere(p)
            except ValueError:
                continue
        if x.ndim > 1:
            x = x[:, 0]
        x = x.astype(np.float32)
        if np.abs(x).max() > 2.0:
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


def _sector_label(az_deg: float):
    """(sector_id, norm_angle) from an azimuth in [0, 360)
    (generate_spirit_data.py aoa_to_sector_label)."""
    sec = int(min(max(np.floor(az_deg / N_SECTOR_DEG), 0), 7))
    return sec, float(min((az_deg - sec * N_SECTOR_DEG + 1e-3)
                          / N_SECTOR_DEG, 1.0))


def _anechoic_labels(synth, meta, b):
    """Per-source label dict from anechoic sampler metadata."""
    act = np.asarray(meta["active"][b]) > 0.5
    meas = np.asarray(meta["meas"][b]).astype(np.int64)[act]
    order = np.argsort(synth._sec_np[meas])
    meas = meas[order]
    az = synth._az_np[meas]
    fields = dict(
        num_sources=int(act.sum()),
        aoa_deg=az.astype(np.float32),
        distance_m=synth._dist_np[meas].astype(np.float32),
        sector_id=synth._sec_np[meas].astype(np.int64),
        sector_angle_norm=np.array([_sector_label(a)[1] for a in az],
                                   np.float32),
        distance_class=synth._dcls_np[meas].astype(np.int64),
    )
    return fields


def _room_labels(synth, meta, b, scene: str):
    """Per-source label dict from reverb sampler metadata; Spirit adds the
    reference's debug fields (generate_spirit_data.py:395-404)."""
    from biear_tpu.data.labels import DIST_CLASSES
    from biear_tpu.data.synth_reverb import OTHER_THRESH_M, OTHER_CLASS_ID

    act = np.asarray(meta["active"][b]) > 0.5
    spk = np.asarray(meta["speaker_id"][b]).astype(np.int64)[act]
    head = int(np.asarray(meta["head_index"][b]))
    rel = synth._rel_np[head, spk]
    order = np.argsort(rel // N_SECTOR_DEG)
    spk, rel = spk[order], rel[order]
    labels = [_sector_label(a) for a in rel]
    fields = dict(
        num_sources=int(act.sum()),
        aoa_deg=rel.astype(np.float32),
        distance_m=synth._sp_dist_np[spk].astype(np.float32),
        sector_id=np.array([l[0] for l in labels], np.int64),
        sector_angle_norm=np.array([l[1] for l in labels], np.float32),
        distance_class=synth._dcls_np[spk].astype(np.int64),
    )
    if scene == "spirit":
        fields.update(
            speaker_id=spk.astype(np.int64),
            head_yaw_deg=np.float32(synth._yaw_np[head]),
            head_index=np.int64(head),
            dist_protos=DIST_CLASSES.astype(np.float32),
            other_thresh_m=np.float32(OTHER_THRESH_M),
            other_class_id=np.int64(OTHER_CLASS_ID),
            az_offset_deg=np.float32(0.0),
            head_yaw_offset_deg=np.float32(0.0),
        )
    return fields


def write_split(synth, out_dir, name, num: int, seed: int,
                test_thirds: bool, fs: int, scene: str = "anechoic"):
    """Synthesize `num` samples and write wav+npz pairs.

    test_thirds: first 1/3 forced 1-source, middle 2, last 3
    (generate_anechoic_data.py:251-264)."""
    import jax
    from scipy.io import wavfile

    label_fn = (_anechoic_labels if scene == "anechoic"
                else lambda s, m, b: _room_labels(s, m, b, scene))
    os.makedirs(out_dir, exist_ok=True)
    third = num // 3
    key = jax.random.PRNGKey(seed)
    bs = 256
    i = 0
    while i < num:
        n = min(bs, num - i)
        if test_thirds and third:
            # chunks must not straddle third boundaries: each third is
            # generated with its own forced source count
            n_src = 1 if i < third else (2 if i < 2 * third else 3)
            boundary = third if i < third else (
                2 * third if i < 2 * third else num)
            n = min(n, boundary - i)
        else:
            n_src = None
        key, k = jax.random.split(key)
        wavL, wavR, _, _, meta = synth.sample_batch_meta(k, n, n_src=n_src)
        wavL, wavR = np.asarray(wavL), np.asarray(wavR)
        meta = {k2: np.asarray(v) for k2, v in meta.items()}
        for b in range(n):
            idx = i + b
            stereo = np.stack([wavL[b], wavR[b]], axis=1)
            wav_path = os.path.join(out_dir, f"{name}_{idx:06d}.wav")
            wavfile.write(wav_path, fs,
                          (np.clip(stereo, -1, 1) * 32767).astype(np.int16))
            np.savez(os.path.join(out_dir, f"{name}_{idx:06d}.npz"),
                     audio_path=wav_path, **label_fn(synth, meta, b))
        i += n
    print(f"[{name}] wrote {num} samples -> {out_dir}")


def build_synthesizer(scene: str, sofa: str | None, segments, fs: int,
                      num_lags: int = 100, noise_snr_db=None,
                      mix_dtype: str = "float32"):
    """Scene -> synthesizer, with scene-correct speaker geometry and the
    reference's 4-tier head-yaw extraction for room BRIRs.

    num_lags: CC-feature dimension; must equal the model's cc input width
    (100 in the canonical geometry, n_bands for scaled-down configs).
    mix_dtype: anechoic fast-path HRIR-mix operand dtype (SYNTH_MIX_DTYPE
    policy; room BRIRs use the FFT path, where the knob does not apply)."""
    from biear_tpu.data.synth import AnechoicSynthesizer, make_test_hrir_bank
    from biear_tpu.data.synth_reverb import (ReverbSynthesizer,
                                             make_test_brir_bank,
                                             scene_speaker_xy)

    if scene == "anechoic":
        if sofa:
            from tools.sofa_io import load_sofa_hrir
            ir, az, dist = load_sofa_hrir(sofa, fs)
        else:
            ir, az, dist = make_test_hrir_bank()
        return AnechoicSynthesizer(ir, az, dist, segments, fs=fs,
                                   num_lags=num_lags,
                                   noise_snr_db=noise_snr_db,
                                   mix_dtype=mix_dtype)

    if sofa:
        from tools.sofa_io import load_sofa_brir, extract_head_yaw
        ir, view, pos = load_sofa_brir(sofa, fs)
        yaw, tag = extract_head_yaw(view, pos, ir.shape[0])
        print(f"[SOFA] head yaw axis source: {tag}")
        sxy = scene_speaker_xy(scene, ir.shape[2])
    else:
        sxy = scene_speaker_xy(scene, 3 if scene == "spirit" else 6)
        ir, yaw, sxy = make_test_brir_bank(speaker_xy=sxy)
    return ReverbSynthesizer(ir, yaw, sxy, segments, fs=fs,
                             num_lags=num_lags, noise_snr_db=noise_snr_db)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene",
                    choices=("anechoic", "room", "auditorium", "spirit"),
                    default="anechoic",
                    help="'room' is a legacy alias for 'auditorium'")
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
    from biear_tpu.data.synth import make_test_segments

    scene = "auditorium" if args.scene == "room" else args.scene
    fs = 16000
    segments = (collect_speech_pool(args.speech_dir, fs)
                if args.speech_dir else make_test_segments(64))
    synth = build_synthesizer(scene, args.sofa, segments, fs)
    write_split(synth, os.path.join(args.out_root, args.name), args.name,
                args.num, args.seed, args.test_thirds, fs, scene=scene)


if __name__ == "__main__":
    main()

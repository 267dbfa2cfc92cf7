#!/usr/bin/env python
"""Generate THIRD-PARTY golden fixtures for the offline feature library.

The reference's offline features are defined in terms of librosa
(utils.py:55-117: stft(center=False), amplitude_to_db) and the
`gammatone` package (utils.py:119-142: gtgram). Neither is installable in
the zero-egress build image, so tests/test_features.py certifies parity
with analytic oracles + self-derived goldens instead (see the comment
block there).

Run THIS script once on any machine that has `librosa` and `gammatone`
installed to produce the real third-party goldens:

    python tools/make_thirdparty_goldens.py

It writes tests/goldens/thirdparty_features.npz; commit it, and
tests/test_features.py::test_thirdparty_goldens_if_present stops
skipping and pins our implementations against the actual packages.

The waveform is read from tests/goldens/offline_features.npz (committed)
so both fixtures pin the exact same input.
"""

from __future__ import annotations

import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "goldens",
                   "thirdparty_features.npz")


def golden_wav() -> np.ndarray:
    return np.load(os.path.join(HERE, "..", "tests", "goldens",
                                "offline_features.npz"))["wav"]


def main() -> int:
    try:
        import librosa
    except ImportError:
        print("librosa not installed — run on a machine that has it")
        return 1
    try:
        from gammatone import gtgram as gt
    except ImportError:
        print("gammatone not installed — pip install gammatone")
        return 1

    wav = golden_wav()
    fs = 16000
    # utils.py:62-66 framing: win = hop = len // timesteps + pad to n_fft
    timesteps = 19
    hop = len(wav) // timesteps
    n_fft = 1024
    S = librosa.stft(wav.astype(np.float64), n_fft=n_fft, hop_length=hop,
                     win_length=hop, center=False)
    # utils.py:119-142 gtgram semantics: win_time = hop_time =
    # 1/timesteps (no overlap), f_min 50 Hz, ABSOLUTE dB
    # 20*log10(gt + 1e-8), then pad/truncate to exactly `timesteps`
    # frames — matching biear_tpu.ops.features.compute_gammatone_feature.
    data_dim, gt_timesteps = 32, 50
    win_t = 1.0 / gt_timesteps
    g = gt.gtgram(wav.astype(np.float64), fs, win_t, win_t, data_dim, 50.0)
    g_db = 20.0 * np.log10(g + 1e-8)
    if g_db.shape[1] < gt_timesteps:
        g_db = np.pad(g_db, ((0, 0), (0, gt_timesteps - g_db.shape[1])))
    else:
        g_db = g_db[:, :gt_timesteps]

    np.savez(OUT, wav=wav, stft_re=S.real.astype(np.float64),
             stft_im=S.imag.astype(np.float64),
             gtgram_db=g_db.astype(np.float64),
             n_fft=n_fft, hop=hop, win=hop,
             data_dim=data_dim, gt_timesteps=gt_timesteps,
             librosa_version=np.bytes_(librosa.__version__))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Offline feature library: the passive-mode mag/phase/CC features.

Capability parity with utils.py (the reference's L0 DSP library). NOTE the
deliberate family split documented in SURVEY.md §2.1: these offline
features use bw = 1.5 * ERB(fc) and fmax = fs/2 (utils.py:27-52), NOT the
in-model 1.019 * ERB / 0.9 * fs/2 family — offline features and the
in-model filterbank are different filter families in the reference, and we
preserve that.

The reference computes these per-utterance in numpy/librosa
(utils.py:233-388). Here the production path is `passive_features`: a
batched jnp implementation of the same STFT -> complex band integration,
vmappable over a whole split so the passive H5 build runs on-device. The
single-utterance numpy functions mirror the reference's API for parity
testing and scripting.
"""

from __future__ import annotations

import functools

import numpy as np

DATA_DIM = 100
TIMESTEPS = 19


# ---------------- filterbank construction (utils.py:27-52) ----------------

def build_gammatone_filterbank(fs, n_fft, n_band=DATA_DIM, fmin=50.0,
                               fmax=None):
    """Gaussian-envelope gammatone-like FB on STFT bins, bw = 1.5 * ERB."""
    if fmax is None:
        fmax = fs / 2.0
    freqs = np.linspace(0, fs / 2.0, n_fft // 2 + 1)
    e = lambda f: 21.4 * np.log10(4.37e-3 * f + 1.0)
    einv = lambda x: (10 ** (x / 21.4) - 1.0) / 4.37e-3
    centers = einv(np.linspace(e(fmin), e(fmax), n_band))
    H = np.zeros((n_band, freqs.size), dtype=np.float32)
    for i, fc in enumerate(centers):
        erb = 24.7 * (4.37e-3 * fc + 1.0)
        bw = 1.5 * erb
        H[i, :] = np.exp(-0.5 * ((freqs - fc) / bw) ** 2)
    H /= (H.sum(axis=1, keepdims=True) + 1e-8)
    return H


# ---------------- librosa-compatible STFT (center=False) ----------------

def _stft_params(n: int, timesteps: int):
    """hop = N // timesteps, win = hop, n_fft = next pow2 >= win
    (utils.py:68-77)."""
    hop = max(1, n // timesteps)
    win = hop
    n_fft = 1
    while n_fft < win:
        n_fft *= 2
    return n_fft, hop, win


def _padded_hann(win_length: int, n_fft: int):
    """Periodic Hann of win_length, centre-padded to n_fft (librosa's
    window handling for win_length < n_fft)."""
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    pad = n_fft - win_length
    lpad = pad // 2
    return np.pad(w, (lpad, pad - lpad)).astype(np.float32)


def stft_center_false(wav, n_fft: int, hop: int, win_length: int):
    """np STFT matching librosa.stft(..., center=False): frames of length
    n_fft starting at k*hop, windowed by the centre-padded Hann.
    Returns (n_freq, T) complex64."""
    wav = np.asarray(wav, np.float32)
    n = len(wav)
    t = 1 + (n - n_fft) // hop if n >= n_fft else 0
    w = _padded_hann(win_length, n_fft)
    frames = np.stack([wav[k * hop:k * hop + n_fft] for k in range(t)])
    return np.fft.rfft(frames * w, n=n_fft).T.astype(np.complex64)


# ---------------- passive feature extractors ----------------

def _pad_T(mag_db, phase, timesteps):
    T = mag_db.shape[1]
    if T < timesteps:
        pad = timesteps - T
        mag_db = np.pad(mag_db, ((0, 0), (0, pad)), constant_values=-80.0)
        phase = np.pad(phase, ((0, 0), (0, pad)), mode="edge")
    else:
        mag_db = mag_db[:, :timesteps]
        phase = phase[:, :timesteps]
    return mag_db, phase


def stft_gammatone_mag_phase(wav_1d, fs, data_dim=DATA_DIM,
                             timesteps=TIMESTEPS, fmin=50.0, fmax=None):
    """(T, B) mag dB + phase via complex band integration
    (utils.py:233-303; floor 1e-12)."""
    n_fft, hop, win = _stft_params(len(wav_1d), timesteps)
    S = stft_center_false(wav_1d, n_fft, hop, win)
    H = build_gammatone_filterbank(fs, n_fft, data_dim, fmin, fmax)
    bc = H @ S
    mag_db = 20.0 * np.log10(np.maximum(np.abs(bc), 1e-12))
    mag_db, phase = _pad_T(mag_db, np.angle(bc), timesteps)
    return mag_db.T.astype(np.float32), phase.T.astype(np.float32)


def compute_gammatone_mag_phase(wav_1d, fs, data_dim=DATA_DIM,
                                timesteps=TIMESTEPS, fmin=50.0, fmax=None):
    """Same pipeline with the 1e-10 magnitude floor (utils.py:305-388)."""
    n_fft, hop, win = _stft_params(len(wav_1d), timesteps)
    S = stft_center_false(wav_1d, n_fft, hop, win)
    H = build_gammatone_filterbank(fs, n_fft, data_dim, fmin, fmax)
    bc = H @ S
    mag_db = 20.0 * np.log10(np.maximum(np.abs(bc), 1e-10))
    mag_db, phase = _pad_T(mag_db, np.angle(bc), timesteps)
    return mag_db.T.astype(np.float32), phase.T.astype(np.float32)


def compute_gammatone_feature_stft(wav_1d, fs, data_dim=DATA_DIM,
                                   timesteps=TIMESTEPS, fmin=50.0, fmax=None):
    """Power-spectrum band energies in dB (utils.py:55-117)."""
    n_fft, hop, win = _stft_params(len(wav_1d), timesteps)
    S = stft_center_false(wav_1d, n_fft, hop, win)
    H = build_gammatone_filterbank(fs, n_fft, data_dim, fmin, fmax)
    band = np.maximum(H @ (np.abs(S) ** 2), 1e-12)
    db = 10.0 * np.log10(band)
    T = db.shape[1]
    if T < timesteps:
        db = np.pad(db, ((0, 0), (0, timesteps - T)), constant_values=-80.0)
    else:
        db = db[:, :timesteps]
    return db.T.astype(np.float32)


def compute_gammatone_feature(wav_1d, fs, data_dim=DATA_DIM,
                              timesteps=TIMESTEPS, fmin: float = 50.0):
    """gtgram-equivalent band-energy feature: true gammatone filterbank,
    per-window RMS energy in dB, (timesteps, data_dim).

    Capability parity with utils.py:119-142 (which uses the `gammatone`
    package, unavailable here; this uses scipy's IIR gammatone — same
    filter family, dB within normalisation of gtgram's integration)."""
    from scipy.signal import gammatone, lfilter

    wav = np.asarray(wav_1d, np.float32)
    e = lambda f: 21.4 * np.log10(4.37e-3 * f + 1.0)
    einv = lambda x: (10 ** (x / 21.4) - 1.0) / 4.37e-3
    centers = np.clip(einv(np.linspace(e(fmin), e(fs / 2.0), data_dim)),
                      1.0, fs / 2 - 1.0)
    n = len(wav)
    frame_len = max(1, n // timesteps)
    total = frame_len * timesteps
    wav = np.pad(wav, (0, max(0, total - n)))[:total]
    frames = wav.reshape(timesteps, frame_len)

    gt = np.zeros((data_dim, timesteps), np.float32)
    for b, fc in enumerate(centers):
        bc, ac = gammatone(fc, "iir", fs=fs)
        sub = lfilter(bc, ac, wav).reshape(timesteps, frame_len)
        gt[b] = np.sqrt(np.mean(sub ** 2, axis=1))
    feat = 20.0 * np.log10(gt + 1e-8)
    return feat.T.astype(np.float32)


def compute_gammatone_mag_phase_direct(wav_1d, fs, data_dim=DATA_DIM,
                                       timesteps=TIMESTEPS, fmin=50.0,
                                       fmax=None, order=4):
    """Time-domain scipy gammatone IIR + Hilbert route (utils.py:147-231):
    per-frame RMS dB + frame-centre phase."""
    from scipy.signal import gammatone, lfilter, hilbert

    if fmax is None:
        fmax = fs / 2.0
    wav = np.asarray(wav_1d, np.float32)
    e = lambda f: 21.4 * np.log10(4.37e-3 * f + 1.0)
    einv = lambda x: (10 ** (x / 21.4) - 1.0) / 4.37e-3
    centers = np.clip(einv(np.linspace(e(fmin), e(fmax), data_dim)),
                      1.0, fs / 2 - 1.0)
    n = len(wav)
    frame_len = max(1, n // timesteps)
    total = frame_len * timesteps
    wav = (np.pad(wav, (0, total - n)) if total > n else wav[:total])

    band_db = np.zeros((data_dim, timesteps), np.float32)
    band_ph = np.zeros((data_dim, timesteps), np.float32)
    for b, fc in enumerate(centers):
        bc, ac = gammatone(fc, "iir", fs=fs)
        analytic = hilbert(lfilter(bc, ac, wav))
        mag = np.maximum(np.abs(analytic), 1e-12)
        ph = np.angle(analytic)
        for t in range(timesteps):
            s = t * frame_len
            rms = np.sqrt(np.mean(mag[s:s + frame_len] ** 2))
            band_db[b, t] = 20.0 * np.log10(rms + 1e-12)
            ci = min(s + frame_len // 2, total - 1)
            band_ph[b, t] = ph[ci]
    return band_db.T, band_ph.T


# ---------------- batched on-device passive features ----------------

@functools.lru_cache(maxsize=None)
def _passive_consts(fs: int, n: int, timesteps: int, data_dim: int,
                    fmin: float, fmax):
    n_fft, hop, win = _stft_params(n, timesteps)
    H = build_gammatone_filterbank(fs, n_fft, data_dim, fmin, fmax)
    t = 1 + (n - n_fft) // hop if n >= n_fft else 0
    return n_fft, hop, t, _padded_hann(win, n_fft), H


def passive_features(wav, fs: int = 16000, data_dim: int = DATA_DIM,
                     timesteps: int = TIMESTEPS, fmin: float = 50.0,
                     fmax=None, mag_floor: float = 1e-12):
    """Batched jnp mag-dB + phase features: wav (B, N) ->
    (mag (B, T, D), phase (B, T, D)). Numerically matches
    stft_gammatone_mag_phase per-sample; runs the whole split as one
    device program for the H5 precompute path."""
    import jax
    import jax.numpy as jnp

    wav = jnp.asarray(wav, jnp.float32)
    B, n = wav.shape
    n_fft, hop, t, w, H = _passive_consts(fs, n, timesteps, data_dim,
                                          fmin, fmax)
    starts = np.arange(t) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    frames = wav[:, idx] * w                       # (B, t, n_fft)
    S = jnp.fft.rfft(frames, n=n_fft)              # (B, t, F)
    hp = jax.lax.Precision.HIGHEST
    bc_re = jnp.einsum("btf,df->btd", S.real, H, precision=hp)
    bc_im = jnp.einsum("btf,df->btd", S.imag, H, precision=hp)
    mag = jnp.sqrt(bc_re ** 2 + bc_im ** 2)
    mag_db = 20.0 * jnp.log10(jnp.maximum(mag, mag_floor))
    phase = jnp.arctan2(bc_im, bc_re)
    if t < timesteps:
        pad = timesteps - t
        mag_db = jnp.pad(mag_db, ((0, 0), (0, pad), (0, 0)),
                         constant_values=-80.0)
        phase = jnp.pad(phase, ((0, 0), (0, pad), (0, 0)), mode="edge")
    else:
        mag_db = mag_db[:, :timesteps]
        phase = phase[:, :timesteps]
    return mag_db, phase

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


# ------------- Slaney ERB filterbank (gtgram numerical parity) -------------
#
# The reference's compute_gammatone_feature (utils.py:119-142) calls
# gtgram() from the `gammatone` package, which is a direct transcription of
# Malcolm Slaney's "An Efficient Implementation of the Patterson-Holdsworth
# Auditory Filter Bank" (Apple TR #35, 1993) MATLAB code (ERBSpace /
# MakeERBFilters / ERBFilterBank). That package is not installable in this
# environment, so the SAME published algorithm is implemented here from the
# TR formulas — identical coefficients and cascade structure, hence
# numerically identical output (float64 lfilter) rather than a same-family
# substitute. tests/test_features.py pins the filters against the ANALYTIC
# 4th-order gammatone response (peak at cf, unit peak gain) and a committed
# golden fixture.

_EARQ, _MINBW = 9.26449, 24.7


def erb_space_slaney(low_freq: float, high_freq: float, num: int):
    """Slaney/Glasberg-Moore ERB-rate spaced centre frequencies,
    DESCENDING from high_freq to low_freq (ERBSpace.m; the `gammatone`
    package's centre_freqs)."""
    c = _EARQ * _MINBW
    return -c + np.exp(np.arange(1, num + 1) *
                       (-np.log(high_freq + c) + np.log(low_freq + c))
                       / num) * (high_freq + c)


def make_erb_filters(fs: float, centre_freqs, width: float = 1.0):
    """Slaney MakeERBFilters.m coefficient matrix, one row per filter:
    [A0 A11 A12 A13 A14 A2 B0 B1 B2 gain] (float64)."""
    T = 1.0 / fs
    cf = np.asarray(centre_freqs, np.float64)
    erb = width * ((cf / _EARQ) + _MINBW)
    B = 1.019 * 2.0 * np.pi * erb

    arg = 2.0 * cf * np.pi * T
    vec = np.exp(2j * arg)

    A0 = T
    A2 = 0.0
    B0 = 1.0
    B1 = -2.0 * np.cos(arg) / np.exp(B * T)
    B2 = np.exp(-2.0 * B * T)

    rt_pos = np.sqrt(3.0 + 2.0 ** 1.5)
    rt_neg = np.sqrt(3.0 - 2.0 ** 1.5)
    common = -T * np.exp(-(B * T))

    k11 = np.cos(arg) + rt_pos * np.sin(arg)
    k12 = np.cos(arg) - rt_pos * np.sin(arg)
    k13 = np.cos(arg) + rt_neg * np.sin(arg)
    k14 = np.cos(arg) - rt_neg * np.sin(arg)
    A11, A12, A13, A14 = (common * k for k in (k11, k12, k13, k14))

    gain_arg = np.exp(1j * arg - B * T)
    gain = np.abs(
        (vec - gain_arg * k11) * (vec - gain_arg * k12)
        * (vec - gain_arg * k13) * (vec - gain_arg * k14)
        * (T * np.exp(B * T)
           / (-1.0 / np.exp(B * T) + 1.0 + vec * (1.0 - np.exp(B * T))))
        ** 4)

    n = len(cf)
    fcoefs = np.zeros((n, 10), np.float64)
    fcoefs[:, 0] = A0
    fcoefs[:, 1] = A11
    fcoefs[:, 2] = A12
    fcoefs[:, 3] = A13
    fcoefs[:, 4] = A14
    fcoefs[:, 5] = A2
    fcoefs[:, 6] = B0
    fcoefs[:, 7] = B1
    fcoefs[:, 8] = B2
    fcoefs[:, 9] = gain
    return fcoefs


def erb_filterbank_slaney(wave, fcoefs):
    """ERBFilterBank.m: four cascaded 2nd-order sections per channel.
    wave (N,) -> (n_filters, N) float64."""
    from scipy.signal import lfilter

    wave = np.asarray(wave, np.float64)
    out = np.zeros((fcoefs.shape[0], wave.shape[0]), np.float64)
    for i, (A0, A11, A12, A13, A14, A2, B0, B1, B2, g) in enumerate(fcoefs):
        Bs = [B0, B1, B2]
        y = lfilter([A0 / g, A11 / g, A2 / g], Bs, wave)
        y = lfilter([A0, A12, A2], Bs, y)
        y = lfilter([A0, A13, A2], Bs, y)
        y = lfilter([A0, A14, A2], Bs, y)
        out[i] = y
    return out


def gtgram_slaney(wave, fs, window_time, hop_time, channels, f_min):
    """The `gammatone` package's gtgram(): Slaney filterbank -> power ->
    sqrt-mean over hop-strided windows. (channels, n_windows) float64."""
    cfs = erb_space_slaney(f_min, fs / 2.0, channels)
    bm = erb_filterbank_slaney(wave, make_erb_filters(fs, cfs))
    xe = bm ** 2
    nwin = int(round(window_time * fs))
    hop = int(round(hop_time * fs))
    cols = max(1 + int(np.floor((xe.shape[1] - nwin) / hop)), 0)
    y = np.zeros((channels, cols))
    for c in range(cols):
        y[:, c] = np.sqrt(xe[:, c * hop:c * hop + nwin].mean(axis=1))
    return y


def compute_gammatone_feature(wav_1d, fs, data_dim=DATA_DIM,
                              timesteps=TIMESTEPS, fmin: float = 50.0):
    """gtgram band-energy feature, (timesteps, data_dim) — numerical
    parity with utils.py:119-142: win_time = hop_time = 1/timesteps,
    gtgram via the Slaney algorithm above, 20*log10(gt + 1e-8),
    pad/truncate to exactly `timesteps` frames."""
    wav = np.asarray(wav_1d, np.float32)
    win_time = 1.0 / timesteps
    gt = gtgram_slaney(wav, fs, win_time, win_time, data_dim, fmin)
    gt = 20.0 * np.log10(gt + 1e-8)
    if gt.shape[1] < timesteps:
        gt = np.pad(gt, ((0, 0), (0, timesteps - gt.shape[1])),
                    mode="constant")
    elif gt.shape[1] > timesteps:
        gt = gt[:, :timesteps]
    return gt.T.astype(np.float32)


def compute_gammatone_mag_phase_direct(wav_1d, fs, data_dim=DATA_DIM,
                                       timesteps=TIMESTEPS, fmin=50.0,
                                       fmax=None, order=4):
    """Time-domain scipy gammatone IIR + Hilbert route (utils.py:147-231):
    per-frame RMS dB + "frame-centre" phase.

    Phase-index quirk reproduced for parity: the reference indexes its
    per-frame phase SLICE with the ABSOLUTE sample index
    ``start + frame_len//2`` and clamps to the slice end
    (utils.py:218-221) — so frame 0 really samples the frame centre, but
    every later frame samples the LAST point of the frame."""
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
            # absolute index into the local frame slice, clamped —
            # frame 0 hits the centre, frames >= 1 the frame end
            ci = min(s + frame_len // 2, frame_len - 1)
            band_ph[b, t] = ph[s + ci]
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

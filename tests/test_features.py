"""Offline feature library tests: numpy vs batched-jnp path equivalence,
STFT frame semantics, and physics sanity."""

import numpy as np
import pytest

import jax.numpy as jnp

from biear_tpu.ops.features import (
    compute_gammatone_feature,
    build_gammatone_filterbank, stft_center_false, _stft_params,
    stft_gammatone_mag_phase, compute_gammatone_mag_phase,
    compute_gammatone_feature_stft, compute_gammatone_mag_phase_direct,
    passive_features,
)


def test_stft_params_canonical():
    # 16000 samples / 19 timesteps -> hop 842, n_fft 1024, 18 real frames.
    n_fft, hop, win = _stft_params(16000, 19)
    assert (n_fft, hop, win) == (1024, 842, 842)
    assert 1 + (16000 - n_fft) // hop == 18


def test_offline_fb_family_is_wider_than_model_fb():
    """The offline FB uses bw = 1.5 ERB and fmax = fs/2 — a DIFFERENT
    family from the in-model 1.019 ERB / 0.9 fs/2 (SURVEY.md §2.1)."""
    H = build_gammatone_filterbank(16000, 1024)
    assert H.shape == (100, 513)
    np.testing.assert_allclose(H.sum(1), 1.0, atol=1e-3)
    from biear_tpu.models.frontend import frontend_constants
    from biear_tpu.models.config import BiEARConfig
    W = frontend_constants(BiEARConfig())["W_fixed"]
    # Wider filters spread mass further: compare peak heights per band.
    assert H[50].max() < np.asarray(W)[50].max()


def test_stft_center_false_matches_manual_dft(rng):
    wav = rng.standard_normal(6000).astype(np.float32)
    n_fft, hop, win = _stft_params(len(wav), 19)
    S = stft_center_false(wav, n_fft, hop, win)
    assert S.shape[0] == n_fft // 2 + 1
    # Frame 3 by hand: samples [3*hop, 3*hop + n_fft) times padded window.
    w = np.zeros(n_fft)
    hann = 0.5 * (1 - np.cos(2 * np.pi * np.arange(win) / win))
    lpad = (n_fft - win) // 2
    w[lpad:lpad + win] = hann
    want = np.fft.rfft(wav[3 * hop:3 * hop + n_fft] * w)
    np.testing.assert_allclose(S[:, 3], want, atol=1e-3)


def test_mag_phase_variants_and_padding(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    m1, p1 = stft_gammatone_mag_phase(wav, 16000)
    m2, p2 = compute_gammatone_mag_phase(wav, 16000)
    assert m1.shape == (19, 100) and p1.shape == (19, 100)
    # last frame is the -80 dB / edge-phase pad (18 real frames)
    assert np.allclose(m1[18], -80.0)
    np.testing.assert_array_equal(p1[18], p1[17])
    # the two variants differ only in the magnitude floor
    np.testing.assert_allclose(m1[:18], m2[:18], atol=1e-4)
    np.testing.assert_allclose(p1, p2, atol=1e-6)


def test_power_feature(rng):
    wav = rng.standard_normal(16000).astype(np.float32)
    f = compute_gammatone_feature_stft(wav, 16000)
    assert f.shape == (19, 100) and np.isfinite(f).all()
    assert np.allclose(f[18], -80.0)


def test_passive_features_match_per_sample_numpy(rng):
    """The batched f32 path vs the per-sample numpy path (which rides
    numpy's float64 FFT). Deep spectral nulls legitimately differ by many
    dB between f32 and f64 FFTs, so compare where the band output carries
    energy (> -60 dB)."""
    wavs = rng.standard_normal((3, 16000)).astype(np.float32)
    mag, phase = passive_features(jnp.asarray(wavs), 16000)
    assert mag.shape == (3, 19, 100)
    for b in range(3):
        m_np, p_np = stft_gammatone_mag_phase(wavs[b], 16000)
        m_j = np.asarray(mag[b])
        p_j = np.asarray(phase[b])
        # On noise, wide bands coherently cancel (complex sum of many
        # random phasors), so much of the map sits near the floor — an
        # intrinsic property of the reference's H @ S feature definition.
        sig = m_np > -60.0
        assert sig.mean() > 0.15         # non-vacuous comparison
        np.testing.assert_allclose(m_j[sig], m_np[sig], atol=2e-2)
        sig18 = sig[:18]
        dphi = np.angle(np.exp(1j * (p_j[:18][sig18] - p_np[:18][sig18])))
        assert np.abs(dphi).max() < 2e-2
        # padded frame exactly -80 in both paths
        assert np.allclose(m_j[18], -80.0) and np.allclose(m_np[18], -80.0)


def test_power_feature_tone_peak():
    """Band-energy physics on the POWER feature (H @ |S|^2). The complex
    mag/phase feature (H @ S) is NOT band energy — for an on-bin tone the
    coherent sum over the Hann main lobe cancels almost exactly (it
    measures a filtered time sample at the frame start). That is the
    reference's definition (utils.py:277) and we reproduce it; only the
    power variant peaks at the tone's band."""
    t = np.arange(16000) / 16000
    wav = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
    f = compute_gammatone_feature_stft(wav, 16000)
    e = lambda x: 21.4 * np.log10(4.37e-3 * x + 1.0)
    einv = lambda x: (10 ** (x / 21.4) - 1.0) / 4.37e-3
    centers = einv(np.linspace(e(50.0), e(8000.0), 100))
    band = int(f[5].argmax())
    assert abs(centers[band] - 2000.0) < 300.0
    # and the complex-integration cancellation is real: the mag feature at
    # the tone band sits far below the power feature's peak
    mag, _ = passive_features(jnp.asarray(wav[None]), 16000)
    assert float(np.asarray(mag)[0, 5, band]) < -60.0


def test_direct_gammatone_route(rng):
    wav = rng.standard_normal(4000).astype(np.float32)
    m, p = compute_gammatone_mag_phase_direct(wav, 8000, data_dim=12,
                                              timesteps=5)
    assert m.shape == (5, 12) and p.shape == (5, 12)
    assert np.isfinite(m).all() and (np.abs(p) <= np.pi).all()


def test_gtgram_equivalent_feature(rng):
    wav = rng.standard_normal(4000).astype(np.float32)
    f = compute_gammatone_feature(wav, 8000, data_dim=12, timesteps=5)
    assert f.shape == (5, 12) and np.isfinite(f).all()
    # a 1 kHz tone's energy must peak near the 1 kHz band
    t = np.arange(8000) / 8000
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    ft = compute_gammatone_feature(tone, 8000, data_dim=24, timesteps=5)
    e = lambda x: 21.4 * np.log10(4.37e-3 * x + 1.0)
    einv = lambda x: (10 ** (x / 21.4) - 1.0) / 4.37e-3
    centers = einv(np.linspace(e(50.0), e(4000.0), 24))
    assert abs(centers[int(ft[2].argmax())] - 1000.0) < 250.0

"""Binaural cross-correlation feature (the x3 input).

The reference computes a full O(N^2) np.correlate over the 16000-sample
ears, crops to +/-3 ms, peak-normalises and linearly resamples to 100 lags
(utils.py:390-420). TPU-native restructure:

  * the correlation runs as an FFT product (O(N log N)), batched over the
    whole minibatch in one rfft/irfft pair;
  * only the +/-max_lag window of the circular correlation is gathered;
  * the lag crop and the np.interp resampling grid depend only on static
    (fs, N, num_lags) so they collapse to a precomputed sparse linear map
    applied as two gathers + a fused multiply-add.

Numerically identical to the reference up to float32 accumulation order.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _lag_plan(n: int, fs: int, num_lags: int, max_lag_ms: float):
    """Static crop + interp plan, computed in float64 exactly like the oracle.

    Replicates utils.py:405-418: lags = arange(-n+1, n)/fs, mask to the
    +/- max_lag_sec window, then np.interp onto linspace(-mls, mls, num_lags).
    Returns (kept integer lags, interp left-index, interp weights).
    """
    lags = np.arange(-n + 1, n, dtype=np.int64) / float(fs)
    mls = max_lag_ms * 1e-3
    mask = np.logical_and(lags >= -mls, lags <= mls)
    kept = np.nonzero(mask)[0] - (n - 1)          # integer sample lags kept
    lags_crop = lags[mask]
    target = np.linspace(-mls, mls, num_lags)
    # np.interp with sorted xp reduces to: find right neighbour, lerp.
    j = np.searchsorted(lags_crop, target, side="left")
    j = np.clip(j, 1, len(lags_crop) - 1)
    x0, x1 = lags_crop[j - 1], lags_crop[j]
    w = (target - x0) / (x1 - x0)
    # Exact-endpoint handling identical to np.interp (clips outside range).
    w = np.clip(w, 0.0, 1.0)
    return kept.astype(np.int64), (j - 1).astype(np.int64), w.astype(np.float32)


def cross_correlation_feature(left, right, fs: int, num_lags: int = 100,
                              max_lag_ms: float = 3.0):
    """Batched CC feature: left, right (B, N) -> (B, num_lags) float32.

    corr[l] = sum_m left[m + l] * right[m]  (after mean removal), matching
    np.correlate(left, right, "full") at the kept lags.
    """
    if left.ndim == 1:
        return cross_correlation_feature(left[None], right[None], fs,
                                         num_lags, max_lag_ms)[0]
    B, n = left.shape
    kept, j0, w = _lag_plan(n, fs, num_lags, max_lag_ms)
    max_kept = int(np.max(np.abs(kept)))
    kept = jnp.asarray(kept)
    j0 = jnp.asarray(j0)
    w = jnp.asarray(w)

    lf = left - jnp.mean(left, axis=-1, keepdims=True)
    rf = right - jnp.mean(right, axis=-1, keepdims=True)

    # Linear cross-correlation via zero-padded FFT. Exactness needs only
    # fft_len >= n + max|kept lag|, not the full 2n-1: circular wrap at a
    # kept lag l aliases in corr(l - fft_len), and for length-n signals
    # every lag with |lag| > fft_len - n has ZERO overlap. Since the kept
    # window is +/-3 ms (48 samples at 16 kHz), this halves the FFT to
    # 16384 — the CC is the dominant FFT cost of the fused
    # synthesize->train pipeline (tools/bench_breakdown.py).
    fft_len = 1
    while fft_len < n + max_kept:
        fft_len *= 2
    L = jnp.fft.rfft(lf, n=fft_len)
    R = jnp.fft.rfft(rf, n=fft_len)
    corr = jnp.fft.irfft(L * jnp.conj(R), n=fft_len)     # (B, fft_len)
    # corr[l mod fft_len] = sum_m left[m+l] right[m]; gather the kept lags.
    cc_crop = corr[:, jnp.mod(kept, fft_len)]            # (B, n_kept)

    peak = jnp.max(jnp.abs(cc_crop), axis=-1, keepdims=True) + 1e-8
    cc_crop = cc_crop / peak

    c0 = cc_crop[:, j0]
    c1 = cc_crop[:, j0 + 1]
    return (c0 + w[None, :] * (c1 - c0)).astype(jnp.float32)

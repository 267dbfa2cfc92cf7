"""Binaural cross-correlation feature (the x3 input).

The reference computes a full O(N^2) np.correlate over the 16000-sample
ears, crops to +/-3 ms, peak-normalises and linearly resamples to 100 lags
(utils.py:390-420). TPU-native restructure, chosen by measurement
(tools/bench_synth_parts*.py, one v5e, batch 1024):

  * MXU path (default for 128-aligned N): only the ±max_lag window is ever
    needed, so the correlation is a block contraction — frame both ears
    into 128-sample blocks, batched matmul (B, 128, nf) x (B, nf, 256)
    over the frame axis, then read the 97 kept lags as strided diagonals
    of the result (pad + reshape with stride W+1 — no gather, no second
    matmul). 3.7 ms vs the FFT path's 10.5 ms at batch 1024; max
    divergence from the FFT path 5e-7.
  * FFT fallback (any N): rfft/irfft pair with fft_len halved to
    N + max_lag (exact for the kept window — zero overlap beyond it).

The lag crop and the np.interp resampling grid depend only on static
(fs, N, num_lags) so they collapse to a precomputed linear map.
Numerically identical to the reference up to float32 accumulation order.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
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


def _interp_to_lags(cc_crop, j0, w):
    """Shared peak-normalise + np.interp-equivalent resample stage."""
    peak = jnp.max(jnp.abs(cc_crop), axis=-1, keepdims=True) + 1e-8
    cc_crop = cc_crop / peak
    c0 = cc_crop[:, j0]
    c1 = cc_crop[:, j0 + 1]
    return (c0 + w[None, :] * (c1 - c0)).astype(jnp.float32)


def _cc_kept_lags_mxu(lf, rf, max_kept: int):
    """corr[l] for l in [-max_kept, max_kept] as one batched block matmul
    + strided-diagonal reduce. Requires N % 128 == 0, 2*max_kept <= 128.

    Derivation: with Lp = pad(lf, max_kept) and m = 128 f + i,
      corr[s - max_kept] = sum_{f,i} rf[128 f + i] * Lp[128 f + i + s],
    so C[b, i, j] = sum_f Rf[b, f, i] Lw[b, f, j]  (Lw = 2-block halo
    frames of Lp) holds every kept lag on the diagonals j = i + s; with
    row width W the diagonal elements sit at flat stride W + 1, so a pad
    to (128, W + 1) rows and a slice reads them without any gather."""
    B, n = lf.shape
    nf = n // 128
    halo = 2 * 128         # Lw width; covers j = i + s <= 127 + 2*max_kept
    Lp = jnp.pad(lf, ((0, 0), (max_kept, 128 - max_kept)))
    Lb = Lp.reshape(B, nf + 1, 128)
    Lw = jnp.concatenate([Lb[:, :nf], Lb[:, 1:nf + 1]], axis=-1)
    Rf = rf.reshape(B, nf, 128)
    C = jnp.einsum("bfi,bfj->bij", Rf, Lw,
                   precision=jax.lax.Precision.HIGHEST)      # (B, 128, 256)
    n_s = 2 * max_kept + 1
    Cp = jnp.pad(C.reshape(B, 128 * halo), ((0, 0), (0, 128)))
    return Cp.reshape(B, 128, halo + 1)[:, :, :n_s].sum(axis=1)


def cross_correlation_feature(left, right, fs: int, num_lags: int = 100,
                              max_lag_ms: float = 3.0,
                              use_kernel: bool | None = None):
    """Batched CC feature: left, right (B, N) -> (B, num_lags) float32.

    corr[l] = sum_m left[m + l] * right[m]  (after mean removal), matching
    np.correlate(left, right, "full") at the kept lags.

    use_kernel: dispatch of the fused Pallas lag kernel
    (ops/window_gather.py::cc_kept_lags — the XLA composition below is
    formatting-bound, ~3 ms vs ~0.3 ms at batch 512). None = kernel on
    TPU when shapes allow; False forces the XLA path (CPU tests, and
    mesh-sharded callers — Pallas calls have no SPMD partitioning rule)."""
    if left.ndim == 1:
        return cross_correlation_feature(left[None], right[None], fs,
                                         num_lags, max_lag_ms,
                                         use_kernel=use_kernel)[0]
    B, n = left.shape
    kept, j0, w = _lag_plan(n, fs, num_lags, max_lag_ms)
    max_kept = int(np.max(np.abs(kept)))
    j0 = jnp.asarray(j0)
    w = jnp.asarray(w)

    lf = left - jnp.mean(left, axis=-1, keepdims=True)
    rf = right - jnp.mean(right, axis=-1, keepdims=True)

    if n % 128 == 0 and 2 * max_kept <= 128:
        cc = None
        if max_kept <= 63:
            from .window_gather import cc_kept_lags
            cc = cc_kept_lags(lf, rf, max_kept, use_kernel=use_kernel)
        if cc is None:
            cc = _cc_kept_lags_mxu(lf, rf, max_kept)
        return _interp_to_lags(cc, j0, w)

    # FFT fallback for unaligned N. Exactness needs only fft_len >=
    # n + max|kept lag|, not the full 2n-1: circular wrap at a kept lag l
    # aliases in corr(l - fft_len), and for length-n signals every lag
    # with |lag| > fft_len - n has ZERO overlap.
    fft_len = 1
    while fft_len < n + max_kept:
        fft_len *= 2
    kept = jnp.asarray(kept)
    L = jnp.fft.rfft(lf, n=fft_len)
    R = jnp.fft.rfft(rf, n=fft_len)
    corr = jnp.fft.irfft(L * jnp.conj(R), n=fft_len)     # (B, fft_len)
    # corr[l mod fft_len] = sum_m left[m+l] right[m]; gather the kept lags.
    return _interp_to_lags(corr[:, jnp.mod(kept, fft_len)], j0, w)

"""Gaussian (gammatone-approximation) filterbank construction and application.

This is the heart of the system. The reference builds, per frame and per
ear, a (B, N, F) Gaussian weight matrix from the current Q vector and
contracts it against the magnitude spectrum (model_torch.py:340-346), then
REBUILDS the same W a second time as complex weights for per-band phase
extraction (model_torch.py:1039-1063). The TPU-native design fuses both:
one W build per (ear, frame) yields the band energy Y AND the complex band
output Z (whose angle is the phase), halving the dominant transcendental
cost and removing the second T-loop entirely.

`filterbank_apply` is the hot op, deliberately pure XLA: a Pallas kernel
ladder (chunked fwd+bwd streaming kernel; whole-scan-step fusion incl. the
GRU controller) was built and measured against it on v5e and lost at every
VMEM-feasible operating point (5-15% slower on train, tie on eval) — XLA's
own fusion of build+contract is already at the VPU exp-throughput limit.
Measurements: docs/kernel_ladder_measurements.json; kernel sources remain
in git history (commits 6a12595..87f2abf).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_filterbank(Q, fc, f_fft, *, eps_q: float = 1e-8, eps_bw: float = 1e-8,
                        eps_norm: float = 1e-8):
    """Row-normalised Gaussian filter response W.

    Q:     (..., N) per-band Q factors (leading dims broadcast, e.g. batch)
    fc:    (N,)     band center frequencies (Hz)
    f_fft: (F,)     rFFT bin frequencies (Hz)
    Returns W: (..., N, F) with rows summing to ~1.

    Numerics parity with model_torch.py:340-343:
      bw = fc / (Q + 1e-8) + 1e-8
      W  = exp(-0.5 ((f - fc)/bw)^2);  W /= (sum_f W + 1e-8);  nan -> 0.
    """
    bw = (fc / (Q + eps_q))[..., None] + eps_bw          # (..., N, 1)
    z = (f_fft[None, :] - fc[:, None]) / bw              # (..., N, F)
    W = jnp.exp(-0.5 * z * z)
    W = W / (jnp.sum(W, axis=-1, keepdims=True) + eps_norm)
    return jnp.nan_to_num(W, nan=0.0, posinf=0.0, neginf=0.0)


def filterbank_apply(Q, fc, f_fft, Xmag, Xre, Xim):
    """Fused build-and-apply of the Gaussian filterbank for one frame.

    Q:              (B, N)   per-sample Q vectors
    fc:             (N,)
    f_fft:          (F,)
    Xmag, Xre, Xim: (B, F)   magnitude / real / imag of the frame's rFFT

    Returns (Y, Zre, Zim), each (B, N):
      Y   = sum_f W * |X|          (band energy,   model_torch.py:345)
      Z   = sum_f W * X  (complex) (band analytic, model_torch.py:1054-1056)

    The contraction stacks [|X|, re X, im X] into one (B, F, 3) rhs so a
    single batched matmul rides the MXU instead of three matvecs.
    """
    W = gaussian_filterbank(Q, fc, f_fft)                # (B, N, F)
    rhs = jnp.stack([Xmag, Xre, Xim], axis=-1)           # (B, F, 3)
    # HIGHEST precision: this contraction is part of the float32-parity
    # acceptance surface; the default TPU matmul precision is bf16-class.
    out = jnp.einsum("bnf,bfc->bnc", W, rhs,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)  # (B, N, 3)
    Y = jnp.nan_to_num(out[..., 0], nan=0.0, posinf=0.0, neginf=0.0)
    return Y, out[..., 1], out[..., 2]


def band_phase(Zre, Zim, eps_mag: float = 1e-3):
    """Per-band phase from the complex band output.

    Parity with model_torch.py:1058-1060: |Z| floored at eps_mag before
    normalisation, then atan2 of the normalised components.
    """
    mag = jnp.maximum(jnp.sqrt(Zre * Zre + Zim * Zim), eps_mag)
    return jnp.arctan2(Zim / mag, Zre / mag)


def fixed_filterbank_matrix(Q0, fc, f_fft, q_min: float = 0.05, q_max: float = 30.0):
    """Precomputed (N, F) W for the fixed-Q frontends.

    Fixed Q has no temporal recurrence, so the whole (B, T, F) spectrogram
    contracts against this one constant matrix in a single einsum — the
    per-step W rebuild of the reference (model_torch.py:473-476) is hoisted
    out entirely.
    """
    Q = jnp.clip(Q0, q_min, q_max)
    return gaussian_filterbank(Q, fc, f_fft)

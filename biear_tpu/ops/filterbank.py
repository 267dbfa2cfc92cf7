"""Gaussian (gammatone-approximation) filterbank construction and application.

This is the heart of the system. The reference builds, per frame and per
ear, a (B, N, F) Gaussian weight matrix from the current Q vector and
contracts it against the magnitude spectrum (model_torch.py:340-346), then
REBUILDS the same W a second time as complex weights for per-band phase
extraction (model_torch.py:1039-1063). The TPU-native design fuses both:
one W build per (ear, frame) yields the band energy Y AND the complex band
output Z (whose angle is the phase), halving the dominant transcendental
cost and removing the second T-loop entirely.

`filterbank_apply` is the hot op and is HBM-bandwidth-bound: the (B, N, F)
weight tensor is 210 MB per (frame, ear) at production batch and XLA
cannot fuse an elementwise producer into a dot operand, so W streams
through HBM once per build and once per contraction. The implementation
therefore minimises W *passes* rather than trying to eliminate W:

  * the row normalisation is algebraically moved AFTER the contraction —
    a ones-column in the rhs carries sum_f W, so the separate
    (B, N, F)-sized normalise pass disappears (divide-after form;
    identical algebra, verified to 8e-7 float32);
  * optionally W is cast to bfloat16 for the dot (w_dtype), halving both
    W passes. Numerically this equals running the contraction at the
    TPU's DEFAULT matmul precision (operands are bf16-rounded either
    way), so it is gated by the model precision policy, not silently on.

Measured per (frame, ear) at batch 1024 on one v5e (device_get-synced,
scan-amortised; docs/kernel_ladder_measurements.json):
  normalise-then-dot f32:  0.734 ms fwd   2.838 ms fwd+bwd(remat)
  divide-after       f32:  0.523 ms fwd   1.970 ms
  divide-after      bf16:  0.242 ms fwd   0.791 ms
A full Pallas kernel that builds W in VMEM tiles and never materialises
it (custom fwd+bwd, ones-column fold) was built and measured this round
under honest device_get timing: 4.4-12 ms/frame — Mosaic's codegen for
the (Bt, 128, F) broadcast-exp tile plus the unrolled batched dot loses
to XLA's pipelined fusion by an order of magnitude, so the kernel was
deleted (git history; measurements in the same JSON). This CONFIRMS the
round-2 ladder conclusion with ground-truth timing.
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


def filterbank_apply(Q, fc, f_fft, Xmag, Xre, Xim, w_dtype=None):
    """Fused build-and-apply of the Gaussian filterbank for one frame.

    Q:              (B, N)   per-sample Q vectors
    fc:             (N,)
    f_fft:          (F,)
    Xmag, Xre, Xim: (B, F)   magnitude / real / imag of the frame's rFFT
    w_dtype:        dot operand dtype for the W contraction. None/float32
                    = float32 operands at HIGHEST precision (bit-parity
                    surface); jnp.bfloat16 halves the HBM-bound W traffic
                    (~2.5x measured; equals DEFAULT matmul precision
                    numerics, abs err ~7e-3 on O(1) outputs).

    Returns (Y, Zre, Zim), each (B, N):
      Y   = sum_f W * |X|          (band energy,   model_torch.py:345)
      Z   = sum_f W * X  (complex) (band analytic, model_torch.py:1054-1056)

    Divide-after form: the contraction uses the UNNORMALISED Gaussian G
    with a ones-column stacked into the rhs, so one (B, F, 4) matmul
    yields all three numerators and the row-sum denominator — the
    (B, N, F)-sized normalisation pass of the naive form never exists.
    Algebraically identical to contracting gaussian_filterbank's W
    (same eps placement; verified to 8e-7 in tests/test_ops.py).
    """
    eps_q = eps_bw = 1e-8
    eps_norm = 1e-8
    bw = (fc / (Q + eps_q))[..., None] + eps_bw          # (B, N, 1)
    z = (f_fft[None, :] - fc[:, None]) / bw              # (B, N, F)
    G = jnp.exp(-0.5 * z * z)
    ones = jnp.ones_like(Xmag[..., :1])
    rhs = jnp.stack([Xmag, Xre, Xim,
                     jnp.broadcast_to(ones, Xmag.shape)], axis=-1)
    if w_dtype is not None and jnp.dtype(w_dtype) == jnp.bfloat16:
        G = G.astype(jnp.bfloat16)
        rhs = rhs.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        # HIGHEST: float32-parity acceptance surface (the default TPU
        # matmul mode rounds operands to bf16)
        prec = jax.lax.Precision.HIGHEST
    out = jnp.einsum("bnf,bfc->bnc", G, rhs, precision=prec,
                     preferred_element_type=jnp.float32)  # (B, N, 4)
    den = out[..., 3] + eps_norm
    Y = jnp.nan_to_num(out[..., 0] / den,
                       nan=0.0, posinf=0.0, neginf=0.0)
    return Y, out[..., 1] / den, out[..., 2] / den


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

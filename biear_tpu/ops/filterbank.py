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

import functools
import os

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


def filterbank_apply_ref(Q, fc, f_fft, Xmag, Xre, Xim, w_dtype=None):
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
    with a ones-column stacked into the rhs, so one (B, 4, F)-rhs matmul
    yields all three numerators and the row-sum denominator — the
    (B, N, F)-sized normalisation pass of the naive form never exists.
    Algebraically identical to contracting gaussian_filterbank's W
    (same eps placement; verified to 8e-7 in tests/test_ops.py).
    """
    # One shared body: this is plain autodiff over the SAME code the
    # custom-VJP forward runs (_fb_fwd_rhs is an ordinary function; only
    # _fb_apply_rhs attaches the hand bwd), so ref/custom forward
    # bit-equality holds by construction rather than by keeping two
    # copies in sync.
    mode = "bf16" if _fb_is_bf16(w_dtype) else "f32"
    return _fb_fwd_rhs(Q, fc, f_fft, stack_rhs(Xmag, Xre, Xim, w_dtype),
                       mode)[0]


def stack_rhs(Xmag, Xre, Xim, w_dtype=None):
    """Stack the spectra + ones-row into the contraction rhs
    (..., 4, F), cast to the dot-operand dtype.

    Hoisting this OUT of the frontend scan (one batched stack over all T
    frames instead of three per-frame layout copies + in-fusion converts)
    removed the largest "data formatting" bucket of the round-5 trace:
    the three bf16[2,B,513,1] copies x19 frames, 0.22 ms/step at batch
    512 (docs/hot_ops_named.json). The component axis sits at -2 so F
    stays MINORMOST — the layout the W contraction wants; stacking at -1
    put the 4-axis minor and XLA re-inserted a per-frame transpose copy
    of the whole rhs slice (measured 0.19 ms/step, same trace). Values
    are bit-identical either way: the cast commutes with stack/slice,
    and _fb_dot's astype is a no-op on an already-bf16 rhs."""
    rhs = jnp.stack([Xmag, Xre, Xim, jnp.ones_like(Xmag)], axis=-2)
    if _fb_is_bf16(w_dtype):
        rhs = rhs.astype(jnp.bfloat16)
    return rhs


# ---------------- custom-VJP wrapper (the production entry point) -----------
#
# jax.grad of the einsum above computes dL/dG = gout @ rhs^T — a (B, N, F)
# cotangent that XLA materialises through HBM every frame (~0.5 ms at
# batch 1024, the single largest op in the round-3 trace: fusion "bwd dQ",
# 30 % of the step — docs/mfu_attribution.md). Both parameter gradients
# can instead be written as contractions of fwd-sized SHAPE:
#
#   dL/dQ_bn   = -fc_n/(Q+eps)^2 / bw_bn * sum_c g4_bnc T_bnc,
#                T = einsum("bnf,bcf->bnc", G*z^2, rhs)      (F contracted)
#   dL/drhs_bfc =  einsum("bnf,bnc->bcf", G, g4)             (N contracted)
#
# so the (B, N, F) cotangent never exists — G is (re)built inside each
# contraction exactly like the forward. g4 maps the division's cotangents
# back to the pre-division numerators: g4[..., :3] = gout/den,
# g4[..., 3] = dL/dden = -sum_c gout_c out_c / den.

def _fb_eps():
    return 1e-8, 1e-8, 1e-8       # eps_q, eps_bw, eps_norm


def _fb_gauss(Q, fc, f_fft):
    eps_q, eps_bw, _ = _fb_eps()
    bw = (fc / (Q + eps_q))[..., None] + eps_bw          # (B, N, 1)
    z = (f_fft[None, :] - fc[:, None]) / bw              # (B, N, F)
    return bw, z, jnp.exp(-0.5 * z * z)


def _fb_gauss_fast(Q, fc, f_fft):
    """Divide-free Gaussian build for the bf16 production mode.

    exp(-0.5 ((f-fc)/bw)^2) == exp(D * s) with D = -0.5 (f-fc)^2 a
    compile-time (N, F) constant (fc/f_fft are literals) and
    s = 1/bw^2 a (B, N)-sized cheap prologue — so the (B, N, F)-sized
    inner loop is ONE multiply + exp instead of divide + two multiplies
    + exp. The VPU-transcendental-bound W fusions are ~40 % of the step
    (docs/mfu_attribution.md), and the divide is the most expensive
    non-exp op in them (Newton-iteration emulation on the VPU).

    Numerics: algebraically identical to _fb_gauss; f32 rounding of
    x^2 * s vs (x/bw)^2 differs by ~1e-7 relative in the exponent —
    invisible under the bf16 rounding (~4e-3) this mode applies to G
    right after. The f32 parity surface keeps the exact reference
    association in _fb_gauss. Returns (bw, t, G) with t = log G, so the
    bwd's G * z^2 is G * (-2 t) — also divide-free.
    """
    eps_q, eps_bw, _ = _fb_eps()
    bw = (fc / (Q + eps_q))[..., None] + eps_bw          # (B, N, 1)
    D = -0.5 * jnp.square(f_fft[None, :] - fc[:, None])  # (N, F) constant
    s = 1.0 / jnp.square(bw)                             # (B, N, 1)
    t = D * s                                            # (B, N, F)
    return bw, t, jnp.exp(t)


def _fb_dot(lhs, rhs, bf16: bool, sub: str):
    if bf16:
        lhs, rhs = lhs.astype(jnp.bfloat16), rhs.astype(jnp.bfloat16)
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST
    return jnp.einsum(sub, lhs, rhs, precision=prec,
                      preferred_element_type=jnp.float32)


# Measured per-step crossover for the custom bwd on the UN-scanned
# dispatch path (docs/fb_vjp_{custom,autodiff}_small.json + the 512/1024
# sweep): custom wins >= 512, loses <= 256. The scan-amortised chunk
# path wins at every batch and forces "custom" upstream (train/loop.py).
_FB_VJP_AUTO_MIN_BATCH = 512


def resolve_fb_vjp(vjp: str, batch: int) -> str:
    """THE single resolution of the filterbank VJP choice — env override,
    then the measured auto crossover. Shared by filterbank_apply and by
    the frontend's remat gate (models/frontend.py::_effective_remat),
    which MUST agree: remat-off + autodiff would save the (B, N, F)
    einsum operand per frame (~2 GB at batch 512 x 19 frames). Unknown
    values raise rather than silently diverging between the two users."""
    vjp = os.environ.get("BIEAR_FB_VJP", vjp)
    if vjp == "auto":
        vjp = ("custom" if batch >= _FB_VJP_AUTO_MIN_BATCH
               else "autodiff")
    if vjp not in ("custom", "autodiff"):
        raise ValueError(f"fb_vjp must be 'auto', 'custom' or 'autodiff', "
                         f"got {vjp!r}")
    return vjp


def filterbank_apply(Q, fc, f_fft, Xmag, Xre, Xim, w_dtype=None,
                     vjp: str = "auto", x_grad: bool = True):
    """filterbank_apply_ref semantics with a traffic-minimal custom VJP.

    Forward math is filterbank_apply_ref verbatim (same eps placement,
    same operand dtypes/precision — tested to bit equality); only the
    gradient computation differs, by the algebra above (tested against
    jax.grad of the reference to float32 tolerance).

    vjp: "custom" | "autodiff" | "auto" (see BiEARConfig.fb_vjp). The
    batch-512/1024 ground-truth measurement resolved the round-3 open
    question: custom is +16-17 % on the production step and +11 % on the
    fused pipeline (docs/fb_vjp_custom_sweep.json vs batch_sweep.json);
    autodiff keeps the edge only on small un-scanned dispatches, so
    "auto" picks by the measured crossover on the per-call batch.
    Env BIEAR_FB_VJP overrides everything (experiment knob).

    x_grad=False declares the spectra inputs (Xmag, Xre, Xim) OFF the
    differentiation path, which in every model family they are — they
    come from the rFFT of input audio, never from parameters. Autodiff
    gets this for free (JAX transposes only along the path to the
    differentiated inputs), but a custom bwd is opaque: without the
    flag it computes the full dL/drhs contraction — a third Gaussian
    rebuild + (B,F,4) dot per frame, ~2 ms/step of the round-3 trace —
    only for the scan transpose to discard it. With the flag the bwd
    returns constant-zero cotangents for the spectra (cheap broadcasts
    XLA folds out of the scan transpose) and the H contraction never
    exists. Param/Q gradients are bit-identical either way (H never
    feeds them). Keep True for generic use (e.g. differentiating
    through a learned signal path into X)."""
    vjp = resolve_fb_vjp(vjp, Q.shape[0])
    if vjp == "autodiff":
        return filterbank_apply_ref(Q, fc, f_fft, Xmag, Xre, Xim,
                                    w_dtype=w_dtype)
    rhs = stack_rhs(Xmag, Xre, Xim, w_dtype)
    # custom_vjp takes positional args only; dtype/x_grad ride as a
    # static mode string. The spectra cotangents (x_grad=True) flow back
    # through stack_rhs's transpose: the rhs cotangent H splits into its
    # three component slices (the ones-column's lands nowhere).
    mode = ("bf16" if _fb_is_bf16(w_dtype) else "f32") + \
        ("" if x_grad else "|noxg")
    return _fb_apply_rhs(Q, fc, f_fft, rhs, mode)


def filterbank_apply_rhs(Q, fc, f_fft, rhs, w_dtype=None,
                         vjp: str = "auto", x_grad: bool = True):
    """filterbank_apply on a PRE-STACKED rhs (..., 4, F) = [mag, re, im, 1].

    The frontend scans prebuild the rhs for ALL frames outside the scan
    (stack_rhs on the (B, T, F) spectra) so each frame's xs slice feeds
    the W contraction directly — no per-frame stack/convert/copy chain
    (0.22 ms/step of layout copies at batch 512, docs/hot_ops_named.json).
    Semantics and numerics are identical to filterbank_apply on the
    unstacked spectra (the cast commutes with stack/slice)."""
    vjp = resolve_fb_vjp(vjp, Q.shape[0])
    mode = ("bf16" if _fb_is_bf16(w_dtype) else "f32") + \
        ("" if x_grad else "|noxg")
    if vjp == "autodiff":
        return _fb_fwd_rhs(Q, fc, f_fft, rhs, mode)[0]
    return _fb_apply_rhs(Q, fc, f_fft, rhs, mode)


def _fb_is_bf16(w_dtype) -> bool:
    return w_dtype is not None and jnp.dtype(w_dtype) == jnp.bfloat16


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fb_apply_rhs(Q, fc, f_fft, rhs, mode):
    return _fb_fwd_rhs(Q, fc, f_fft, rhs, mode)[0]


def _fb_fwd_rhs(Q, fc, f_fft, rhs, mode):
    bf16 = mode.startswith("bf16")
    # Production mode (bf16, spectra off the grad path): the bwd's only
    # (B, N, F)-sized quantity, T = sum_f G z^2 rhs, depends on NOTHING
    # from the cotangents — so compute it here, sharing this build's G,
    # and the bwd below collapses to (B, N)-sized arithmetic. The scan
    # residual is the (B, N, 4) T instead of the (B, 4, F) rhs.
    fwd_T = bf16 and mode.endswith("|noxg")
    _, _, eps_norm = _fb_eps()
    if fwd_T:
        bw, t, G = _fb_gauss_fast(Q, fc, f_fft)
        out = _fb_dot(G, rhs, bf16, "bnf,bcf->bnc")      # (B, N, 4)
        T = _fb_dot(G * (-2.0 * t), rhs, bf16, "bnf,bcf->bnc")
    else:
        _, _, G = (_fb_gauss_fast if bf16 else _fb_gauss)(Q, fc, f_fft)
        out = _fb_dot(G, rhs, bf16, "bnf,bcf->bnc")      # (B, N, 4)
    den = out[..., 3] + eps_norm
    Y_raw = out[..., 0] / den
    Y = jnp.nan_to_num(Y_raw, nan=0.0, posinf=0.0, neginf=0.0)
    Zre, Zim = out[..., 1] / den, out[..., 2] / den
    if fwd_T:
        # rhs[..., :1, :1] rides along only to give the bwd the rhs
        # cotangent's dtype/batch shape without stacking the full array.
        res = (Q, fc, f_fft, rhs[..., :1, :1], bw[..., 0], T,
               Y, Zre, Zim, den, jnp.isfinite(Y_raw))
    else:
        res = (Q, fc, f_fft, rhs, Y, Zre, Zim, den, jnp.isfinite(Y_raw))
    return (Y, Zre, Zim), res


def _fb_bwd_rhs(mode, res, g):
    bf16 = mode.startswith("bf16")
    x_grad = not mode.endswith("|noxg")
    eps_q, _, _ = _fb_eps()
    fwd_T = bf16 and not x_grad
    if fwd_T:
        Q, fc, f_fft, rproto, bw0, T, Y, Zre, Zim, den, finite = res
    else:
        Q, fc, f_fft, rhs, Y, Zre, Zim, den, finite = res
    gY, gZre, gZim = g
    # nan_to_num passes zero cotangent at the positions it zeroed
    gY = jnp.where(finite, gY, 0.0)
    gden = -(gY * Y + gZre * Zre + gZim * Zim) / den
    g4 = jnp.stack([gY / den, gZre / den, gZim / den, gden], axis=-1)

    if fwd_T:
        # T was computed in the fwd (sharing its G build); everything
        # left is (B, N)-sized. Numerics identical to the rebuild: the
        # T contraction uses the same operands/precision either way.
        dQ = (-fc / jnp.square(Q + eps_q) / bw0
              * jnp.sum(g4 * T, axis=-1))
        gRhs = jnp.zeros(rproto.shape[:-2] + (4, f_fft.shape[0]),
                         rproto.dtype)
        return (dQ, jnp.zeros_like(fc), jnp.zeros_like(f_fft), gRhs)

    if bf16:
        bw, t, G = _fb_gauss_fast(Q, fc, f_fft)
        Gz2 = G * (-2.0 * t)                             # z^2 = -2 log G
    else:
        bw, z, G = _fb_gauss(Q, fc, f_fft)
        Gz2 = G * (z * z)

    T = _fb_dot(Gz2, rhs, bf16, "bnf,bcf->bnc")          # (B, N, 4)
    dQ = (-fc / jnp.square(Q + eps_q) / bw[..., 0]
          * jnp.sum(g4 * T, axis=-1))

    if x_grad:
        H = _fb_dot(G, g4, bf16, "bnf,bnc->bcf")         # (B, 4, F)
        gRhs = H.astype(rhs.dtype)
    else:
        gRhs = jnp.zeros_like(rhs)
    return (dQ, jnp.zeros_like(fc), jnp.zeros_like(f_fft), gRhs)


_fb_apply_rhs.defvjp(_fb_fwd_rhs, _fb_bwd_rhs)


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

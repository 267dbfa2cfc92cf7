"""Gammatone-like frontends: adaptive-Q (dual / single controller) and fixed-Q.

TPU-native restructure of the reference frontends
(model_torch.py:200-776). Key differences from the torch implementation,
none of which change the numerics:

  * All T frames are windowed + rFFT'd in ONE batched FFT up front; only
    the genuinely sequential Q-feedback lives in a lax.scan.
  * The per-band phase is extracted inside the same scan step from the
    same W (the reference re-runs a second T-loop rebuilding W from Q_all,
    model_torch.py:1039-1063) — one W build per (ear, frame) total.
  * The dual mode's two independent per-ear controllers are an ear-axis
    vmap over one monaural scan, so both ears batch into every kernel.
  * The fixed-Q path has no recurrence at all: a single precomputed (N, F)
    matrix contracts against the whole (B, T, F) spectrogram.

Controller quirks of the reference are preserved exactly:
  * dual mode: the Y "memory" input is re-zeroed every frame, so it equals
    0.2 * stop_grad(log1p(Y)) of the CURRENT frame (model_torch.py:355-358);
  * single mode: the per-ear EMA memories DO persist across frames with
    beta=0.8 and are updated after the controller step
    (model_torch.py:746-769);
  * the zero-init of the controller's output layer (training starts at
    Q = Q0), the [0.05, 30] clamp, the whole-batch nonfinite reset of
    (Q, h), and the freeze_Q behaviour.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.erb import erb_spaced_fc_and_q, make_deltaQ_profile
from ..ops.framing import frame_params, frame_1s, hann_window_periodic
from ..ops.filterbank import (filterbank_apply, filterbank_apply_rhs,
                              stack_rhs, band_phase, fixed_filterbank_matrix)
from .config import BiEARConfig


def _wdt(cfg: BiEARConfig):
    """cfg.fb_w_dtype -> filterbank_apply w_dtype (None = f32 parity)."""
    return jnp.bfloat16 if cfg.fb_w_dtype == "bfloat16" else None


def _effective_remat(cfg: BiEARConfig, batch: int) -> bool:
    """Remat the scan step only when the filterbank VJP that will
    actually run needs it. Autodiff saves the (B, N, F) einsum operand
    per frame (~2 GB bf16 at batch 512 x 19 frames) — checkpoint is
    mandatory there. The custom VJP's residuals are (B, N)-sized, so
    the whole step's saved state is a few MB and remat would only buy
    back a full forward G-build+dot per frame: measured +3.4 % step
    throughput from skipping it (7-window device_get medians, batch
    512 bf16-W). cfg.remat_frontend=False still forces remat off.

    The VJP resolution is filterbank.resolve_fb_vjp — the SAME resolver
    filterbank_apply runs — so the remat decision cannot desync from
    the VJP that actually executes."""
    from ..ops.filterbank import resolve_fb_vjp
    if not cfg.remat_frontend:
        return False
    return resolve_fb_vjp(cfg.fb_vjp, batch) != "custom"
from . import layers as L


# ---------------- static constants per config ----------------

@functools.lru_cache(maxsize=None)
def frontend_constants(cfg: BiEARConfig):
    """Static per-config constants, ALL kept as numpy arrays.

    This function may first be hit inside a jit trace (spectra calls it),
    and in that context any jnp op yields a tracer — which an lru_cache
    must never capture. Numpy constants are lifted per-trace by the jnp ops
    that consume them, which is both safe and free.
    """
    import numpy as np

    fc, Q0 = erb_spaced_fc_and_q(cfg.n_bands, cfg.fmin, cfg.fmax_eff,
                                 erb_factor=1.019)
    deltaQ_vec = make_deltaQ_profile(fc, cfg.deltaQ_base,
                                     cfg.deltaQ_low_factor,
                                     cfg.deltaQ_high_factor)
    win, hop = frame_params(cfg.fs, cfg.timesteps, cfg.hop_ratio)
    f_fft = np.linspace(0.0, cfg.f_nyq, cfg.n_freq).astype(np.float32)

    # Fixed-Q filterbank matrix, numpy mirror of ops.filterbank numerics.
    Qc = np.clip(Q0, cfg.q_min, cfg.q_max)
    bw = (fc / (Qc + 1e-8))[:, None] + 1e-8
    W = np.exp(-0.5 * ((f_fft[None, :] - fc[:, None]) / bw) ** 2)
    W = W / (W.sum(-1, keepdims=True) + 1e-8)
    W_fixed = np.nan_to_num(W).astype(np.float32)

    # Windowed DFT bases for the matmul spectra path (dft_mode):
    # rfft(pad(hann * x, n_fft))[k] = sum_{n<win} hann[n] x[n] e^{-2i pi kn/n_fft}
    # — the zero-pad contributes nothing, so (win, F) bases with the window
    # folded in compute the exact same transform as one matmul pair.
    window = hann_window_periodic(win)
    n = np.arange(win, dtype=np.float64)[:, None]
    k = np.arange(cfg.n_freq, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * n * k / cfg.n_fft
    dft_re = (window[:, None].astype(np.float64) * np.cos(ang)).astype(np.float32)
    dft_im = (window[:, None].astype(np.float64) * np.sin(ang)).astype(np.float32)

    return {
        "fc": fc,
        "Q0": Q0,
        "deltaQ_vec": deltaQ_vec,
        "f_fft": f_fft,
        "win": win,
        "hop": hop,
        "window": window,
        "W_fixed": W_fixed,
        "dft_re": dft_re,
        "dft_im": dft_im,
    }


def spectra(cfg: BiEARConfig, wav):
    """wav (B, Nsamp) -> (Xmag, Xre, Xim), each (B, T, F).

    One batched transform over all frames (vs the reference's per-step
    torch.fft.rfft inside the T-loop, model_torch.py:333-335). Two
    implementations of the same rFFT, selected by cfg.dft_mode:

      * "fft": XLA's rFFT — exact, VPU-side; the f32 parity surface.
      * "matmul": the windowed (win, F) cos/sin DFT bases contracted on
        the MXU at DEFAULT precision (operands bf16-rounded, f32
        accumulate) — measured 3.9x faster at the production shape
        (docs/dft_matmul_probe.json) with error ~1e-3 of spectrum max,
        the same rounding class the bf16-W filterbank policy already
        applies to these spectra downstream; production-mode-only by
        the "auto" resolution (cfg.use_dft_matmul).
    """
    c = frontend_constants(cfg)
    frames = frame_1s(wav, cfg.fs, cfg.timesteps, c["win"], c["hop"])
    if cfg.use_dft_matmul:
        re = jnp.einsum("btw,wf->btf", frames, c["dft_re"],
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btw,wf->btf", frames, c["dft_im"],
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im), re, im
    X = jnp.fft.rfft(frames * c["window"], n=cfg.n_fft)
    return jnp.abs(X), X.real, X.imag


# ---------------- Q controller (GRU + MLP head) ----------------

def controller_init(key, cfg: BiEARConfig, n_in: int):
    """GRU(n_in -> 128) + [Linear, LN, SiLU, Drop] x2 + zero-init Linear(128 -> N).

    Parity: model_torch.py:256-267, 286-287."""
    ks = jax.random.split(key, 4)
    H = cfg.ctrl_hidden
    return {
        "q_rnn": L.gru_init(ks[0], n_in, H),
        "q_out": {
            "l1": L.linear_init(ks[1], H, H),
            "ln1": L.layer_norm_init(H),
            "l2": L.linear_init(ks[2], H, H),
            "ln2": L.layer_norm_init(H),
            "l3": L.linear_init(ks[3], H, cfg.n_bands, zero=True),
        },
    }


def controller_step(p, cfg: BiEARConfig, h, feat, drop_key, train: bool,
                    drops=None):
    """One controller update: returns (delta in [-1, 1], new hidden).

    drops: optional pair of precomputed keep-masks (B, H) for the two
    dropout sites (L.dropout_masks) — the scan paths draw all frames'
    masks in one call outside the scan; key-based sampling remains for
    un-scanned callers (streaming runs eval-mode and never samples)."""
    h = L.gru_step(p["q_rnn"], h, feat)
    q = p["q_out"]
    rate = cfg.ctrl_dropout
    use_masks = train and drops is not None and rate > 0.0
    k1 = k2 = None
    if train and drops is None and drop_key is not None:
        k1, k2 = jax.random.split(drop_key)
    z = L.silu(L.layer_norm(q["ln1"], L.linear(q["l1"], h)))
    z = (L.dropout_apply(drops[0], z, rate) if use_masks
         else L.dropout(k1, z, rate, not train))
    z = L.silu(L.layer_norm(q["ln2"], L.linear(q["l2"], z)))
    z = (L.dropout_apply(drops[1], z, rate) if use_masks
         else L.dropout(k2, z, rate, not train))
    return jnp.tanh(L.linear(q["l3"], z)), h


def _next_q(cfg: BiEARConfig, c, delta):
    if cfg.deltaQ_mode.lower() == "relative":
        Q = c["Q0"][None] * (1.0 + c["deltaQ_vec"][None] * delta)
    else:
        Q = c["Q0"][None] + c["deltaQ_vec"][None] * delta
    return jnp.clip(Q, cfg.q_min, cfg.q_max)


def _finite_reset(Q, h, Q0):
    """Whole-batch nonfinite guard (model_torch.py:378-380): if any Q entry
    went nonfinite, reset Q to Q0 and the controller state to zeros."""
    ok = jnp.all(jnp.isfinite(Q))
    Q = jnp.where(ok, Q, jnp.broadcast_to(Q0, Q.shape))
    h = jnp.where(ok, h, jnp.zeros_like(h))
    return Q, h


# ---------------- adaptive monaural scan (dual-mode building block) ----------------

def adaptive_step(p_ctrl, cfg: BiEARConfig, carry, xmag, xre, xim,
                  key=None, train: bool = False):
    """ONE frame of the adaptive-Q feedback loop. carry = (Q, h), spectra
    (B, F). Returns ((Qn, hn), (Y, Q, phase)) for this frame.

    This is the exact scan-step body of adaptive_scan (which feeds the
    same body the pre-stacked rhs), exposed so the streaming inference
    path (serve/streaming.py) runs the identical code frame-by-frame —
    any numerics change here changes both paths together.
    """
    rhs = stack_rhs(xmag, xre, xim, _wdt(cfg))
    return _adaptive_step_rhs(p_ctrl, cfg, carry, rhs, key, train)


def _adaptive_step_rhs(p_ctrl, cfg: BiEARConfig, carry, rhs,
                       key=None, train: bool = False, drops=None):
    """adaptive_step body on the pre-stacked contraction rhs (B, F, 4).

    drops: optional precomputed controller dropout masks (see
    controller_step) threaded through the scan as xs."""
    c = frontend_constants(cfg)
    Q, h = carry

    Y, Zre, Zim = filterbank_apply_rhs(Q, c["fc"], c["f_fft"], rhs,
                                       w_dtype=_wdt(cfg), vjp=cfg.fb_vjp,
                                       x_grad=cfg.fb_x_grad)
    phase = band_phase(Zre, Zim)
    out = (Y, Q, phase)

    if cfg.freeze_q:
        Q_init = jnp.broadcast_to(jnp.asarray(c["Q0"])[None], Q.shape)
        return (Q_init, jnp.zeros_like(h)), out

    Y_ctrl = jnp.log1p(jnp.maximum(Y, 0.0))
    # Dual-mode quirk: the EMA buffer is re-created every frame, so the
    # "memory" input is just 0.2 * sg(Y_ctrl) (model_torch.py:355-358).
    Y_mem = 0.2 * jax.lax.stop_gradient(Y_ctrl)
    feat = jnp.concatenate([Y_ctrl, Y_mem], axis=-1)
    delta, h = controller_step(p_ctrl, cfg, h, feat, key, train, drops)
    Qn = _next_q(cfg, c, delta)
    Qn, h = _finite_reset(Qn, h, c["Q0"][None])
    return (Qn, h), out


def _scan_dropout_masks(cfg: BiEARConfig, rng, T: int, B: int, train: bool):
    """All T frames' controller dropout masks in one draw (T, 2, B, H),
    or None when dropout is off. One fused threefry kernel vs 2T tiny
    in-scan ones, and the masks enter the scan as xs instead of being
    DUS-stacked into backward residuals (docs/hot_ops_named.json)."""
    if not (train and rng is not None and cfg.ctrl_dropout > 0.0):
        return None
    return L.dropout_masks(rng, cfg.ctrl_dropout,
                           (T, 2, B, cfg.ctrl_hidden))


def adaptive_scan(p_ctrl, cfg: BiEARConfig, Xmag, Xre, Xim, rng, train: bool):
    """Monaural adaptive-Q filterbank over T frames.

    Xmag/Xre/Xim: (B, T, F). Returns (Y, Q, phase), each (B, T, N).
    Parity: FramewiseAdaptiveGammatoneFB.forward (model_torch.py:314-386),
    fused with the phase extraction of model_torch.py:1039-1063. The
    contraction rhs for all frames is stacked ONCE outside the scan
    (stack_rhs; same values, no per-frame layout copies), as are the
    controller dropout masks."""
    c = frontend_constants(cfg)
    B = Xmag.shape[0]
    T = cfg.timesteps
    Q_init = jnp.broadcast_to(c["Q0"][None], (B, cfg.n_bands))
    h_init = jnp.zeros((B, cfg.ctrl_hidden), Xmag.dtype)

    # XLA bitcasts the producer's (B, T) order into the xs buffer and
    # re-layouts each frame's slice in VMEM (0.19 ms/step at batch 512 —
    # cheaper than the three per-frame component copies this prestack
    # replaced, 0.22 ms). Pre-transposing the components before the stack
    # compiles to the IDENTICAL HLO (transpose+stack is canonicalized),
    # so the residual copy is XLA's layout choice, not addressable here
    # (measured rejection, docs/hot_ops_named.json).
    swT = lambda a: jnp.swapaxes(a, 0, 1)
    rhs_all = stack_rhs(swT(Xmag), swT(Xre), swT(Xim), _wdt(cfg))
    masks = _scan_dropout_masks(cfg, rng, T, B, train)

    if masks is None:                    # static: train is a python bool
        def step(carry, rhs):
            return _adaptive_step_rhs(p_ctrl, cfg, carry, rhs, train=train)
        xs = rhs_all                                     # (T, B, 4, F)
    else:
        def step(carry, xs):
            return _adaptive_step_rhs(p_ctrl, cfg, carry, xs[0],
                                      train=train, drops=xs[1])
        xs = (rhs_all, masks)
    body = jax.checkpoint(step) if _effective_remat(cfg, B) else step
    _, (Y, Q, phase) = jax.lax.scan(body, (Q_init, h_init), xs)
    return (jnp.swapaxes(Y, 0, 1), jnp.swapaxes(Q, 0, 1),
            jnp.swapaxes(phase, 0, 1))


# ---------------- fixed-Q path (no recurrence) ----------------

def fixed_forward(cfg: BiEARConfig, Xmag, Xre, Xim):
    """Fixed-Q filterbank over the whole spectrogram in two einsums.

    Parity: FramewiseFixedGammatoneFB (model_torch.py:451-487) + the phase
    pass; W is the one precomputed clamped-Q0 matrix."""
    c = frontend_constants(cfg)
    W = c["W_fixed"]                                     # (N, F)
    # Honor the same FB_W_DTYPE policy as the adaptive filterbank_apply:
    # ablations (adaptive vs fixed-Q) must not confound adaptivity with a
    # filterbank-numerics difference between the two arms.
    if _wdt(cfg) is not None:
        # both operands bf16 at DEFAULT precision, f32 accumulate — the
        # exact policy of filterbank_apply_ref's bf16 branch
        W = W.astype(jnp.bfloat16)
        Xmag, Xre, Xim = (x.astype(jnp.bfloat16) for x in (Xmag, Xre, Xim))
        hp = jax.lax.Precision.DEFAULT
    else:
        hp = jax.lax.Precision.HIGHEST
    pet = jnp.float32
    Y = jnp.einsum("btf,nf->btn", Xmag, W, precision=hp,
                   preferred_element_type=pet)
    Y = jnp.nan_to_num(Y, nan=0.0, posinf=0.0, neginf=0.0)
    Zre = jnp.einsum("btf,nf->btn", Xre, W, precision=hp,
                     preferred_element_type=pet)
    Zim = jnp.einsum("btf,nf->btn", Xim, W, precision=hp,
                     preferred_element_type=pet)
    phase = band_phase(Zre, Zim)
    B, T = Xmag.shape[:2]
    Qc = jnp.clip(c["Q0"], cfg.q_min, cfg.q_max)
    Q = jnp.broadcast_to(Qc[None, None], (B, T, cfg.n_bands))
    return Y, Q, phase


# ---------------- binaural frontends ----------------

def dual_frontend_init(key, cfg: BiEARConfig):
    """Two independent per-ear controllers, leaf-stacked on a leading ear
    axis of size 2 (fb_L = index 0, fb_R = index 1)."""
    if cfg.fixed_frontend_q:
        return {}
    kL, kR = jax.random.split(key)
    pL = controller_init(kL, cfg, 2 * cfg.n_bands)
    pR = controller_init(kR, cfg, 2 * cfg.n_bands)
    return {"fb": jax.tree.map(lambda a, b: jnp.stack([a, b]), pL, pR)}


def dual_frontend(params, cfg: BiEARConfig, wavL, wavR, rng, train: bool):
    """BinauralAdaptiveGammatoneFB parity (model_torch.py:492-573).

    Returns (YL, YR, QL, QR, phaseL, phaseR), each (B, T, N)."""
    XmagL, XreL, XimL = spectra(cfg, wavL)
    XmagR, XreR, XimR = spectra(cfg, wavR)
    if cfg.fixed_frontend_q:
        YL, QL, phL = fixed_forward(cfg, XmagL, XreL, XimL)
        YR, QR, phR = fixed_forward(cfg, XmagR, XreR, XimR)
        return YL, YR, QL, QR, phL, phR

    Xmag = jnp.stack([XmagL, XmagR])                     # (2, B, T, F)
    Xre = jnp.stack([XreL, XreR])
    Xim = jnp.stack([XimL, XimR])
    if train and rng is not None:
        rngs = jax.random.split(rng, 2)
    else:
        rngs = jnp.zeros((2, 2), jnp.uint32)

    run = functools.partial(adaptive_scan, cfg=cfg, train=train)
    Y, Q, phase = jax.vmap(
        lambda p, xm, xr, xi, k: run(p, Xmag=xm, Xre=xr, Xim=xi, rng=k)
    )(params["fb"], Xmag, Xre, Xim, rngs)
    return Y[0], Y[1], Q[0], Q[1], phase[0], phase[1]


def single_frontend_init(key, cfg: BiEARConfig):
    if cfg.fixed_frontend_q:
        return {}
    return {"ctrl": controller_init(key, cfg, 4 * cfg.n_bands)}


def single_step(p_ctrl, cfg: BiEARConfig, carry, xsL, xsR,
                key=None, train: bool = False):
    """ONE frame of the single-controller loop. carry = (Q, h, memL, memR);
    xsL / xsR = (xmag, xre, xim) per ear, each (B, F). Returns
    (carry', (YL, YR, Q, phaseL, phaseR)) for this frame.

    Exact scan-step body of single_frontend (which feeds the same body
    pre-stacked rhs), exposed for the streaming inference path
    (serve/streaming.py) — including the PERSISTENT beta=0.8 EMA
    memories (model_torch.py:746-769)."""
    w = _wdt(cfg)
    return _single_step_rhs(p_ctrl, cfg, carry, stack_rhs(*xsL, w),
                            stack_rhs(*xsR, w), key, train)


def _single_step_rhs(p_ctrl, cfg: BiEARConfig, carry, rhsL, rhsR,
                     key=None, train: bool = False, drops=None):
    """single_step body on pre-stacked per-ear rhs (B, F, 4)."""
    c = frontend_constants(cfg)
    beta = 0.8
    Q, h, memL, memR = carry

    YL, ZreL, ZimL = filterbank_apply_rhs(Q, c["fc"], c["f_fft"], rhsL,
                                          w_dtype=_wdt(cfg), vjp=cfg.fb_vjp,
                                          x_grad=cfg.fb_x_grad)
    YR, ZreR, ZimR = filterbank_apply_rhs(Q, c["fc"], c["f_fft"], rhsR,
                                          w_dtype=_wdt(cfg), vjp=cfg.fb_vjp,
                                          x_grad=cfg.fb_x_grad)
    out = (YL, YR, Q, band_phase(ZreL, ZimL), band_phase(ZreR, ZimR))

    if cfg.freeze_q:
        Q_init = jnp.broadcast_to(jnp.asarray(c["Q0"])[None], Q.shape)
        return (Q_init, jnp.zeros_like(h),
                jnp.zeros_like(memL), jnp.zeros_like(memR)), out

    YL_ctrl = jnp.log1p(jnp.maximum(YL, 0.0))
    YR_ctrl = jnp.log1p(jnp.maximum(YR, 0.0))
    feat = jnp.concatenate([YL_ctrl, memL, YR_ctrl, memR], axis=-1)
    delta, h = controller_step(p_ctrl, cfg, h, feat, key, train, drops)
    Qn = _next_q(cfg, c, delta)
    Qn, h = _finite_reset(Qn, h, c["Q0"][None])
    memL = beta * memL + (1.0 - beta) * jax.lax.stop_gradient(YL_ctrl)
    memR = beta * memR + (1.0 - beta) * jax.lax.stop_gradient(YR_ctrl)
    return (Qn, h, memL, memR), out


def single_frontend(params, cfg: BiEARConfig, wavL, wavR, rng, train: bool):
    """One shared controller drives the same Q for both ears.

    Parity: BinauralAdaptiveGammatoneFB_SingleController
    (model_torch.py:579-776), including the PERSISTENT beta=0.8 EMA
    memories updated after the controller step."""
    XmagL, XreL, XimL = spectra(cfg, wavL)
    XmagR, XreR, XimR = spectra(cfg, wavR)
    if cfg.fixed_frontend_q:
        YL, QL, phL = fixed_forward(cfg, XmagL, XreL, XimL)
        YR, QR, phR = fixed_forward(cfg, XmagR, XreR, XimR)
        return YL, YR, QL, QR, phL, phR

    c = frontend_constants(cfg)
    p_ctrl = params["ctrl"]
    B = wavL.shape[0]
    T = cfg.timesteps
    Q_init = jnp.broadcast_to(c["Q0"][None], (B, cfg.n_bands))
    carry0 = (Q_init,
              jnp.zeros((B, cfg.ctrl_hidden), XmagL.dtype),
              jnp.zeros((B, cfg.n_bands), XmagL.dtype),
              jnp.zeros((B, cfg.n_bands), XmagL.dtype))

    sw = lambda a: jnp.swapaxes(a, 0, 1)
    w = _wdt(cfg)
    rhsL = sw(stack_rhs(XmagL, XreL, XimL, w))           # (T, B, F, 4)
    rhsR = sw(stack_rhs(XmagR, XreR, XimR, w))
    masks = _scan_dropout_masks(cfg, rng, T, B, train)

    if masks is None:
        def step(carry, xs):
            return _single_step_rhs(p_ctrl, cfg, carry, xs[0], xs[1],
                                    train=train)
        xs = (rhsL, rhsR)
    else:
        def step(carry, xs):
            return _single_step_rhs(p_ctrl, cfg, carry, xs[0], xs[1],
                                    train=train, drops=xs[2])
        xs = (rhsL, rhsR, masks)
    body = jax.checkpoint(step) if _effective_remat(cfg, B) else step
    _, (YL, YR, Q, phL, phR) = jax.lax.scan(body, carry0, xs)
    return sw(YL), sw(YR), sw(Q), sw(Q), sw(phL), sw(phR)


# ---------------- AuralNet fixed FB (no phase, vectorised) ----------------

def auralnet_fb(cfg: BiEARConfig, wav):
    """AuralNetGammatoneFB parity (model_torch.py:161-195): magnitude-only
    fixed filterbank, fully vectorised over T."""
    c = frontend_constants(cfg)
    Xmag, _, _ = spectra(cfg, wav)
    Y = jnp.einsum("btf,nf->btn", Xmag, c["W_fixed"],
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.nan_to_num(Y, nan=0.0, posinf=0.0, neginf=0.0)

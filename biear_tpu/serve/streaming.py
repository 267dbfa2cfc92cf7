"""Streaming (frame-by-frame) inference for the active BiEAR models.

The reference is strictly offline: DeepEarActiveWaveform.forward
(model_torch.py:965-1112) consumes a whole 1 s binaural crop at once.
Its computation, however, is frame-recurrent end to end — the adaptive-Q
filterbank is a per-frame feedback loop, the backend encoders are GRUs,
and the readout is a time-MEAN of encoder states — so it admits an exact
streaming decomposition, which is what a real-time localisation
deployment needs: audio arrives one hop (~52.6 ms) at a time, and the
serving process must update beliefs per hop instead of re-running a full
1 s forward per hop (a T× compute saving and a T-frame latency saving).

This module provides that path:

    state = stream_init(params, cfg, batch)
    for each hop-sized chunk:  state = stream_step(params, cfg, state, cL, cR)
    sound, aoa, dist = stream_readout(params, cfg, state[, tailL, tailR])

Equivalence contract (tests/test_streaming.py): feeding the 1 s crop as
cfg.timesteps hop-chunks (+ the fs - T*hop residual samples to
stream_readout) reproduces active_forward(train=False) on the same crop —
frontend/encoder state math is the identical code (frontend.adaptive_step /
single_step are the scan bodies; layers.gru_step is gru_seq's cell), so
those agree bit-for-bit; the only tolerance-level difference is the CC
feature, whose mean-removal is applied as an exact algebraic correction
at readout rather than up front (different float accumulation order).

Streaming state is a plain pytree and every function here is jittable
with cfg static, so a serving loop is one compiled step per hop. The
carry per stream at batch 1 is ~tens of KB — thousands of concurrent
streams fit on one chip by batching the state (the batch axis IS the
concurrent-streams axis).

Not streamable: AuralNet (self-attention needs all T frames — the
encoder attends globally, model_torch.py:778-826) and the passive model
(its inputs are whole-utterance offline features).

Design notes:
  * Continuous operation past T frames is well-defined: the encoder
    readout is a running mean over ALL frames seen (state["t"] counts
    them) and the CC readout corrects means over all samples seen.
    Equality with the batch forward holds exactly at t == cfg.timesteps,
    because frame_1s crops the batch path to T frames (ops/framing.py).
  * Only hop_ratio == 1.0 configs stream (win == hop, zero overlap —
    every shipped preset). Overlapping frames would need a partial-frame
    sample buffer; raise instead of silently mis-framing.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models.config import BiEARConfig
from ..models import biear as M
from ..models import frontend as F
from ..models import layers as L
from ..ops.framing import frame_params
from ..ops.xcorr import _lag_plan, _interp_to_lags


# ---------------- static plan ----------------

@functools.lru_cache(maxsize=None)
def stream_plan(cfg: BiEARConfig):
    """Static streaming geometry for a config: frame size, CC lag window,
    and the residual tail the 1 s parity protocol leaves after T frames."""
    win, hop = frame_params(cfg.fs, cfg.timesteps, cfg.hop_ratio)
    if win != hop:
        raise NotImplementedError(
            "streaming inference requires hop_ratio == 1.0 (win == hop); "
            f"got win={win}, hop={hop}")
    kept, j0, w = _lag_plan(cfg.fs, cfg.fs, 100, 3.0)
    K = int(np.max(np.abs(kept)))
    if len(kept) != 2 * K + 1:
        raise AssertionError("CC lag window is not contiguous")
    if win < K:
        raise NotImplementedError(
            f"first chunk must cover the CC head buffer: win={win} < K={K}")
    return {"win": win, "hop": hop, "K": K, "j0": j0, "w": w,
            "tail_len": cfg.fs - cfg.timesteps * hop}


# ---------------- state ----------------

def _enc_init(batch: int, latent: int):
    # GRU1 hidden is 200 across the reference family (models/biear.py
    # _backend_init); GRU2 hidden is the latent dim.
    return {"h1": jnp.zeros((batch, 200), jnp.float32),
            "h2": jnp.zeros((batch, latent), jnp.float32),
            "sum": jnp.zeros((batch, latent), jnp.float32)}


def stream_init(params, cfg: BiEARConfig, batch: int):
    """Fresh streaming state for `batch` concurrent streams."""
    p = stream_plan(cfg)
    c = F.frontend_constants(cfg)
    B, N, H, K = batch, cfg.n_bands, cfg.ctrl_hidden, p["K"]

    Q0 = jnp.broadcast_to(jnp.asarray(c["Q0"])[None], (B, N))
    if cfg.fixed_frontend_q:
        fe = ()
    elif cfg.controller_mode == "single":
        fe = (Q0, jnp.zeros((B, H), jnp.float32),
              jnp.zeros((B, N), jnp.float32), jnp.zeros((B, N), jnp.float32))
    else:  # dual: ear-stacked (2, ...) carry, matching dual_frontend's vmap
        fe = (jnp.broadcast_to(Q0[None], (2, B, N)),
              jnp.zeros((2, B, H), jnp.float32))

    # t and cc.n are PER-STREAM (B,) counters, not scalars: under stream
    # churn (slots re-initialised mid-flight by stream_reset) each
    # stream's running means divide by its OWN frame/sample count.
    state = {"t": jnp.zeros((B,), jnp.int32), "fe": fe,
             "ild": _enc_init(batch, cfg.latent_dim),
             "ipd": _enc_init(batch, cfg.latent_dim)}
    if cfg.use_cc:
        z = lambda *s: jnp.zeros(s, jnp.float32)
        state["cc"] = {"raw": z(B, 2 * K + 1),
                       "n": jnp.zeros((B,), jnp.int32),
                       "sumL": z(B), "sumR": z(B),
                       "headL": z(B, K), "headR": z(B, K),
                       "tailL": z(B, K), "tailR": z(B, K)}
    return state


def stream_reset(params, cfg: BiEARConfig, state, mask):
    """Re-initialise the masked slots (stream churn: an utterance ended
    and a NEW stream takes its batch slot). mask: (B,) bool, True = slot
    restarts fresh. Untouched slots are bit-identical to before; reset
    slots are bit-identical to a stream_init slot — so a post-churn slot
    reproduces an independent fresh stream exactly (tested in
    tests/test_streaming.py)."""
    B = mask.shape[0]
    fresh = stream_init(params, cfg, B)
    dual = not cfg.fixed_frontend_q and cfg.controller_mode != "single"

    def sel(axis):
        def f(s0, s):
            m = jnp.reshape(mask, (1,) * axis + (B,)
                            + (1,) * (s.ndim - axis - 1))
            return jnp.where(m, s0, s)
        return f

    out = {}
    for k in state:
        # dual-mode frontend carry is ear-stacked (2, B, ...): the
        # streams axis sits at 1; everywhere else it leads.
        axis = 1 if (k == "fe" and dual) else 0
        out[k] = jax.tree.map(sel(axis), fresh[k], state[k])
    return out


# ---------------- CC accumulator ----------------

def _cc_accumulate(cc, chunkL, chunkR, K: int):
    """Fold one chunk (B, w) per ear into the raw-lag accumulator.

    raw[l] accumulates sum_m left[m + l] * right[m] over the RAW (not yet
    mean-removed) signals, assigning each product pair to the chunk that
    contains its LATER index, so only a K-sample look-back halo (the tail
    buffers) is needed; the mean removal of ops/xcorr.py:112-113 is applied
    as an exact closed-form correction in _cc_readout."""
    B, w = chunkL.shape
    extL = jnp.concatenate([cc["tailL"], chunkL], axis=1)   # (B, K + w)
    extR = jnp.concatenate([cc["tailR"], chunkR], axis=1)
    ls = np.arange(-K, K + 1)
    pbase = K + np.arange(w)[None, :]
    pL = pbase + np.minimum(ls, 0)[:, None]                 # (2K+1, w)
    pR = pbase - np.maximum(ls, 0)[:, None]
    contrib = jnp.einsum("blw,blw->bl", extL[:, pL], extR[:, pR],
                         precision=jax.lax.Precision.HIGHEST)

    first = (cc["n"] == 0)[:, None]                     # per-stream (B, 1)
    if w >= K:
        head = lambda old, chunk: jnp.where(first, chunk[:, :K], old)
    else:
        # Narrow chunks can never be the first one (stream_plan asserts
        # win >= K), so the head buffer is already captured.
        head = lambda old, chunk: old
    tail = lambda old, chunk: jnp.concatenate([old, chunk], axis=1)[:, -K:]
    return {"raw": cc["raw"] + contrib, "n": cc["n"] + w,
            "sumL": cc["sumL"] + jnp.sum(chunkL, axis=1),
            "sumR": cc["sumR"] + jnp.sum(chunkR, axis=1),
            "headL": head(cc["headL"], chunkL),
            "headR": head(cc["headR"], chunkR),
            "tailL": tail(cc["tailL"], chunkL),
            "tailR": tail(cc["tailR"], chunkR)}


def _cc_readout(cc, plan):
    """Accumulated raw lags -> the x3 feature (B, 100).

    Exact mean-removal correction: with a = |l| and per-lag overlap n - a,
      centered[l] = raw[l] - muL * S_R(l) - muR * S_L(l) + (n - a) muL muR
    where S_R/S_L are the raw sums over each lag's valid overlap — the
    full sums minus a head or tail edge sum (head/tail buffers hold the
    first/last K samples, K = max kept lag). Then the peak-normalise +
    resample stage is shared verbatim with the batch path
    (ops/xcorr._interp_to_lags)."""
    K = plan["K"]
    n = jnp.maximum(cc["n"].astype(jnp.float32), 1.0)   # per-stream (B,)
    muL = cc["sumL"] / n
    muR = cc["sumR"] / n

    ls = np.arange(-K, K + 1)
    a = np.abs(ls)
    pos = (ls >= 0)[None, :]
    cum = lambda b: jnp.pad(jnp.cumsum(b, axis=1), ((0, 0), (1, 0)))
    headL, headR = cum(cc["headL"])[:, a], cum(cc["headR"])[:, a]
    tailL = cum(cc["tailL"][:, ::-1])[:, a]
    tailR = cum(cc["tailR"][:, ::-1])[:, a]

    S_R = cc["sumR"][:, None] - jnp.where(pos, tailR, headR)
    S_L = cc["sumL"][:, None] - jnp.where(pos, headL, tailL)
    centered = (cc["raw"] - muL[:, None] * S_R - muR[:, None] * S_L
                + (n[:, None] - a[None, :]) * (muL * muR)[:, None])
    return _interp_to_lags(centered, jnp.asarray(plan["j0"]),
                           jnp.asarray(plan["w"]))


# ---------------- per-frame step ----------------

def _frame_spectra(cfg: BiEARConfig, chunk):
    """(B, win) chunk -> (xmag, xre, xim), each (B, F): the per-frame body
    of frontend.spectra (same periodic-Hann window, same n_fft pad), with
    the SAME cfg.dft_mode resolution — the stream-vs-batch exactness
    contract requires both paths to pick the same implementation."""
    c = F.frontend_constants(cfg)
    if cfg.use_dft_matmul:
        re = jnp.einsum("bw,wf->bf", chunk, c["dft_re"],
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("bw,wf->bf", chunk, c["dft_im"],
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im), re, im
    X = jnp.fft.rfft(chunk * c["window"], n=cfg.n_fft)
    return jnp.abs(X), X.real, X.imag


def _frontend_step(params, cfg: BiEARConfig, fe, xsL, xsR):
    """One frame through the configured frontend. Returns
    (fe', YL, YR, phaseL, phaseR), Y/phase (B, N)."""
    if cfg.fixed_frontend_q:
        ex = lambda xs: tuple(x[:, None] for x in xs)      # (B, 1, F)
        YL, _, phL = F.fixed_forward(cfg, *ex(xsL))
        YR, _, phR = F.fixed_forward(cfg, *ex(xsR))
        return fe, YL[:, 0], YR[:, 0], phL[:, 0], phR[:, 0]

    if cfg.controller_mode == "single":
        fe, (YL, YR, _, phL, phR) = F.single_step(
            params["bifb"]["ctrl"], cfg, fe, xsL, xsR)
        return fe, YL, YR, phL, phR

    # dual: vmap the monaural step over the ear-stacked controller params
    # and carry — the same structure dual_frontend scans (frontend.py).
    xm = jnp.stack([xsL[0], xsR[0]])
    xr = jnp.stack([xsL[1], xsR[1]])
    xi = jnp.stack([xsL[2], xsR[2]])
    step = lambda pc, carry, a, b, c_: F.adaptive_step(pc, cfg, carry, a, b, c_)
    fe, (Y, _, ph) = jax.vmap(step)(params["bifb"]["fb"], fe, xm, xr, xi)
    return fe, Y[0], Y[1], ph[0], ph[1]


def _enc_step(p, enc, x):
    """One frame through an encoder: LN -> GRU(→200) -> GRU(→100), running
    sum of the second GRU's state (the batch path time-means it,
    backend._encode)."""
    x = L.layer_norm(p["in_norm"], x)
    h1 = L.gru_step(p["gru1"], enc["h1"], x)
    h2 = L.gru_step(p["gru2"], enc["h2"], h1)
    return {"h1": h1, "h2": h2, "sum": enc["sum"] + h2}


def stream_step(params, cfg: BiEARConfig, state, chunkL, chunkR):
    """Advance all streams by one frame. chunkL/chunkR: (B, hop) new
    samples per ear (hop == win under hop_ratio 1.0)."""
    plan = stream_plan(cfg)
    chunkL = chunkL.astype(jnp.float32)
    chunkR = chunkR.astype(jnp.float32)

    xsL = _frame_spectra(cfg, chunkL)
    xsR = _frame_spectra(cfg, chunkR)
    fe, YL, YR, phL, phR = _frontend_step(params, cfg, state["fe"], xsL, xsR)

    x1 = jnp.clip(jnp.log(YL + 1e-8), -12.0, 12.0)
    x2 = jnp.clip(jnp.log(YR + 1e-8), -12.0, 12.0)
    ild = jnp.clip(jnp.nan_to_num(x1 - x2, nan=0.0, posinf=0.0, neginf=0.0),
                   -10.0, 10.0)
    d = phL - phR
    ipd = jnp.nan_to_num(jnp.arctan2(jnp.sin(d), jnp.cos(d)),
                         nan=0.0, posinf=0.0, neginf=0.0)

    out = {"t": state["t"] + 1, "fe": fe,
           "ild": _enc_step(params["encoder_ild"], state["ild"], ild),
           "ipd": _enc_step(params["encoder_ipd"], state["ipd"], ipd)}
    if cfg.use_cc:
        out["cc"] = _cc_accumulate(state["cc"], chunkL, chunkR, plan["K"])
    return out


def stream_readout(params, cfg: BiEARConfig, state, tailL=None, tailR=None):
    """Current belief from the streaming state: (sound_logits (B, 8),
    aoa (B, 8) in [0, 1], dist_logits (B, 8, C)).

    tailL/tailR: optional residual samples that belong to no frame (the
    1 s protocol leaves fs - T*hop of them) — they update only the CC
    statistics, exactly as the batch path correlates the full crop."""
    plan = stream_plan(cfg)
    cc = state.get("cc")
    if cc is not None and tailL is not None and tailL.shape[1]:
        cc = _cc_accumulate(cc, tailL.astype(jnp.float32),
                            tailR.astype(jnp.float32), plan["K"])

    t = jnp.maximum(state["t"].astype(jnp.float32), 1.0)[:, None]
    nz = lambda z: jnp.nan_to_num(z, nan=0.0, posinf=0.0, neginf=0.0)
    z_ild = nz(state["ild"]["sum"] / t)
    z_ipd = nz(state["ipd"]["sum"] / t)
    x3 = _cc_readout(cc, plan) if cc is not None else None
    return M._heads(params, cfg, z_ild, z_ipd, x3, None, False)


def stream_apply(params, cfg: BiEARConfig, wavL, wavR):
    """Run a whole (B, fs) crop through the streaming path (a lax.scan of
    stream_step over its T hop-chunks + the residual tail) — the
    process-a-file-in-streaming-mode deployment path, and the equivalence
    harness the tests drive against active_forward."""
    plan = stream_plan(cfg)
    hop, T = plan["hop"], cfg.timesteps
    B = wavL.shape[0]
    chunks = lambda w: jnp.swapaxes(
        w[:, :T * hop].reshape(B, T, hop), 0, 1)            # (T, B, hop)

    state0 = stream_init(params, cfg, B)

    def body(st, ch):
        return stream_step(params, cfg, st, ch[0], ch[1]), None

    state, _ = jax.lax.scan(
        body, state0, (chunks(wavL), chunks(wavR)))
    tl = plan["tail_len"]
    tailL = wavL[:, T * hop:T * hop + tl]
    tailR = wavR[:, T * hop:T * hop + tl]
    return stream_readout(params, cfg, state, tailL, tailR)

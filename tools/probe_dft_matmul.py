#!/usr/bin/env python
"""Probe: windowed DFT-as-matmul vs XLA rFFT for the frame spectra.

The frontends' spectra stage (models/frontend.py:spectra) computes
`rfft(frames * hann, n=1024)` over (B*T, 842)-row frames. On TPU, XLA's
FFT runs on the VPU; the same transform is a pair of (842, 513) real
matmuls (cos/sin DFT bases with the Hann window and the implicit
zero-padding folded into the basis), which ride the MXU instead.

Measures, on the real chip with the repo's device_get-synced chained
methodology:
  1. accuracy of the matmul spectra vs f32 rfft (bf16 and f32 operand
     policies), on representative synthesized waveforms;
  2. speed of the two formulations, chained over many iterations.

Writes docs/dft_matmul_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from biear_tpu.models.config import BiEARConfig
from biear_tpu.models import frontend as F


def dft_bases(win: int, n_fft: int, n_freq: int, window: np.ndarray):
    """(win, F) cos/sin DFT bases with the window folded in.

    rfft(pad(w * x, n_fft))[k] = sum_n w[n] x[n] exp(-2i pi k n / n_fft)
    for n in [0, win) — the zero-pad contributes nothing, so the basis
    only spans the win real samples.
    """
    n = np.arange(win)[:, None].astype(np.float64)
    k = np.arange(n_freq)[None, :].astype(np.float64)
    ang = -2.0 * np.pi * n * k / n_fft
    Cre = (window[:, None].astype(np.float64) * np.cos(ang)).astype(np.float32)
    Cim = (window[:, None].astype(np.float64) * np.sin(ang)).astype(np.float32)
    return Cre, Cim


def spectra_fft(cfg, wav):
    return F.spectra(cfg, wav)


def make_spectra_dft(cfg, dtype):
    c = F.frontend_constants(cfg)
    Cre, Cim = dft_bases(c["win"], cfg.n_fft, cfg.n_freq, c["window"])

    def run(wav):
        frames = F.frame_1s(wav, cfg.fs, cfg.timesteps, c["win"], c["hop"])
        fr = frames.astype(dtype)
        re = jnp.einsum("btw,wf->btf", fr, jnp.asarray(Cre, dtype),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        im = jnp.einsum("btw,wf->btf", fr, jnp.asarray(Cim, dtype),
                        precision=jax.lax.Precision.DEFAULT,
                        preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im), re, im
    return run


def chained(fn, wav, iters):
    """Chain `iters` dependent evaluations (sum of outputs feeds a bias on
    the input) so dispatch can't pipeline past compute; end with device_get."""
    def body(carry, _):
        mag, re, im = fn(wav + carry * 1e-12)
        s = jnp.float32(mag.sum() + re.sum() + im.sum())
        return s, ()
    def run(w):
        s, _ = jax.lax.scan(lambda c, x: body(c, x), jnp.float32(0.0),
                            None, length=iters)
        return s
    return jax.jit(run)


def main():
    cfg = BiEARConfig()
    B = 1024  # both ears of the production batch 512
    rng = np.random.default_rng(0)
    # Speech-ish test signal: sum of modulated tones + noise, int16-scale
    t = np.arange(16000) / 16000.0
    wav = sum(np.sin(2 * np.pi * f * t[None] * (1 + 0.01 * rng.standard_normal((B, 1))))
              for f in (220.0, 880.0, 3500.0))
    wav = (wav + 0.1 * rng.standard_normal((B, 16000))).astype(np.float32)
    wav /= np.abs(wav).max()
    wav_d = jax.device_put(jnp.asarray(wav))

    out = {"what": "windowed DFT-as-matmul vs XLA rfft for frontend spectra",
           "batch_rows": B * cfg.timesteps}

    # ---- accuracy ----
    ref = jax.jit(lambda w: spectra_fft(cfg, w))(wav_d)
    ref = [np.asarray(x, np.float64) for x in ref]
    # Normalisation spans ALL reference components (mag, re, im) so the
    # "_vs_specmax" suffix means what it says; mag's max >= re/im max, so
    # this is the spectrum max, not just the re/im max.
    scale = max(np.abs(r).max() for r in ref)
    for name, dtype in (("bf16", jnp.bfloat16), ("f32_default", jnp.float32)):
        got = jax.jit(make_spectra_dft(cfg, dtype))(wav_d)
        got = [np.asarray(x, np.float64) for x in got]
        errs = {}
        for comp, r, g in zip(("mag", "re", "im"), ref, got):
            errs[comp] = {
                "max_abs_vs_specmax": float(np.abs(r - g).max() / scale),
                "rms_vs_specrms": float(np.sqrt(((r - g) ** 2).mean())
                                        / np.sqrt((r ** 2).mean())),
            }
        out[f"accuracy_{name}"] = errs

    # ---- speed (chained, device_get-synced) ----
    ITERS = 50
    runs = {
        "rfft": chained(lambda w: spectra_fft(cfg, w), wav_d, ITERS),
        "dft_bf16": chained(make_spectra_dft(cfg, jnp.bfloat16), wav_d, ITERS),
        "dft_f32_default": chained(make_spectra_dft(cfg, jnp.float32), wav_d, ITERS),
    }
    for name, fn in runs.items():
        jax.device_get(fn(wav_d))  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(fn(wav_d))
            times.append((time.perf_counter() - t0) / ITERS * 1e3)
        out[f"ms_per_call_{name}"] = {"median": float(np.median(times)),
                                      "all": [round(x, 4) for x in times]}

    path = os.path.join(REPO, "docs", "dft_matmul_probe.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

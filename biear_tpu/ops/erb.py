"""ERB (equivalent rectangular bandwidth) utilities and the deltaQ profile.

Capability parity with the reference's ERB math (model_torch.py:19-51):
Glasberg & Moore ERB bandwidth / ERB-rate scale, N center frequencies
equally spaced on the ERB-rate axis, the baseline Q factor Q0 = fc / bw,
and the per-band maximum-deltaQ profile used by the adaptive-Q controller.

All functions are pure jnp and differentiable; the fc/Q0 grids are static
model constants so they are typically computed once at model build time in
float64-free numpy-compatible float32.
"""

from __future__ import annotations

import jax.numpy as jnp


def erb_hz(f_hz):
    """ERB bandwidth (Hz) at center frequency f (Glasberg & Moore).

    Parity: model_torch.py:19-20."""
    return 24.7 * (4.37 * f_hz / 1000.0 + 1.0)


def erb_rate(f_hz):
    """ERB-rate (number of ERBs below f). Parity: model_torch.py:22-23."""
    return 21.4 * jnp.log10(4.37 * f_hz / 1000.0 + 1.0)


def inv_erb_rate(E):
    """Inverse of erb_rate. Parity: model_torch.py:25-26."""
    return (10.0 ** (E / 21.4) - 1.0) * 1000.0 / 4.37


def erb_spaced_fc_and_q(N: int = 100, fmin: float = 50.0, fmax: float = 7200.0,
                        erb_factor: float = 1.019):
    """N center freqs equally spaced on the ERB-rate axis plus baseline Q.

    bw = erb_factor * ERB(fc); Q0 = fc / bw.  Parity: model_torch.py:28-34.

    These are static model constants, so the grid is constructed in numpy
    float64 (like the reference) and cast to float32 once.

    Returns (fc, Q0), both (N,) float32 NUMPY arrays. Static constants stay
    numpy on purpose: jnp ops lift them per-trace, whereas materialising
    them with jnp at trace time would create (and potentially cache) leaked
    tracers.
    """
    import numpy as np
    Emin = 21.4 * np.log10(4.37 * fmin / 1000.0 + 1.0)
    Emax = 21.4 * np.log10(4.37 * fmax / 1000.0 + 1.0)
    E = np.linspace(Emin, Emax, N)
    fc = (10.0 ** (E / 21.4) - 1.0) * 1000.0 / 4.37
    bw = erb_factor * (24.7 * (4.37 * fc / 1000.0 + 1.0))
    Q0 = fc / bw
    return fc.astype(np.float32), Q0.astype(np.float32)


def make_deltaQ_profile(fc_hz, deltaQ_base: float = 2.0,
                        low_factor: float = 0.5, high_factor: float = 1.0):
    """Per-band maximum |deltaQ| the controller may apply.

    Normalises the ERB-rate of fc to [0, 1], linearly interpolates
    low_factor -> high_factor along it, scales by deltaQ_base and clamps
    at >= 1e-3, so low bands move little and high bands a lot.
    Parity: model_torch.py:36-51. Like the reference (which round-trips the
    fc buffer through numpy), this static constant is computed host-side in
    numpy float32 — XLA's f32 log10 is slightly less accurate than numpy's.
    """
    import numpy as np
    fc_np = np.asarray(fc_hz, dtype=np.float32)
    E = 21.4 * np.log10(4.37 * fc_np / 1000.0 + 1.0)
    E = (E - E.min()) / (E.max() - E.min() + 1e-12)
    mult = low_factor + (high_factor - low_factor) * E
    deltaQ_vec = deltaQ_base * mult
    return np.clip(deltaQ_vec, 1e-3, None).astype(np.float32)


# --- The offline feature library uses a second ERB parameterisation ---
# (utils.py:12-52): hz2erb/erb2hz are algebraically the same scale, but the
# offline Gaussian filterbank uses bw = 1.5 * ERB(fc) (vs 1.019 in-model)
# and fmax defaults to fs/2 (vs 0.9*fs/2). Kept separate on purpose: the
# two filter families are NOT numerically identical in the reference.

def hz2erb(f):
    return 21.4 * jnp.log10(4.37e-3 * f + 1.0)


def erb2hz(e):
    return (10.0 ** (e / 21.4) - 1.0) / 4.37e-3


def erb_space(fmin, fmax, n_band):
    """n_band center frequencies equally spaced on the ERB axis (utils.py:20-25)."""
    return erb2hz(jnp.linspace(hz2erb(jnp.float32(fmin)), hz2erb(jnp.float32(fmax)), n_band))

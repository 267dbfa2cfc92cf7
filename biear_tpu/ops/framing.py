"""Waveform framing for the frontends.

TPU-first restructure of the reference framing (model_torch.py:289-312):
instead of a per-step Python loop, all T frames are materialised at once as
a static-shape gather so the subsequent Hann window + rFFT batch over
(B, T) and hit XLA's fused FFT. Shapes are fully static under jit.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _hann_cache(win: int):
    import numpy as np
    n = np.arange(win)
    return np.asarray(0.5 * (1.0 - np.cos(2.0 * np.pi * n / win)), dtype=np.float32)


def hann_window_periodic(win: int):
    """Periodic Hann window, matching torch.hann_window(win) (periodic=True).

    Note numpy.hanning is the *symmetric* variant (denominator win-1); the
    reference uses torch's periodic default, so we build it explicitly.
    Returns a numpy array (a static constant — safe to cache across traces;
    jnp consumers lift it per-trace)."""
    return _hann_cache(win)


def frame_params(fs: int, timesteps: int, hop_ratio: float = 1.0):
    """win = round(fs / timesteps), hop = max(1, round(win * hop_ratio)).

    Parity: model_torch.py:226-230 (and 109-114)."""
    win = int(round(fs / timesteps))
    hop = max(1, int(round(win * hop_ratio)))
    return win, hop


def frame_1s(wav: jnp.ndarray, fs: int, timesteps: int, win: int, hop: int) -> jnp.ndarray:
    """Frame a ~1 s waveform (B, Nsamp) into exactly `timesteps` frames (B, T, win).

    Behaviour parity with the reference `_frame_1s` (model_torch.py:289-312):
      - pad/crop the waveform to exactly `fs` samples,
      - pad up to `win` if fs < win,
      - unfold with (win, hop), crop or zero-pad the frame axis to T.

    All branches resolve at trace time (static shapes), so under jit this is
    a single reshape/gather.
    """
    B, nsamp = wav.shape
    target = fs
    if nsamp < target:
        wav = jnp.pad(wav, ((0, 0), (0, target - nsamp)))
    else:
        wav = wav[:, :target]
    if target < win:
        wav = jnp.pad(wav, ((0, 0), (0, win - target)))
        target = win

    n_avail = (target - win) // hop + 1
    T = timesteps
    n_take = min(n_avail, T)
    # (n_take, win) gather indices: start of each frame + offset in frame.
    starts = jnp.arange(n_take) * hop
    idx = starts[:, None] + jnp.arange(win)[None, :]
    frames = wav[:, idx]  # (B, n_take, win)
    if n_take < T:
        frames = jnp.pad(frames, ((0, 0), (0, T - n_take), (0, 0)))
    return frames

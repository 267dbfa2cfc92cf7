"""On-device passive-feature synthesis: the reference's offline H5
precompute fused into the training stream.

The reference's passive model (DeepEarTorchILD, model_torch.py:938-960)
can only train from a pre-generated H5: wav pairs are pushed through a
CPU librosa STFT -> gammatone weighting -> mag-dB/phase stage offline
(create_h5_data/data_save.py:122-164) and the 5-feature tensors are
stored. Here the same features (`ops.features.passive_features`, the
batched jnp port of `utils.py:233-388`; CC from `ops.xcorr`) are
computed on the TPU from the on-device synthesizer's waveforms, so the
passive family trains with NO offline stage at all — same contract as
the active path's fused synthesize->train chunk (train/loop.py:
make_train_chunk).

`PassiveFeatureSynth` wraps any waveform synthesizer exposing the
(sample_batch / batch_fn / bank / set_output_sharding) surface
(AnechoicSynthesizer, ReverbSynthesizer) and re-emits each
(wavL, wavR, x3, y) batch as the passive 6-tuple
(x1 magL, x2 magR, x3 CC, x4 phaseL, x5 phaseR, y) — the exact layout
_passive_loss / passive_forward consume (train/loop.py:151-157).
"""
from __future__ import annotations

import functools

from ..ops.features import passive_features


class PassiveFeatureSynth:
    """Adapter: waveform synthesizer -> passive 5-feature batches.

    The feature transform runs wherever the caller runs: eagerly for
    SynthEvalDataset split materialisation, traced inside the fused
    train-chunk jit for the training stream (batch_fn). Constants built
    by `passive_features` (Hann window, gammatone weight matrix) are
    host numpy, baked into the jaxpr as literals — NOT captured device
    arrays, so the tunnel's re-stream trap (synth.py `bank` docstring)
    does not apply.
    """

    def __init__(self, inner, data_dim: int = 100, timesteps: int = 19,
                 fmin: float = 50.0, fmax=None):
        self.inner = inner
        self.data_dim = int(data_dim)
        self.timesteps = int(timesteps)
        self.fmin = float(fmin)
        self.fmax = fmax
        # surface passthroughs the runner/SynthEvalDataset consult
        self.fs = inner.fs
        self.num_lags = getattr(inner, "num_lags", 100)
        # per-row element count for SynthEvalDataset's HBM estimate:
        # 4 x (T, D) feature planes + CC + 56-wide label row
        self.row_elems = (4 * self.timesteps * self.data_dim
                          + self.num_lags + 56)

    @property
    def bank(self):
        return self.inner.bank

    def set_output_sharding(self, sharding):
        self.inner.set_output_sharding(sharding)

    def _to_passive(self, batch):
        wavL, wavR, x3, y = batch[:4]
        x1, x4 = passive_features(wavL, self.fs, self.data_dim,
                                  self.timesteps, self.fmin, self.fmax)
        x2, x5 = passive_features(wavR, self.fs, self.data_dim,
                                  self.timesteps, self.fmin, self.fmax)
        return (x1, x2, x3, x4, x5, y) + tuple(batch[4:])

    def sample_batch(self, key, batch_size: int, n_src: int | None = None):
        return self._to_passive(
            self.inner.sample_batch(key, batch_size, n_src=n_src))

    def batch_fn(self, batch_size: int, n_src: int | None = None):
        """Pure (bank, key) -> passive batch for use inside a caller's
        jit (same contract as the inner synthesizer's batch_fn)."""
        inner_fn = self.inner.batch_fn(batch_size, n_src)
        return functools.partial(_passive_batch, inner_fn, self.fs,
                                 self.data_dim, self.timesteps, self.fmin,
                                 self.fmax)


def _passive_batch(inner_fn, fs, data_dim, timesteps, fmin, fmax,
                   bank, key):
    wavL, wavR, x3, y = inner_fn(bank, key)[:4]
    x1, x4 = passive_features(wavL, fs, data_dim, timesteps, fmin, fmax)
    x2, x5 = passive_features(wavR, fs, data_dim, timesteps, fmin, fmax)
    return x1, x2, x3, x4, x5, y

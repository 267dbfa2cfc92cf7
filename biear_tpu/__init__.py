"""biear_tpu — a TPU-native (JAX/XLA/Pallas) framework for binaural sound
localisation and distance estimation, rebuilt from scratch with the
capabilities of the BiEAR reference (ERB-spaced gammatone filterbank with a
learnable per-frame/per-band Q factor feeding a joint 8-sector
presence/AoA/distance backend).

Layer map (mirrors the reference's five layers, re-architected TPU-first):

  ops/       — pure-jnp DSP: ERB math, framing, Gaussian filterbanks,
               cross-correlation, offline feature library; Pallas kernels
               for the hot filterbank-apply op.
  models/    — functional (pytree-parameter) model definitions: adaptive /
               fixed / single-controller gammatone frontends (lax.scan),
               ILD/IPD GRU encoders, body MLP, 8 vmapped sub-heads, the
               flagship DeepEarActive model, the passive model and the
               AuralNet attention baseline.
  data/      — H5 readers/writers (active 4-tuple and passive 6-tuple
               schemas), label packing, host-side input pipeline, on-device
               binaural synthesis.
  train/     — losses/metrics, optax multi-group optimizer with per-group
               clipping, jit/shard_map train step with masked nonfinite
               handling, orbax checkpointing, plateau LR schedule.
  parallel/  — device mesh + sharding rules (data / model axes).
  utils/     — metric logging, profiling, torch-checkpoint import.

Constants match the reference contract (model_torch.py:11-14).
"""

N_SECTORS = 8
N_DIST_CLASS = 5
DATA_DIM = 100
LATENT_DIM = 100

__version__ = "0.1.0"

"""Model configuration.

One frozen dataclass covers the whole experiment matrix of the reference's
builders (model_torch.py:1252-1367): passive / active, dual vs single
Q-controller, fixed vs adaptive frontend Q, CC feature on/off, the deltaQ
profile, and the AuralNet baseline's d_model. Frozen + hashable so it can
be a static argument to jit.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class BiEARConfig:
    # signal / framing (model_torch.py:209-230)
    fs: int = 16000
    timesteps: int = 19
    n_fft: int = 1024
    n_bands: int = 100
    fmin: float = 50.0
    fmax: float | None = None          # None -> fs/2 * 0.9 (model_torch.py:238-239)
    hop_ratio: float = 1.0

    # backbone dims (model_torch.py:11-14)
    latent_dim: int = 100
    n_sectors: int = 8
    n_dist_class: int = 5

    # features
    use_cc: bool = True

    # frontend Q control
    fixed_frontend_q: bool = False
    controller_mode: str = "dual"      # "dual" | "single"
    freeze_q: bool = False             # force Q = Q0 at runtime (controller exists)
    ctrl_hidden: int = 128
    alpha: float = 0.2                 # kept for settings parity (unused, like ref)

    # deltaQ profile (model_torch.py:36-51, 245-252)
    deltaQ_base: float = 2.0
    deltaQ_low_factor: float = 0.5
    deltaQ_high_factor: float = 1.0
    deltaQ_mode: str = "absolute"      # "absolute" | "relative"

    # Q clamp (model_torch.py:283)
    q_min: float = 0.05
    q_max: float = 30.0

    # dropout rates
    ctrl_dropout: float = 0.1
    backend_dropout: float = 0.2

    # rematerialise the frontend scan step in backward: the per-frame W
    # tensors dominate BPTT memory ((T, 2, B, N, F) floats — ~14 GB at
    # batch 512); recomputing them costs a fraction of a ms and unlocks
    # 4x larger batches per chip.
    remat_frontend: bool = True

    # W-contraction operand dtype for the adaptive filterbank hot op
    # (ops/filterbank.filterbank_apply): "float32" = HIGHEST-precision
    # float32 parity surface; "bfloat16" halves the HBM-bound W passes
    # (~2.5x on the frontend, measured) with DEFAULT-matmul-precision
    # numerics. Config key FB_W_DTYPE.
    fb_w_dtype: str = "float32"

    # Backward-pass implementation for the filterbank hot op. "custom"
    # = the fwd-shaped-gradient custom VJP (ops/filterbank._fb_bwd);
    # "autodiff" = plain jax.grad of the reference body; "auto" picks by
    # measured crossover (docs/fb_vjp_*.json, one v5e, ground-truth
    # device_get timing): the custom bwd wins the scan-amortised chunk
    # path at EVERY batch (+11-16 %) and the bare per-step path from
    # batch 512 up (+17 %), but loses the per-step path below that
    # (dispatch-latency-bound: its extra contractions are not amortised).
    # make_train_chunk therefore resolves "auto" -> "custom"; the
    # un-scanned path resolves by batch >= 512. Config key FB_VJP.
    fb_vjp: str = "auto"

    # Whether loss gradients w.r.t. the INPUT WAVEFORMS are needed. The
    # training objective never differentiates w.r.t. the audio (spectra
    # are data), so the default False lets the custom FB VJP skip its
    # dL/dX contraction (one full Gaussian rebuild + (B,F,4) dot per
    # frame). Set True for input-saliency / adversarial analyses or a
    # learned signal chain feeding the frontend — otherwise, under the
    # custom VJP, jax.grad w.r.t. wavL/wavR returns exact zeros (the
    # autodiff VJP computes correct waveform gradients either way, so
    # without this knob the answer would flip with the batch-size-based
    # VJP auto-selection). Config key FB_X_GRAD.
    fb_x_grad: bool = False

    # Frame-spectra implementation (models/frontend.spectra). "fft" = XLA
    # rFFT (the f32 parity surface); "matmul" = windowed DFT-as-matmul —
    # the (win, F) cos/sin bases with the Hann window and the implicit
    # zero-pad folded in, contracted on the MXU at DEFAULT precision.
    # Measured 3.9x faster than the VPU-side rFFT at the production shape
    # (0.93 vs 3.63 ms per both-ears batch-512 call, one v5e,
    # device_get-synced chains; docs/dft_matmul_probe.json) with spectra
    # error ~1e-3 of spectrum max — the same rounding class the bf16-W
    # policy already applies to the X operand of the filterbank dot.
    # "auto" therefore resolves to matmul exactly when fb_w_dtype is
    # bfloat16 (production) and to fft on the f32 parity surface.
    # Config key DFT_MODE.
    dft_mode: str = "auto"

    # AuralNet baseline
    d_model: int = 128
    attn_heads: int = 4
    attn_layers: int = 2
    attn_dropout: float = 0.1

    def __post_init__(self):
        # Validate here (the shared layer), not per entry point: a typo
        # like "bf16" would otherwise silently fall through every
        # `== "bfloat16"` check onto the ~3.6x slower float32 hot op.
        if self.fb_w_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"fb_w_dtype must be 'float32' or 'bfloat16', "
                f"got {self.fb_w_dtype!r}")
        if self.fb_vjp not in ("auto", "custom", "autodiff"):
            raise ValueError(
                f"fb_vjp must be 'auto', 'custom' or 'autodiff', "
                f"got {self.fb_vjp!r}")
        if self.dft_mode not in ("auto", "fft", "matmul"):
            raise ValueError(
                f"dft_mode must be 'auto', 'fft' or 'matmul', "
                f"got {self.dft_mode!r}")

    @property
    def use_dft_matmul(self) -> bool:
        """Resolve dft_mode: 'auto' ties the MXU DFT to the bf16-W
        production policy (both introduce the same bf16-rounding class);
        the f32 parity surface keeps the exact rFFT."""
        if self.dft_mode == "auto":
            return self.fb_w_dtype == "bfloat16"
        return self.dft_mode == "matmul"

    @property
    def fmax_eff(self) -> float:
        return self.fs / 2.0 * 0.9 if self.fmax is None else self.fmax

    @property
    def f_nyq(self) -> float:
        return self.fs / 2.0

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1

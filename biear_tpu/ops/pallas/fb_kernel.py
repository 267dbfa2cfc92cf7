"""Pallas TPU kernel: fused Gaussian-filterbank build + triple apply.

This is THE hot op of the adaptive-Q frontend: per (ear, frame) the scan
step materialises a per-sample (N, F) Gaussian weight matrix from the
current Q vector and contracts it against [|X|, Re X, Im X]
(ops/filterbank.py). Under XLA the exp, the row-normalisation and the
three contractions are separate HLOs with (B, N, F) intermediates round-
tripping through HBM; this kernel keeps the whole W tile in VMEM — built,
normalised, contracted and discarded per grid step, so the only HBM
traffic is the (B, F) inputs and (B, N) outputs.

Numerics are identical to ops.filterbank.filterbank_apply (the epsilons
and normalise-then-contract order included). The backward pass reuses the
jnp reference implementation's VJP (rematerialised — W is never stored),
wired through jax.custom_vjp.

Grid: one program per batch row. Padding contract: F padded with a huge
frequency (1e9 Hz) so padded bins get exp(-inf) = 0 weight; N padded rows
are computed-then-sliced-off garbage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401
        return jax.default_backend() in ("tpu", "cpu")
    except ImportError:                  # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_TILE_B = 8      # samples per grid step (TPU sublane granularity)


def _kernel(q_ref, fc_ref, f_ref, x_ref, out_ref):
    """One 8-sample tile: build W (8, Np, Fp) in VMEM, contract with the
    3 spectra channels. W lives and dies on-chip."""
    Q = q_ref[:, :]                       # (8, Np)
    fc = fc_ref[0, :]                     # (Np,)
    f = f_ref[0, :]                       # (Fp,)
    bw = (fc[None, :] / (Q + 1e-8))[..., None] + 1e-8     # (8, Np, 1)
    z = (f[None, None, :] - fc[None, :, None]) / bw       # (8, Np, Fp)
    W = jnp.exp(-0.5 * z * z)
    W = W / (jnp.sum(W, axis=-1, keepdims=True) + 1e-8)
    # Three VPU reductions, one spectra channel at a time (bounds the
    # VMEM-resident temporary to one (8, Np, Fp) tile).
    for c in range(3):
        xc = x_ref[:, c, :]               # (8, Fp)
        out_ref[:, c, :] = jnp.sum(W * xc[:, None, :], axis=-1)


def fb_apply_pallas(Q, X3, fc, f_fft):
    """Q (B, N), X3 (B, 3, F) stacked [|X|, Re, Im] -> (B, 3, N).

    Forward-only convenience; for the differentiable op use
    make_fb_apply(fc, f_fft)."""
    return _fb_forward(Q, X3, fc, f_fft)


def _fb_forward(Q, X3, fc, f_fft):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, N = Q.shape
    F = X3.shape[-1]
    Np = _round_up(N, 128)
    Fp = _round_up(F, 128)

    fc_np = np.asarray(fc, np.float32)
    f_np = np.asarray(f_fft, np.float32)
    fc_pad = np.pad(fc_np, (0, Np - N), constant_values=1.0)[None]
    # Padded frequency bins sit at 1e9 Hz -> z huge -> exp underflows to 0,
    # so they contribute neither to row sums nor to the contractions.
    f_pad = np.pad(f_np, (0, Fp - F), constant_values=1e9)[None]

    Bp = _round_up(B, _TILE_B)
    Qp = jnp.pad(Q, ((0, Bp - B), (0, Np - N)), constant_values=1.0)
    Xp = jnp.pad(X3, ((0, Bp - B), (0, 0), (0, Fp - F)))

    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        _kernel,
        grid=(Bp // _TILE_B,),
        in_specs=[
            pl.BlockSpec((_TILE_B, Np), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B, 3, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_B, 3, Np), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 3, Np), jnp.float32),
        interpret=interpret,
    )(Qp, jnp.asarray(fc_pad), jnp.asarray(f_pad), Xp)
    return out[:B, :, :N]


def _ref_impl(Q, X3, fc, f_fft):
    """jnp reference (identical math; used for the VJP)."""
    fc = jnp.asarray(np.asarray(fc, np.float32))
    f = jnp.asarray(np.asarray(f_fft, np.float32))
    bw = (fc / (Q + 1e-8))[..., None] + 1e-8
    z = (f[None, :] - fc[:, None]) / bw
    W = jnp.exp(-0.5 * z * z)
    W = W / (jnp.sum(W, axis=-1, keepdims=True) + 1e-8)
    return jnp.einsum("bnf,bcf->bcn", W, X3,
                      precision=jax.lax.Precision.HIGHEST)


def make_fb_apply(fc, f_fft):
    """Returns fused (Q, X3) -> (B, 3, N) with pallas forward and
    rematerialised jnp backward."""
    fc = np.asarray(fc, np.float32)
    f_fft = np.asarray(f_fft, np.float32)

    @jax.custom_vjp
    def apply(Q, X3):
        return _fb_forward(Q, X3, fc, f_fft)

    def fwd(Q, X3):
        return apply(Q, X3), (Q, X3)

    def bwd(res, g):
        Q, X3 = res
        _, vjp = jax.vjp(lambda q, x: _ref_impl(q, x, fc, f_fft), Q, X3)
        return vjp(g)

    apply.defvjp(fwd, bwd)
    return apply

"""Pallas TPU kernels, v2: chunked Gaussian-filterbank apply with a fused
Pallas BACKWARD.

Why v2 exists (measurement-driven, see RESULTS.md "kernel ladder"):
the v1 kernel (fb_kernel.py) fused only the forward and materialised the
whole per-tile W (TILE_B, N, F) in VMEM, capping the tile at 8 samples and
leaving the backward to XLA. Under BPTT the backward is where the HBM
traffic is: XLA's VJP of the W build re-materialises (B, N, F)
intermediates (210 MB per scan step at B=1024) whose round-trips are pure
HBM-bandwidth cost. v2:

  * streams W in (TILE_B, N, 128) frequency chunks, so the tile grows to
    32-128 samples while peak VMEM stays ~constant — W is never stored,
    only the running row-sum S and the three partial contractions U_c;
  * normalises AFTER contraction: Y_c = U_c / (S + eps) (algebraically
    identical to the reference's normalise-then-contract,
    model_torch.py:343-345 — division by the row sum commutes with the
    row-wise contraction);
  * implements dQ / dX3 as a second Pallas kernel with the same chunked
    streaming (two exp rebuilds: one to recover S and U_c, one for the
    grad sweep), so neither the forward nor the backward ever writes an
    (B, N, F) array to HBM.

Gradient math (W = G / (S + eps), G = exp(-z^2/2), z = (f - fc)/bw,
bw = fc/(Q + e1) + e2, Y_c = sum_f W X_c):
    a_c  = g_c / (S + eps)
    dS   = -sum_c a_c * Y_c
    dG   = sum_c a_c X_c(f) + dS
    dz   = -dG * G * z
    dbw  = -(1/bw) * sum_f dz * z
    dQ   = dbw * (-fc/(Q+e1)^2)  =  (sum_f dz*z) * (1/bw) * fc/(Q+e1)^2
    dX_c = sum_n a_c * G
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_CHUNK_F = 128    # frequency lanes per streamed W chunk


def _prep_grids(fc, f_fft):
    """Pad fc/f to lane multiples. Padded bands sit at fc=1 Hz with Q=1 so
    their Gaussians collapse onto padded frequency bins at 1e9 Hz ->
    exp underflow -> exact zeros everywhere they could leak."""
    fc_np = np.asarray(fc, np.float32)
    f_np = np.asarray(f_fft, np.float32)
    N, F = fc_np.shape[0], f_np.shape[0]
    Np, Fp = _round_up(N, 128), _round_up(F, _CHUNK_F)
    fc_pad = np.pad(fc_np, (0, Np - N), constant_values=1.0)[None]
    f_pad = np.pad(f_np, (0, Fp - F), constant_values=1e9)[None]
    return fc_pad, f_pad, N, F, Np, Fp


def stream_fb_accumulate(Q, fc, f_ref, x_ref):
    """THE shared chunk loop of the whole kernel ladder: stream the
    Gaussian build in (TB, Np, CHUNK_F) pieces over a batch tile,
    accumulating the row sum S and the three spectra contractions U_c.
    One definition keeps the forward kernel, the backward's recompute
    pass, and both fused scan-step kernels numerically identical.

    Q (TB, Np) values; fc (Np,) values; f_ref (1, Fp) and x_ref
    (TB, 3, Fp) kernel refs. Returns (S, [U0, U1, U2], inv_bw)."""
    inv_bw = 1.0 / ((fc[None, :] / (Q + 1e-8)) + 1e-8)
    TB, Np = Q.shape
    Fp = f_ref.shape[-1]
    S = jnp.zeros((TB, Np), jnp.float32)
    U = [jnp.zeros((TB, Np), jnp.float32) for _ in range(3)]
    for j in range(Fp // _CHUNK_F):
        f = f_ref[0, j * _CHUNK_F:(j + 1) * _CHUNK_F]          # (CF,)
        z = (f[None, None, :] - fc[None, :, None]) * inv_bw[:, :, None]
        G = jnp.exp(-0.5 * z * z)                              # (TB, Np, CF)
        S = S + jnp.sum(G, axis=-1)
        for c in range(3):
            xc = x_ref[:, c, j * _CHUNK_F:(j + 1) * _CHUNK_F]  # (TB, CF)
            U[c] = U[c] + jnp.sum(G * xc[:, None, :], axis=-1)
    return S, U, inv_bw


def _fwd_kernel(q_ref, fc_ref, f_ref, x_ref, out_ref):
    """One batch tile: stream W, emit U_c / (S + eps)."""
    S, U, _ = stream_fb_accumulate(q_ref[:, :], fc_ref[0, :], f_ref, x_ref)
    denom = S + 1e-8
    for c in range(3):
        out_ref[:, c, :] = U[c] / denom


def _bwd_kernel(q_ref, fc_ref, f_ref, x_ref, g_ref, dq_ref, dx_ref):
    """Chunked backward: pass 1 recovers S and U_c, pass 2 rebuilds each W
    chunk once more for the dG sweep that yields dQ and dX3."""
    Q = q_ref[:, :]
    fc = fc_ref[0, :]
    S, U, inv_bw = stream_fb_accumulate(Q, fc, f_ref, x_ref)
    TB, Np = Q.shape
    Fp = f_ref.shape[-1]
    NC = Fp // _CHUNK_F
    denom = S + 1e-8
    a = [g_ref[:, c, :] / denom for c in range(3)]             # (TB, Np)
    dS = -(a[0] * U[0] + a[1] * U[1] + a[2] * U[2]) / denom

    T = jnp.zeros((TB, Np), jnp.float32)                        # sum_f dz*z
    for j in range(NC):
        f = f_ref[0, j * _CHUNK_F:(j + 1) * _CHUNK_F]
        z = (f[None, None, :] - fc[None, :, None]) * inv_bw[:, :, None]
        G = jnp.exp(-0.5 * z * z)
        dG = dS[:, :, None]
        for c in range(3):
            xc = x_ref[:, c, j * _CHUNK_F:(j + 1) * _CHUNK_F]
            dG = dG + a[c][:, :, None] * xc[:, None, :]
        dzz = -dG * G * z * z                                   # dz * z
        T = T + jnp.sum(dzz, axis=-1)
        for c in range(3):
            dx_ref[:, c, j * _CHUNK_F:(j + 1) * _CHUNK_F] = jnp.sum(
                a[c][:, :, None] * G, axis=1)
    dq_ref[:, :] = T * inv_bw * fc[None, :] / ((Q + 1e-8) * (Q + 1e-8))


def _call_fwd(Q, X3, fc_pad, f_pad, tile_b: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Np = Q.shape
    Fp = X3.shape[-1]
    grid = (B // tile_b,)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, Np), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 3, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_b, 3, Np), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, Np), jnp.float32),
        interpret=interpret,
    )(Q, jnp.asarray(fc_pad), jnp.asarray(f_pad), X3)


def _call_bwd(Q, X3, g, fc_pad, f_pad, tile_b: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, Np = Q.shape
    Fp = X3.shape[-1]
    grid = (B // tile_b,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, Np), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Np), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 3, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 3, Np), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, Np), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 3, Fp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, 3, Fp), jnp.float32),
        ],
        interpret=interpret,
    )(Q, jnp.asarray(fc_pad), jnp.asarray(f_pad), X3, g)


def make_fb_apply2(fc, f_fft, tile_b: int = 32):
    """Differentiable fused apply: (Q (B,N), X3 (B,3,F)) -> (B,3,N), with
    Pallas forward AND Pallas backward (dQ, dX3). Numerically matches
    ops.filterbank.filterbank_apply (pre-nan_to_num)."""
    fc_pad, f_pad, N, F, Np, Fp = _prep_grids(fc, f_fft)

    def _pad_in(Q, X3):
        B = Q.shape[0]
        Bp = _round_up(B, tile_b)
        Qp = jnp.pad(Q, ((0, Bp - B), (0, Np - N)), constant_values=1.0)
        Xp = jnp.pad(X3, ((0, Bp - B), (0, 0), (0, Fp - F)))
        return Qp, Xp, B

    @jax.custom_vjp
    def apply(Q, X3):
        interpret = jax.default_backend() != "tpu"
        Qp, Xp, B = _pad_in(Q, X3)
        out = _call_fwd(Qp, Xp, fc_pad, f_pad, tile_b, interpret)
        return out[:B, :, :N]

    def fwd(Q, X3):
        return apply(Q, X3), (Q, X3)

    def bwd(res, g):
        Q, X3 = res
        interpret = jax.default_backend() != "tpu"
        Qp, Xp, B = _pad_in(Q, X3)
        gp = jnp.pad(g, ((0, Qp.shape[0] - B), (0, 0), (0, Np - N)))
        dq, dx = _call_bwd(Qp, Xp, gp, fc_pad, f_pad, tile_b, interpret)
        return dq[:B, :N], dx[:B, :, :F]

    apply.defvjp(fwd, bwd)
    return apply

"""Sample-granular window extraction from a segment pool — Pallas kernel.

THE hot data-movement op of on-device synthesis: every training sample
needs MS conv-input windows ``pool[row, off : off + 16384]`` with
sample-granular offsets (off = 128-block segment offset + the reference's
random conv crop, generate_anechoic_data.py:91-108,154-186). XLA lowers
the vmapped dynamic_slice to a gather running at ~23 GB/s on v5e — 17 ms
per batch-1024 step, the single largest term in the fused
synthesize->train pipeline (tools/bench_synth_parts*.py, round 3).

The kernel does what the op actually is — a DMA per row plus a lane
rotation: the grid pipelines one padded pool row (VMEM block, row index
from scalar prefetch) per window; the body slices the 128-aligned part
(dynamic sublane offset) and applies the sub-block offset as a dynamic
lane roll across the block boundary. HBM traffic is the theoretical
minimum (one row read + one window write).

Mosaic bug dodged (measured on this image's libtpu): deriving a DMA
*descriptor* offset from a scalar-memory read crashes the remote
compiler (tpu_compile_helper exit 1), so the row index rides the
BlockSpec index_map (the supported scalar-prefetch path) and only
VMEM-internal offsets come from in-body scalar reads.

Layout contract: pool rows are pre-padded to ``[0]*(L-1) ++ row ++ 0s``
and viewed as (NP, n_blocks, 128); windows come back as (X, 128, 128)
block form — exactly what the block-Toeplitz HRIR convolution consumes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_BLOCKS = 128          # output window: 128 lane-blocks = 16384 samples

# gather_mix_kb holds the whole HRIR kernel bank VMEM-resident. Budget:
# Mosaic's default scoped VMEM is 16 MiB (measured on this image — the
# round-2 kernel ladder OOM'd at 18.5 MiB), and the kernel also needs
# two pipelined pool-row blocks (~2 x 128 KiB) plus the framed window
# and output. 8 MiB of bank leaves comfortable headroom; the production
# test bank is 6.3 MiB bf16. Larger banks fall back to the XLA path.
_MIX_KB_VMEM_BYTES = 8 * 2**20


def pad_pool_for_windows(pool: np.ndarray, left_pad: int,
                         max_off: int) -> np.ndarray:
    """Host-side: pad (NP, T) rows to ``[0]*left_pad ++ row ++ 0s`` and
    reshape to the (NP, n_blocks, 128) block view the kernel reads.
    n_blocks covers max_off + the window + one roll-lookahead block."""
    NP, T = pool.shape
    need = left_pad + T
    min_width = left_pad + max_off + WIN_BLOCKS * 128
    n_blocks = -(-max(need, min_width) // 128) + 1   # +1: roll lookahead
    out = np.zeros((NP, n_blocks * 128), pool.dtype)
    out[:, left_pad:left_pad + T] = pool
    return out.reshape(NP, n_blocks, 128)


def _build_window(qb_ref, cl_ref, pool_ref, i):
    """Rolled-window build shared by both kernels: slice the 128-aligned
    part at a dynamic sublane offset, apply the sub-block offset as a
    dynamic lane roll across the block boundary. Lives in ONE place
    because the dataflow deliberately dodges the Mosaic DMA-descriptor
    bug documented in the module header — a fix applied to one copy and
    not another would silently desync the kernels."""
    c = cl_ref[i]
    a = pool_ref[0, pl.ds(qb_ref[i], WIN_BLOCKS), :]
    b = pool_ref[0, pl.ds(qb_ref[i] + 1, WIN_BLOCKS), :]
    ra = pltpu.roll(a, -c, 1)
    rb = pltpu.roll(b, -c, 1)
    lane = lax.broadcasted_iota(jnp.int32, (WIN_BLOCKS, 128), 1)
    return jnp.where(lane < 128 - c, ra, rb)


def _window_kernel(rows_ref, qb_ref, cl_ref, pool_ref, out_ref):
    out_ref[0] = _build_window(qb_ref, cl_ref, pool_ref, pl.program_id(0))


@functools.partial(jax.jit, static_argnums=(3,))
def _gather_windows_pallas(pool3, rows, offs, interpret: bool):
    X = rows.shape[0]
    nb = pool3.shape[1]
    qb = (offs // 128).astype(jnp.int32)
    cl = (offs % 128).astype(jnp.int32)
    return pl.pallas_call(
        _window_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(X,),
            in_specs=[pl.BlockSpec((1, nb, 128),
                                   lambda i, r, q, c: (r[i], 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, WIN_BLOCKS, 128),
                                   lambda i, r, q, c: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((X, WIN_BLOCKS, 128), pool3.dtype),
        interpret=interpret,
    )(rows.astype(jnp.int32), qb, cl, pool3)


def _gather_windows_xla(pool3, rows, offs):
    """Fallback: vmapped dynamic_slice on the flattened rows (CPU tests,
    or any platform where the kernel is unavailable)."""
    NP, nb, _ = pool3.shape
    flat = pool3.reshape(NP, nb * 128)
    return jax.vmap(
        lambda r, o: lax.dynamic_slice(flat[r], (o,), (WIN_BLOCKS * 128,))
    )(rows, offs).reshape(-1, WIN_BLOCKS, 128)


def _mix_kernel(rows_ref, qb_ref, cl_ref, meas_ref, pool_ref, kb_ref,
                out_ref, *, nf: int, ncol: int):
    """Fused window-gather + block-Toeplitz HRIR matmul, one window per
    grid step: build the rolled window in VMEM (same dataflow as
    _window_kernel), frame it into the (nf, ncol) halo matrix, and
    contract against this window's HRIR kernel block kb[meas[x]] — the
    WHOLE kernel bank rides a constant index_map, so it is DMA'd into
    VMEM once and stays resident across the grid (32 x 384 x 256 bf16 =
    6.3 MB; rows 128-padded per gather_mix_kb's contract). HBM traffic
    per window drops to one pool row read + one (nf, 256) f32 write: the
    (X, 384, 256) gathered-KB intermediate and the (X, nf, 384)
    framed-window materialisation of the XLA path never exist."""
    i = pl.program_id(0)
    w = _build_window(qb_ref, cl_ref, pool_ref, i)
    # halo framing via SUBLANE rolls in f32 (offset-0 layouts — Mosaic
    # cannot lane-concat sublane-offset slices like w[k:k+nf], and its
    # rotate only handles 32-bit data, so the operand cast comes last);
    # the roll's wrapped rows land at index >= 128-k > nf, sliced away
    fw = jnp.concatenate(
        [pltpu.roll(w, (WIN_BLOCKS - k) % WIN_BLOCKS, 0)[:nf]
         for k in range(ncol // 128)], axis=-1)
    # contraction written ears-major: out block is (2*128, nf), so the
    # materialised kernel output is PHYSICALLY the {1,2,0} layout the
    # consuming model fusions want — the wrapper's swapaxes back to the
    # logical (X, nf, 2*128) then folds to a bitcast instead of XLA
    # round-tripping ~200 MB/step through HBM to re-lay it out
    # (docs/fused_breakdown.json round-5 copy bucket)
    out_ref[0] = jnp.dot(fw.astype(kb_ref.dtype), kb_ref[meas_ref[i]],
                         preferred_element_type=jnp.float32).T


@functools.partial(jax.jit, static_argnums=(5, 6))
def _gather_mix_pallas(pool3, rows, offs, meas, kb, nf: int,
                       interpret: bool):
    X = rows.shape[0]
    nb = pool3.shape[1]
    M, ncol, two_ears = kb.shape
    qb = (offs // 128).astype(jnp.int32)
    cl = (offs % 128).astype(jnp.int32)
    return pl.pallas_call(
        functools.partial(_mix_kernel, nf=nf, ncol=ncol),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(X,),
            in_specs=[pl.BlockSpec((1, nb, 128),
                                   lambda i, r, q, c, m: (r[i], 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((M, ncol, two_ears),
                                   lambda i, r, q, c, m: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, two_ears, nf),
                                   lambda i, r, q, c, m: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((X, two_ears, nf), jnp.float32),
        interpret=interpret,
    )(rows.astype(jnp.int32), qb, cl, meas.astype(jnp.int32),
      pool3, kb).swapaxes(1, 2)


def _gather_mix_xla(pool3, rows, offs, meas, kb, nf: int, precision=None,
                    gather=None):
    """Fallback composition — the exact op sequence _mix_fast ran before
    the fused kernel existed (gather -> operand cast -> halo concat ->
    KB row gather -> batched contraction). The framing contract (KB rows
    128-padded, halo = ncol/128 blocks) lives HERE and in _mix_kernel
    only — synth.py's f32 oracle path calls this with precision=HIGH
    and gather=gather_windows rather than keeping its own copy.
    gather: window-gather impl (defaults to the XLA dynamic_slice)."""
    ncol = kb.shape[1]
    win = (gather or _gather_windows_xla)(pool3, rows, offs).astype(kb.dtype)
    fw = jnp.concatenate([win[:, k:k + nf] for k in range(ncol // 128)],
                         axis=-1)
    return jnp.einsum("xfj,xjc->xfc", fw, kb[meas], precision=precision,
                      preferred_element_type=jnp.float32)


def gather_mix_kb(pool3, rows, offs, meas, kb, nf: int, *,
                  use_kernel: bool | None = None):
    """Fused sample-granular window extraction + block-Toeplitz HRIR
    contraction: (X,) rows/offsets/measurement ids -> (X, nf, 2*128) f32
    with out[x] = frame(window_x) @ kb[meas[x]] (f32 accumulation).
    kb rows must be zero-padded to a multiple of 128 (the bank builder's
    contract, data/synth.py) so the halo framing needs no unaligned
    slicing.

    THE hot op of on-device anechoic synthesis under the bf16 mix policy
    (data/synth.py::_mix_fast): only M distinct HRIR kernel blocks exist
    (one per measurement position), so gathering kb per (sample, source)
    — X/M times redundantly, 1.2 GB at batch 2048 — is pure wasted HBM
    traffic. The kernel holds the whole bank VMEM-resident instead —
    which is also its limit: past _MIX_KB_VMEM_BYTES (the bank + the
    pipelined pool rows + the framed window must fit Mosaic's scoped
    VMEM) a large bank (e.g. a real SOFA set at fine angular resolution)
    auto-falls back to the XLA composition rather than failing to
    compile. use_kernel: None = kernel on TPU (bank permitting), XLA
    fallback elsewhere; True forces the kernel (tests)."""
    ncol = kb.shape[1]
    if ncol % 128:
        raise ValueError(f"kb rows must be 128-padded, got {kb.shape}")
    if nf + ncol // 128 - 1 > WIN_BLOCKS:
        # frame nf-1 reads blocks [nf-1, nf-1 + ncol/128), which must
        # stay inside the gathered window: the Pallas sublane roll would
        # silently WRAP rows where the XLA concat raises.
        raise ValueError(
            f"window coverage exceeded: nf={nf} with ncol={ncol} needs "
            f"{nf + ncol // 128 - 1} blocks > WIN_BLOCKS={WIN_BLOCKS}")
    if use_kernel is None:
        use_kernel = (jax.default_backend() in ("tpu", "axon")
                      and kb.nbytes <= _MIX_KB_VMEM_BYTES)
    if use_kernel:
        return _gather_mix_pallas(pool3, rows, offs, meas, kb, nf, False)
    return _gather_mix_xla(pool3, rows, offs, meas, kb, nf)


def gather_windows(pool3, rows, offs, *, use_kernel: bool | None = None):
    """(X,) rows + (X,) sample offsets -> (X, 128, 128) window blocks:
    out[x].reshape(16384)[t] == pool3[rows[x]].reshape(-1)[offs[x] + t].

    use_kernel: None = kernel on TPU, XLA fallback elsewhere."""
    if use_kernel is None:
        # the pltpu kernel lowers only on TPU ("axon" is the tunnelled
        # TPU platform name on this image); every other backend (cpu,
        # gpu, ...) takes the XLA fallback
        use_kernel = jax.default_backend() in ("tpu", "axon")
    if use_kernel:
        return _gather_windows_pallas(pool3, rows, offs, False)
    return _gather_windows_xla(pool3, rows, offs)


# ---------------- fused binaural cross-correlation kernel ----------------

def _cc_kernel(lp_ref, rf_ref, out_ref, *, nb: int, group: int):
    """Per-batch-row CC over the kept +/-max_kept lag window, all in VMEM.

    The XLA MXU composition (ops/xcorr.py::_cc_kept_lags_mxu) is
    formatting-bound, not FLOP-bound: at batch 512 the halo-concat
    framing alone is 1.8 ms and the strided-diagonal pad/reshape another
    1.1 ms, against 0.1 ms of matmul (stage probe, round 3). Here the
    (nb, 256) halo frame is built by a sublane roll, contracted on the
    MXU at Precision.HIGHEST (BIT-EXACT vs the XLA path — one parity
    surface for both dispatches), and the lag diagonals are extracted by
    a log-step per-row lane roll. `group` rows per grid step amortise
    the per-step latency that dominated the G=1 version (measured 2.6 ->
    1.8 ms at batch 512, G=8).

    Layouts are fully 8-sublane-aligned BY CONSTRUCTION (nb = padded
    block count, trailing blocks zero): Mosaic rejects rolls/slices on
    odd sublane counts like (126, 128) — measured on this image
    (tpu_compile_helper exit 1), which is why the caller pads rather
    than passing the tight nf+1 blocks.

    out[g, 0, s] = sum_i C[i, i+s],  C = Rf_g^T @ Lw_g  (s < 128; caller
    keeps the first n_s lags; zero-padded trailing blocks contribute
    zero). Diagonal trick: rolling row i left by i makes out[s] a plain
    sublane sum; the per-row-variable roll is 7 constant rolls selected
    by the bits of i, and no wrapped lane lands in s < 128 because
    s + i <= 127 + 127 = 254 < 256."""
    row = lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    for g in range(group):
        Lb = lp_ref[g]                                # (nb, 128)
        # left-shift by one block == roll down by nb-1 (roll shift must
        # be non-negative)
        Lw = jnp.concatenate(
            [Lb, pltpu.roll(Lb, nb - 1, 0)], axis=-1)  # (nb, 256)
        C = lax.dot_general(rf_ref[g], Lw, (((0,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
        for k in (1, 2, 4, 8, 16, 32, 64):
            C = jnp.where((row & k) != 0, pltpu.roll(C, 256 - k, 1), C)
        out_ref[g] = jnp.sum(C[:, :128], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _cc_pallas(lp3, rf3, nb: int, group: int, interpret: bool):
    B = lp3.shape[0]
    return pl.pallas_call(
        functools.partial(_cc_kernel, nb=nb, group=group),
        grid=(B // group,),
        in_specs=[pl.BlockSpec((group, nb, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((group, nb, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, 1, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
        interpret=interpret,
    )(lp3, rf3)


def cc_kept_lags(lf, rf, max_kept: int, *, use_kernel: bool | None = None,
                 interpret: bool = False):
    """corr[l] for l in [-max_kept, max_kept]: (B, n) x2 -> (B, 2*max_kept+1)
    with corr[b, s - max_kept] = sum_m rf[b, m] lf[b, m + s - max_kept].

    Fused Pallas path on TPU (requires n % 128 == 0, max_kept <= 63 so
    the shifted row fits the two-block halo); the caller
    (ops/xcorr.py) keeps its XLA composition as the fallback/oracle —
    the kernel is BIT-EXACT against it (HIGHEST-precision dot).
    use_kernel=None auto-dispatches; False forces the caller's fallback
    (returns None here so the caller can tell)."""
    B, n = lf.shape
    nf = n // 128
    ok = (n % 128 == 0 and 0 < max_kept <= 63)
    if use_kernel is None:
        use_kernel = ok and jax.default_backend() in ("tpu", "axon")
    if not use_kernel:
        return None
    if not ok:
        raise ValueError(f"cc kernel needs n%128==0 and max_kept<=63, "
                         f"got n={n}, max_kept={max_kept}")
    # nb: signal needs nf+1 blocks after the max_kept left-pad; align to
    # the 8-sublane f32 tile (see _cc_kernel docstring)
    nb = 8 * (-(-(nf + 2) // 8))
    group = next(g for g in (8, 4, 2, 1) if B % g == 0)
    lp = jnp.pad(lf, ((0, 0), (max_kept, nb * 128 - n - max_kept)))
    rp = jnp.pad(rf, ((0, 0), (0, nb * 128 - n)))
    return _cc_pallas(lp.reshape(B, nb, 128),
                      rp.reshape(B, nb, 128), nb, group,
                      interpret)[:, 0, :2 * max_kept + 1]

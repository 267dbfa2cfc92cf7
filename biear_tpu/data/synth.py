"""On-device binaural data synthesis.

North-star feature (BASELINE.json): the reference synthesises training
data OFFLINE with a serial scipy loop — 72k samples of per-source
fftconvolve + mixing on one CPU (generate_anechoic_data.py:154-233,
SURVEY.md §3.3). Here the whole sampler is a jitted, vmapped program:
HRIR convolution runs as batched rFFT products on the accelerator, so
"active" training can consume freshly synthesised raw waveforms every
step with no H5 precompute stage.

Scene parity (anechoic, generate_anechoic_data.py):
  * n_src ~ Uniform{1,2,3} (or forced, for the 1/3-1/3-1/3 test splits);
  * each source occupies a distinct 45-degree sector; the measurement is
    drawn uniformly within the sector's HRIR set;
  * a random 1 s speech segment is convolved with the measurement's HRIR
    pair, a random 1 s window of the convolution is cropped, sources sum;
  * joint peak-normalisation to +-1; labels = per-sector
    [presence, in-sector normalised AoA, distance class].
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.xcorr import cross_correlation_feature
from .labels import DIST_CLASSES, N_SECTORS, N_DIST_CLASSES


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def select_segments(pool, seg_idx, qoff, fs: int):
    """MXU-friendly segment selection: pick pool rows with a one-hot
    matmul, then apply a 128-sample-quantised time offset with a
    block-shift einsum. The obvious vmapped dynamic_slice lowers to a TPU
    gather running at ~5 GB/s — 8x slower than riding the MXU
    (tools/bench_breakdown.py measurements). Offsets are quantised to
    128 samples (8 ms at 16 kHz); the sample-granular IR crop that
    follows keeps sub-block randomisation.

    pool (NP, T) with T and fs multiples of 128; seg_idx (MS,) row picks;
    qoff (MS,) block offsets with qoff*128 + fs <= T. Returns (MS, fs).

    Both contractions pin Precision.HIGHEST: they move training DATA, and
    the default MXU mode would quantize the selected waveforms to bf16
    (~7 mantissa bits). With exactly-0/1 selection matrices the bf16_x
    multi-pass decomposition reproduces the float32 values exactly, so
    this path stays bit-equivalent to a dynamic_slice."""
    NP, T = pool.shape
    MS = seg_idx.shape[0]
    M = jax.nn.one_hot(seg_idx, NP, dtype=pool.dtype)        # (MS, NP)
    rows = jnp.matmul(M, pool, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32
                      ).reshape(MS, T // 128, 128)
    nbo = fs // 128
    S = (jnp.arange(T // 128)[None, None, :]
         == jnp.arange(nbo)[None, :, None] + qoff[:, None, None]
         ).astype(pool.dtype)                                # (MS, nbo, nbi)
    return jnp.einsum("sob,sbk->sok", S, rows,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32).reshape(MS, fs)


def add_diffuse_noise(key, y, snr_range):
    """Mix spatially-diffuse (ear-uncorrelated) Gaussian noise into a
    binaural batch at a per-sample SNR ~ U[lo, hi] dB, then re-normalise
    the joint peak (absolute level must not become a detection cue).

    y (B, 2, fs); snr_range (lo_db, hi_db). The reference's corpus has no
    noise floor (generate_anechoic_data.py mixes clean TIMIT); this is the
    optional task-hardening lever for the non-saturating protocol."""
    lo, hi = snr_range
    B = y.shape[0]
    k_snr, k_n = jax.random.split(key)
    snr_db = jax.random.uniform(k_snr, (B, 1, 1), minval=lo, maxval=hi)
    sig_rms = jnp.sqrt(jnp.mean(y * y, axis=(1, 2), keepdims=True) + 1e-12)
    noise = jax.random.normal(k_n, y.shape, y.dtype)
    y = y + noise * sig_rms * 10.0 ** (-snr_db / 20.0)
    peak = jnp.maximum(jnp.max(jnp.abs(y), axis=(1, 2), keepdims=True), 1e-8)
    return y / peak


def assemble_batch(one_fn, bank, key, batch_size: int, n_src_fixed: int,
                   fs: int, num_lags: int, out_sharding=None,
                   noise_snr_db=None):
    """THE batch-assembly pipeline shared by every synthesizer and both
    dispatch shapes (the per-batch jit and the fused train chunk): vmap the
    per-sample scene over split keys, derive the CC feature, optionally
    commit the mesh layout. One definition keeps sample_batch and
    batch_fn bit-identical for the same key."""
    keys = jax.random.split(key, batch_size)
    wavL, wavR, y, _ = jax.vmap(lambda k: one_fn(bank, k, n_src_fixed))(keys)
    if noise_snr_db is not None:
        # fold_in(2**20) is disjoint from the split() stream above, so the
        # clean-path batches are bit-identical with noise off
        yn = add_diffuse_noise(jax.random.fold_in(key, 2**20),
                               jnp.stack([wavL, wavR], axis=1),
                               noise_snr_db)
        wavL, wavR = yn[:, 0], yn[:, 1]
    devs = getattr(out_sharding, "device_set", None)
    x3 = cross_correlation_feature(
        wavL, wavR, fs, num_lags=num_lags,
        use_kernel=False if devs is not None and len(devs) > 1 else None)
    out = (wavL, wavR, x3, y)
    if out_sharding is not None:
        out = jax.lax.with_sharding_constraint(out,
                                               (out_sharding,) * len(out))
    return out


class AnechoicSynthesizer:
    """Batched on-device sampler over an HRIR bank + speech segment pool.

    ir:        (M, 2, L) float32 HRIR bank (already at `fs`)
    az_deg:    (M,) source azimuths in [0, 360)
    dist_m:    (M,) source distances (metres)
    segments:  (P, seg_len >= fs) float32 pool of clean speech
    """

    def __init__(self, ir, az_deg, dist_m, segments, fs: int = 16000,
                 max_sources: int = 3, n_sectors: int = N_SECTORS,
                 num_lags: int = 100, noise_snr_db=None,
                 mix_dtype: str = "float32"):
        self.noise_snr_db = (None if noise_snr_db is None
                             else (float(noise_snr_db[0]),
                                   float(noise_snr_db[1])))
        # SYNTH_MIX_DTYPE policy: operand dtype of the fast-path HRIR mix
        # contraction (window x block-Toeplitz kernel bank). "bfloat16"
        # halves the dominant per-batch traffic (the KB gather) — measured
        # -16%/-19% on the full synthesis chain at batch 512/1024
        # (docs/bench_r3 mix-variant probe) — at bf16 operand rounding on
        # the mixed waveform (accumulation stays f32). Default float32 =
        # the Precision.HIGH parity surface the synthesis oracles certify.
        self.mix_dtype = str(mix_dtype).lower()
        if self.mix_dtype not in ("float32", "bfloat16"):
            raise ValueError(f"mix_dtype must be 'float32' or 'bfloat16', "
                             f"got {mix_dtype!r}")
        ir = np.asarray(ir, np.float32)
        az = np.asarray(az_deg, np.float64) % 360.0
        dist = np.asarray(dist_m, np.float64)
        self.fs = int(fs)
        self.max_sources = int(max_sources)
        self.n_sectors = int(n_sectors)
        self.num_lags = int(num_lags)
        self._out_sharding = None
        M, _, L = ir.shape
        self.ir_len = L

        # Per-sector measurement tables (host-precomputed, padded square).
        width = 360.0 / n_sectors
        sec_of = np.floor(az / width).astype(np.int64) % n_sectors
        groups = [np.nonzero(sec_of == s)[0] for s in range(n_sectors)]
        for s, g in enumerate(groups):
            if len(g) == 0:
                raise ValueError(f"no HRIR measurements in sector {s}")
        kmax = max(len(g) for g in groups)
        # Small lookup tables stay numpy: they embed into traces as plain
        # constants with no device round-trip.
        self._sector_table = np.stack(
            [np.pad(g, (0, kmax - len(g)), mode="edge")
             for g in groups]).astype(np.int32)                  # (S, kmax)
        self._sector_counts = np.asarray(
            [len(g) for g in groups], np.int32)

        # Per-measurement labels (generate_anechoic_data.py:111-128).
        in_sector = az - sec_of * width
        norm = np.minimum((in_sector + 1e-3) / width, 1.0)
        dcls = np.argmin(np.abs(DIST_CLASSES[None, :] - dist[:, None]), axis=1)
        # Host-side metadata tables for sample_batch_meta (offline writer).
        self._az_np = az                                       # (M,)
        self._dist_np = dist                                   # (M,)
        self._dcls_np = dcls.astype(np.int64)                  # (M,)
        self._sec_np = sec_of.astype(np.int64)                 # (M,)

        # HRIR spectra precomputed once: (M, 2, F) complex.
        self._fft_len = _next_pow2(self.fs + L - 1)
        segments = np.asarray(segments, np.float32)
        self._seg_len = segments.shape[1]
        if self._seg_len < self.fs:
            raise ValueError("segments must be at least 1 s long")

        # The big banks travel as ARGUMENTS into the jitted sampler, not as
        # captured constants: baking a captured device array into a trace
        # requires a device->host read, which this image's TPU tunnel does
        # not support for bulk arrays (and it would duplicate the bank into
        # every executable anyway). The HRIR spectra ship as TWO float32
        # planes — the tunnel's transfer path only implements f32, so no
        # complex64 (or int) array may ever cross host<->device; complex is
        # formed on device inside the jit.
        #
        # Short IRs convolve in the TIME domain on the MXU instead: XLA
        # FFTs run on the VPU at ~0.1 TFLOP/s-class throughput and the
        # three 16k-point transforms per source dominate the whole fused
        # synthesize->train pipeline (52 of 63 ms/step at batch 1024,
        # tools/bench_breakdown.py). A 256-tap HRIR is 16000x256 MACs =
        # 8 MFLOP/ear — microseconds on the MXU. Direct conv wins while
        # L·fs MACs < the ~12 FFT passes; crossover is near L~2k, so room
        # BRIRs (ReverbSynthesizer) stay on the FFT path.
        self._direct_conv = L <= 1024
        # MXU segment selection (select_segments) needs fs and the pool
        # row length in whole 128-lane blocks; pad the pool rows up (the
        # offset range keeps selections inside the original content).
        self._mxu_select = (self.fs % 128 == 0)
        if self._mxu_select and segments.shape[1] % 128:
            segments = np.pad(
                segments,
                ((0, 0), (0, 128 - segments.shape[1] % 128)))
        self._bank = {
            "segments": jax.device_put(segments),
            "meas_norm": jax.device_put(norm.astype(np.float32)),
            "meas_dcls": jax.device_put(dcls.astype(np.float32)),
        }
        if self._direct_conv:
            # XLA conv is correlation (no kernel flip): pre-flip so the
            # lowering computes true convolution, matching the FFT path
            # sample-for-sample over the first fs+L-1 outputs.
            self._bank["ir_rev"] = jax.device_put(
                np.ascontiguousarray(ir[:, :, ::-1]))
        else:
            H = np.fft.rfft(ir, n=self._fft_len)
            self._bank["H_re"] = jax.device_put(H.real.astype(np.float32))
            self._bank["H_im"] = jax.device_put(H.imag.astype(np.float32))

        # ---- fully-batched fast path (round 3; tools/bench_synth_parts*)
        # One padded-row Pallas window gather + ONE block-Toeplitz batched
        # matmul replace the per-sample select/conv/crop chain: measured
        # 41.7 ms -> ~6 ms per batch-1024 synthesis on one v5e. Zero-guard
        # row expansion (segment x block-offset) keeps the reference's
        # zero-padded conv-edge semantics exactly (see _mix_fast's
        # docstring for the last-ulp precision caveat).
        from ..ops.window_gather import (WIN_BLOCKS, pad_pool_for_windows)
        # qoff range from the ORIGINAL segment length (selections must stay
        # inside real content — same bound as the per-sample path)
        self._n_q = ((self._seg_len - self.fs) // 128 + 1
                     if self._mxu_select else 0)
        kb_bytes = M * (128 + L - 1) * 256 * 4
        self._fast = bool(
            self._mxu_select and self._direct_conv and L <= 257
            and 1 <= self._n_q <= 8
            and self.fs + L - 1 <= WIN_BLOCKS * 128
            and kb_bytes <= 768 * 2**20)
        if self._fast:
            NPn = segments.shape[0]
            rows = np.zeros((NPn * self._n_q, self.fs), np.float32)
            for q in range(self._n_q):
                rows[q::self._n_q] = segments[:, q * 128:q * 128 + self.fs]
            self._bank["pool3"] = jax.device_put(
                pad_pool_for_windows(rows, L - 1, L - 1))
            # block-Toeplitz kernel bank: KB[m, jj, e*128+i] =
            # ir_rev[m, e, jj-i] (the whole HRIR conv as ONE (nf, 383) x
            # (383, 256) matmul per (sample, source))
            ir_rev = np.ascontiguousarray(ir[:, :, ::-1])
            # rows zero-padded 383 -> 384 (next 128-multiple): the fused
            # Pallas mix kernel's framing contract (ops/window_gather.py
            # ::gather_mix_kb) — extra rows multiply window samples the
            # halo already covers by 0, so both paths are unchanged
            ncol = 128 * (-(-(128 + L - 1) // 128))
            jj = np.arange(ncol)[:, None]
            ii = np.arange(128)[None, :]
            d = jj - ii
            KB = ir_rev[:, :, d.clip(0, L - 1)] * ((d >= 0) & (d < L))
            kb = jax.device_put(
                KB.transpose(0, 2, 1, 3).reshape(M, ncol, 256)
                .astype(np.float32))
            if self.mix_dtype == "bfloat16":
                # cast ON DEVICE: the tunnel's host<->device transfer path
                # only implements f32 planes (see the bank comment above)
                kb = jax.jit(lambda a: a.astype(jnp.bfloat16))(kb)
            self._bank["KB"] = kb

    # ---------------- single-sample program (vmapped) ----------------

    def _one(self, bank, key, n_src_fixed: int):
        fs, S, MS = self.fs, self.n_sectors, self.max_sources
        ks = jax.random.split(key, 6)

        if n_src_fixed > 0:
            n_src = jnp.int32(n_src_fixed)
        else:
            n_src = jax.random.randint(ks[0], (), 1, MS + 1)
        active = (jnp.arange(MS) < n_src)                        # (MS,)

        sectors = jax.random.permutation(ks[1], S)[:MS]          # distinct
        # uniform in-sector pick: floor(u * count) is unbiased for any
        # per-sector count (a modulo of a bounded int is not)
        u = jax.random.uniform(ks[2], (MS,))
        counts = jnp.asarray(self._sector_counts)[sectors]
        kslot = jnp.minimum((u * counts).astype(jnp.int32), counts - 1)
        meas = jnp.asarray(self._sector_table)[sectors, kslot]   # (MS,)

        n_segs = bank["segments"].shape[0]
        seg_idx = jax.random.randint(ks[3], (MS,), 0, n_segs)
        crop = jax.random.randint(ks[5], (MS,), 0, self.ir_len)  # [0, L-1]
        if self._mxu_select:
            qoff = jax.random.randint(
                ks[4], (MS,), 0, (self._seg_len - fs) // 128 + 1)
            segs = select_segments(bank["segments"], seg_idx, qoff, fs)
        else:  # tiny/test geometries where fs isn't a multiple of 128
            seg_off = jax.random.randint(ks[4], (MS,), 0,
                                         self._seg_len - fs + 1)
            segs = jax.vmap(lambda si, so: jax.lax.dynamic_slice(
                bank["segments"][si], (so,), (fs,)))(seg_idx, seg_off)

        def one_source(m, seg, c):
            L = self.ir_len
            if self._direct_conv:
                # time-domain full convolution; vmap lifts the per-source
                # kernel into a batch-grouped conv
                seg_pad = jnp.pad(seg, (L - 1, L - 1))
                y_full = jax.lax.conv_general_dilated(
                    seg_pad[None, None, :], bank["ir_rev"][m][:, None, :],
                    window_strides=(1,), padding="VALID",
                    precision=jax.lax.Precision.HIGHEST)[0]  # (2, fs+L-1)
            else:
                X = jnp.fft.rfft(seg, n=self._fft_len)           # (F,)
                Hm = jax.lax.complex(bank["H_re"][m], bank["H_im"][m])
                y_full = jnp.fft.irfft(X[None, :] * Hm, n=self._fft_len)
            return jax.lax.dynamic_slice(y_full, (0, c), (2, fs))

        src = jax.vmap(one_source)(meas, segs, crop)              # (MS, 2, fs)
        y_lr = jnp.sum(src * active[:, None, None], axis=0)       # (2, fs)
        peak = jnp.maximum(jnp.max(jnp.abs(y_lr)), 1e-8)
        y_lr = y_lr / peak

        # ---- label vector, scatter-free (TPU scatters serialize; the
        # distinct-sector scatters are exactly one-hot weighted sums) ----
        maskf = active.astype(jnp.float32)
        # label einsums pin HIGHEST: the angle regression targets would
        # otherwise be bf16-rounded by the default MXU mode
        hi = jax.lax.Precision.HIGHEST
        sec1 = jax.nn.one_hot(sectors, S, dtype=jnp.float32)  # (MS, S)
        sound = jnp.einsum("ms,m->s", sec1, maskf, precision=hi)
        angle = jnp.einsum("ms,m->s", sec1,
                           bank["meas_norm"][meas] * maskf, precision=hi)
        base = jnp.concatenate(
            [jnp.ones((S, 1)), jnp.zeros((S, N_DIST_CLASSES - 1))], axis=1)
        dcls_i = bank["meas_dcls"][meas].astype(jnp.int32)  # f32 in the bank
        rows = jax.nn.one_hot(
            jnp.where(active, dcls_i + 1, 0), N_DIST_CLASSES)
        # an inactive slot's row is e0 == the base row, so replacing the
        # covered sectors and keeping base elsewhere is exact
        covered = jnp.sum(sec1, axis=0)                       # (S,) 0/1
        onehot = (base * (1.0 - covered)[:, None]
                  + jnp.einsum("ms,mc->sc", sec1, rows, precision=hi))
        y = jnp.concatenate(
            [sound[:, None], angle[:, None], onehot], axis=1).reshape(-1)
        # slot metadata, all float32 (the TPU tunnel only transfers f32)
        meta = {"meas": meas.astype(jnp.float32),              # (MS,)
                "sector_id": sectors.astype(jnp.float32),
                "active": maskf}
        return y_lr[0], y_lr[1], y, meta

    # ---------------- fully-batched fast path ----------------

    def _scene_batched(self, key, batch_size: int, n_src_fixed: int):
        """All per-sample draws as ONE batched call per variable (the
        per-sample split/permutation chain costs ~3 ms at batch 1024 —
        tools/bench_synth_parts.py 'scene'). Distinct sectors via argsort
        of iid uniforms (a uniformly random permutation, matching
        jax.random.permutation's distribution)."""
        B, MS, S = batch_size, self.max_sources, self.n_sectors
        ks = jax.random.split(key, 6)
        if n_src_fixed > 0:
            n_src = jnp.full((B,), n_src_fixed, jnp.int32)
        else:
            n_src = jax.random.randint(ks[0], (B,), 1, MS + 1)
        active = jnp.arange(MS)[None, :] < n_src[:, None]       # (B, MS)
        u8 = jax.random.uniform(ks[1], (B, S))
        sectors = jnp.argsort(u8, axis=1)[:, :MS]               # distinct
        u = jax.random.uniform(ks[2], (B, MS))
        counts = jnp.asarray(self._sector_counts)[sectors]
        kslot = jnp.minimum((u * counts).astype(jnp.int32), counts - 1)
        meas = jnp.asarray(self._sector_table)[sectors, kslot]  # (B, MS)
        n_segs = self._bank["segments"].shape[0]
        seg_idx = jax.random.randint(ks[3], (B, MS), 0, n_segs)
        qoff = jax.random.randint(ks[4], (B, MS), 0, self._n_q or 1)
        crop = jax.random.randint(ks[5], (B, MS), 0, self.ir_len)
        return active, sectors, meas, seg_idx, qoff, crop

    def _mix_fast(self, bank, active, meas, seg_idx, qoff, crop,
                  batch_size: int, use_kernel_hint=None):
        """windows -> block-Toeplitz HRIR conv -> masked source sum.

        out[b,e,t] = sum_s active * sum_k seg[t + c - k] ir[m, e, k] —
        ALGEBRAICALLY exact vs the per-sample conv+crop path (zero-guard
        rows reproduce the reference's zero-padded conv edges,
        generate_anechoic_data.py:154-186); the INDEXING is bit-for-bit,
        the arithmetic differs in the last float32 ulps because this
        contraction runs at Precision.HIGH (bf16_3x, ~f32-accurate —
        NOT bf16 quantization) while the per-sample path's conv pins
        HIGHEST (oracle: test_data.py::test_fast_mix_matches_numpy_conv_oracle).
        The contraction is ONE (nf, 128+L-1) x (128+L-1, 256) matmul
        per (sample, source).

        mix_dtype="bfloat16" runs the contraction with bf16 OPERANDS and
        f32 accumulation (the gather itself stays f32 — Mosaic's dynamic
        sublane slice requires 8-sublane f32 tiling — the window is cast
        in-kernel): same algebra, operands rounded to ~8 mantissa bits
        before the joint peak-normalisation that already discards
        absolute level. Policy knob, measured: tests/test_data.py pins
        the bf16-vs-f32 waveform tolerance.

        The bf16 path runs the FUSED Pallas kernel (gather_mix_kb):
        window gather + halo framing + per-window matmul against the
        VMEM-resident kernel bank in one pass — the (X, 384, 256)
        gathered-KB and (X, nf, 384) framed-window HBM intermediates of
        the unfused path (its super-linear scaling term, measured
        round 3) never materialise. f32 stays on the unfused XLA path:
        an f32 bank doubles the resident VMEM and that path is the
        HIGH-precision oracle surface.

        use_kernel_hint: Pallas calls have no SPMD partitioning rule, so
        when the synthesizer emits mesh-sharded batches
        (set_output_sharding over >1 device) the caller passes False and
        both gather ops take their bit-equivalent XLA compositions,
        which GSPMD partitions like any other HLO. None = each op's own
        auto dispatch; True forces the fused kernel (tests)."""
        from ..ops.window_gather import (gather_windows, gather_mix_kb,
                                         _gather_mix_xla)
        B, MS, fs, L = batch_size, self.max_sources, self.fs, self.ir_len
        X = B * MS
        nf = fs // 128
        rows = (seg_idx * self._n_q + qoff).reshape(X)
        if self.mix_dtype == "bfloat16":
            out = gather_mix_kb(bank["pool3"], rows, crop.reshape(X),
                                meas.reshape(X), bank["KB"], nf,
                                use_kernel=use_kernel_hint)
        else:
            # f32 oracle path: the SAME composition gather_mix_kb falls
            # back to (one framing contract, ops/window_gather.py), at
            # HIGH precision and with the Pallas window gather when the
            # hint allows it
            out = _gather_mix_xla(
                bank["pool3"], rows, crop.reshape(X), meas.reshape(X),
                bank["KB"], nf, precision=jax.lax.Precision.HIGH,
                gather=functools.partial(gather_windows,
                                         use_kernel=use_kernel_hint))
        out = out.reshape(B, MS, nf, 2, 128)
        out = out * active.astype(out.dtype)[:, :, None, None, None]
        y = out.sum(axis=1).transpose(0, 2, 1, 3).reshape(B, 2, fs)
        peak = jnp.maximum(jnp.max(jnp.abs(y), axis=(1, 2), keepdims=True),
                           1e-8)
        return y / peak

    def _labels_batched(self, bank, active, sectors, meas):
        """Batched scatter-free label build — same algebra as _one."""
        S = self.n_sectors
        hi = jax.lax.Precision.HIGHEST
        maskf = active.astype(jnp.float32)
        sec1 = jax.nn.one_hot(sectors, S, dtype=jnp.float32)   # (B, MS, S)
        sound = jnp.einsum("bms,bm->bs", sec1, maskf, precision=hi)
        angle = jnp.einsum("bms,bm->bs", sec1,
                           bank["meas_norm"][meas] * maskf, precision=hi)
        base = jnp.concatenate(
            [jnp.ones((S, 1)), jnp.zeros((S, N_DIST_CLASSES - 1))], axis=1)
        dcls_i = bank["meas_dcls"][meas].astype(jnp.int32)
        rows = jax.nn.one_hot(
            jnp.where(active, dcls_i + 1, 0), N_DIST_CLASSES)
        covered = jnp.sum(sec1, axis=1)                        # (B, S)
        onehot = (base[None] * (1.0 - covered)[:, :, None]
                  + jnp.einsum("bms,bmc->bsc", sec1, rows, precision=hi))
        B = active.shape[0]
        return jnp.concatenate(
            [sound[..., None], angle[..., None], onehot],
            axis=2).reshape(B, -1)

    def _assemble_fast(self, bank, key, batch_size: int, n_src_fixed: int,
                       out_sharding=None, with_meta: bool = False):
        active, sectors, meas, seg_idx, qoff, crop = self._scene_batched(
            key, batch_size, n_src_fixed)
        devs = getattr(out_sharding, "device_set", None)
        uk = False if devs is not None and len(devs) > 1 else None
        y_lr = self._mix_fast(bank, active, meas, seg_idx, qoff, crop,
                              batch_size, use_kernel_hint=uk)
        if self.noise_snr_db is not None:
            y_lr = add_diffuse_noise(jax.random.fold_in(key, 2**20),
                                     y_lr, self.noise_snr_db)
        wavL, wavR = y_lr[:, 0], y_lr[:, 1]
        x3 = cross_correlation_feature(wavL, wavR, self.fs,
                                       num_lags=self.num_lags,
                                       use_kernel=uk)
        y = self._labels_batched(bank, active, sectors, meas)
        out = (wavL, wavR, x3, y)
        if out_sharding is not None:
            out = jax.lax.with_sharding_constraint(out,
                                                   (out_sharding,) * 4)
        if with_meta:
            meta = {"meas": meas.astype(jnp.float32),
                    "sector_id": sectors.astype(jnp.float32),
                    "active": active.astype(jnp.float32)}
            return (*out, meta)
        return out

    def _assemble(self, bank, key, batch_size: int, n_src_fixed: int,
                  out_sharding=None):
        """Dispatch-shape-shared assembly (used by sample_batch AND the
        fused train chunk's batch_fn): fast batched path when the
        geometry allows, per-sample vmap otherwise."""
        if self._fast:
            return self._assemble_fast(bank, key, batch_size, n_src_fixed,
                                       out_sharding)
        return assemble_batch(self._one, bank, key, batch_size,
                              n_src_fixed, self.fs, self.num_lags,
                              out_sharding, noise_snr_db=self.noise_snr_db)

    def set_output_sharding(self, sharding) -> None:
        """Emit batches already laid out for the training mesh (batch axis
        sharded over 'data'): the sampler's outputs get a
        with_sharding_constraint so XLA materialises them sharded instead
        of the runner implicitly resharding a single-device batch every
        step. The sharding rides the jit cache as a static argument."""
        self._out_sharding = sharding

    @functools.partial(jax.jit, static_argnums=(0, 3, 4, 5))
    def _batch(self, bank, key, batch_size: int, n_src_fixed: int,
               out_sharding=None):
        return self._assemble(bank, key, batch_size, n_src_fixed,
                              out_sharding)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def _batch_meta(self, bank, key, batch_size: int, n_src_fixed: int):
        if self._fast:
            return self._assemble_fast(bank, key, batch_size, n_src_fixed,
                                       with_meta=True)
        keys = jax.random.split(key, batch_size)
        wavL, wavR, y, meta = jax.vmap(
            lambda k: self._one(bank, k, n_src_fixed))(keys)
        if self.noise_snr_db is not None:
            # same fold_in stream as assemble_batch so meta batches match
            # sample_batch bit-for-bit at the same key
            yn = add_diffuse_noise(jax.random.fold_in(key, 2**20),
                                   jnp.stack([wavL, wavR], axis=1),
                                   self.noise_snr_db)
            wavL, wavR = yn[:, 0], yn[:, 1]
        x3 = cross_correlation_feature(wavL, wavR, self.fs,
                                       num_lags=self.num_lags)
        return wavL, wavR, x3, y, meta

    def sample_batch(self, key, batch_size: int, n_src: int | None = None):
        """(wavL, wavR, x3, y) with shapes (B, fs) x2, (B, num_lags),
        (B, 56).

        n_src=None -> Uniform{1..max_sources} per sample (train/val);
        n_src=k    -> forced source count (test-split construction)."""
        return self._batch(self._bank, key, batch_size,
                           0 if n_src is None else int(n_src),
                           self._out_sharding)

    @property
    def bank(self):
        """Device-array bank to pass INTO the caller's jit as an argument.

        Never close over these arrays inside a jitted function: on this
        image's TPU tunnel a captured device array is re-streamed from the
        host on EVERY use — ~117 ms per access for a 131 MB constant vs
        2.4 ms for the whole train step, and a lax.scan pays it per
        iteration (tools/bench_chunk_probe.py, round 3). Banks must ride
        the argument path."""
        return self._bank

    def batch_fn(self, batch_size: int, n_src: int | None = None):
        """Pure (bank, key) -> batch closure for use INSIDE a caller's jit
        (the fused multi-step train chunk): same numerics and RNG contract
        as sample_batch, no jit boundary of its own. The bank argument
        must be this synthesizer's `.bank`, threaded through the caller's
        jit boundary (see `bank` for why it cannot be captured)."""
        nsf = 0 if n_src is None else int(n_src)
        return functools.partial(self._assemble,
                                 batch_size=batch_size, n_src_fixed=nsf,
                                 out_sharding=self._out_sharding)

    def sample_batch_meta(self, key, batch_size: int,
                          n_src: int | None = None):
        """Like sample_batch plus per-sample metadata (measurement index
        per slot, sector, active mask) so the offline writer can emit the
        reference's exact label fields — continuous aoa_deg and real
        distance_m (generate_anechoic_data.py:266-281)."""
        return self._batch_meta(self._bank, key, batch_size,
                                0 if n_src is None else int(n_src))


# ---------------- fixtures for tests / benchmarks ----------------

def make_test_hrir_bank(m_per_sector: int = 4, ir_len: int = 256,
                        seed: int = 0, fs: int = 16000):
    """A synthetic-but-plausible HRIR bank: per-azimuth interaural delay
    (up to ~0.7 ms) and level difference, exponentially decaying tails.
    Lets every synthesis/physics test run without the TU-Berlin SOFA
    files."""
    rng = np.random.default_rng(seed)
    M = 8 * m_per_sector
    az = (np.arange(M) + 0.5) * (360.0 / M)
    dist = DIST_CLASSES[np.arange(M) % 4]
    ir = np.zeros((M, 2, ir_len), np.float32)
    for m in range(M):
        theta = np.deg2rad(az[m])
        itd = 0.0007 * np.sin(theta)                 # seconds, +: right later
        base_delay = 8
        dl = base_delay + max(0, int(round(-itd * fs)))
        dr = base_delay + max(0, int(round(itd * fs)))
        gl = 1.0 + 0.4 * np.sin(theta)
        gr = 1.0 - 0.4 * np.sin(theta)
        tail = np.exp(-np.arange(24) / 4.0)
        ir[m, 0, dl:dl + 24] = gl * tail * rng.uniform(0.7, 1.0, 24)
        ir[m, 1, dr:dr + 24] = gr * tail * rng.uniform(0.7, 1.0, 24)
    return ir, az, dist


def make_test_segments(n: int = 16, seg_len: int = 16000, seed: int = 1):
    """Speech-ish pool: modulated noise, peak-normalised."""
    rng = np.random.default_rng(seed)
    t = np.arange(seg_len) / 16000.0
    segs = []
    for i in range(n):
        env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 6) * t
                                + rng.uniform(0, 6)))
        x = env * rng.standard_normal(seg_len)
        segs.append((x / (np.abs(x).max() + 1e-8)).astype(np.float32))
    return np.stack(segs)

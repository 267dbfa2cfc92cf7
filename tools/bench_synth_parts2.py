#!/usr/bin/env python
"""Synthesis reformulation candidates, round 2 (see bench_synth_parts.py).

Findings from part 1 (batch 1024, pool 256, one v5e):
  scene 2.9 ms | select 3.2-4.5 ms | conv 29-31 ms (21 nocrop; toep 18.5)
  crop:dynslice-static delta 6.4 ms | cc: fft 10.5, mxu 3.7 | full 41.7

Diagnosis: HBM-traffic-bound. The (X,2,16255) full-conv intermediate plus
its misaligned crop moves ~2.4 GB/step; the per-sample RNG costs 2.9 ms.

Candidates here:
  scene2       one batched RNG draw per variable (8 calls total, argsort
               for distinct sectors) instead of 6 x 1024 per-sample calls
  win          fused selection+crop: ONE dynamic-slice per (sample,source)
               reading the conv input window pool[row, qoff*128+c-255 :
               ...+fs+L-1] from a pre-padded pool — no segment
               materialisation, no output crop
  conv:fgroup  windows -> single batch-grouped conv (per-sample kernels
               (2, MS, L), summing sources in the conv's channel sum)
  conv:ftoep   windows -> frames -> batched matmul vs per-measurement
               block-Toeplitz kernel bank (MXU-dense), mask+sum sources
  cc2          cc:mxu with the diagonal extraction as pad+reshape+reduce
               (stride-257 trick) instead of the second matmul
  pipe         all of the above composed end-to-end incl. labels+norm
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def chain_timeit(fn, args, steps, windows):
    import jax
    import jax.numpy as jnp
    carry = jnp.float32(0.0)
    carry = fn(carry, *args)
    jax.block_until_ready(carry)
    ms = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = fn(carry, *args)
        jax.block_until_ready(carry)
        ms.append((time.perf_counter() - t0) * 1000.0 / steps)
    return statistics.median(ms)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    HI = lax.Precision.HIGHEST

    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank, make_test_segments)
    from biear_tpu.ops.xcorr import _lag_plan, cross_correlation_feature

    B, MS, fs, L = args.batch, 3, 16000, 256
    X = B * MS
    W = fs + L - 1                                  # conv input window
    ir, az, dist = make_test_hrir_bank()
    M = ir.shape[0]
    segs_pool = make_test_segments(args.pool)
    synth = AnechoicSynthesizer(ir, az, dist, segs_pool, fs=fs, num_lags=100)
    pool_dev = synth._bank["segments"]
    NP, T = pool_dev.shape
    ir_rev_np = np.asarray(ir, np.float32)[:, :, ::-1]
    ir_rev = jnp.asarray(np.ascontiguousarray(ir_rev_np))

    # pre-padded pool: row' = [0]*(L-1) ++ row ++ [0]*(L+1); width T+512
    # stays a multiple of 128 (misaligned row strides slow the gather).
    # window offset = qoff*128 + c (c in [0, L-1]); max offset + W =
    # (T-fs) + 255 + fs + L - 1 = T + 510 <= T + 512.
    pool_pad = jnp.asarray(np.pad(np.asarray(pool_dev),
                                  ((0, 0), (L - 1, L + 1))))

    # block-Toeplitz kernel bank: KB[m, jj, e*128+i] = ir_rev[m, e, jj-i]
    KB = np.zeros((M, 128 + L - 1, 2, 128), np.float32)
    jj = np.arange(128 + L - 1)[:, None]
    ii = np.arange(128)[None, :]
    d = jj - ii
    valid = (d >= 0) & (d < L)
    for m in range(M):
        for e in range(2):
            KB[m, :, e, :] = np.where(valid,
                                      ir_rev_np[m, e, d.clip(0, L - 1)], 0.0)
    KB = jnp.asarray(KB.reshape(M, 128 + L - 1, 256))

    tbl = jnp.asarray(synth._sector_table)
    cnt = jnp.asarray(synth._sector_counts)
    norm_t = synth._bank["meas_norm"]
    dcls_t = synth._bank["meas_dcls"]

    def key_of(carry):
        return jax.random.PRNGKey(carry.astype(jnp.int32) & 0xFFFF)

    # ---------------- batched scene sampling ----------------
    def scene_batched(key):
        ks = jax.random.split(key, 6)
        n_src = jax.random.randint(ks[0], (B,), 1, MS + 1)
        active = (jnp.arange(MS)[None, :] < n_src[:, None])     # (B, MS)
        u8 = jax.random.uniform(ks[1], (B, 8))
        sectors = jnp.argsort(u8, axis=1)[:, :MS]               # distinct
        u = jax.random.uniform(ks[2], (B, MS))
        counts = cnt[sectors]
        kslot = jnp.minimum((u * counts).astype(jnp.int32), counts - 1)
        meas = tbl[sectors, kslot]                              # (B, MS)
        seg_idx = jax.random.randint(ks[3], (B, MS), 0, NP)
        qoff = jax.random.randint(ks[4], (B, MS), 0, (T - fs) // 128 + 1)
        c = jax.random.randint(ks[5], (B, MS), 0, L)
        return n_src, active, sectors, meas, seg_idx, qoff, c

    @jax.jit
    def f_scene2(carry):
        outs = scene_batched(key_of(carry))
        return sum(o.sum().astype(jnp.float32) for o in outs) * 1e-9

    # ---------------- fused window gather ----------------
    def gather_windows(seg_idx, qoff, c):
        off = qoff * 128 + c                                    # (B, MS)
        return jax.vmap(lambda i, o: lax.dynamic_slice(
            pool_pad[i], (o,), (W,)))(seg_idx.reshape(X), off.reshape(X))

    @jax.jit
    def f_win(carry):
        _, active, _, _, seg_idx, qoff, c = scene_batched(key_of(carry))
        win = gather_windows(seg_idx, qoff, c)
        return win.sum() * 1e-9

    # ---------------- conv candidates over windows ----------------
    def conv_fgroup(win, meas, active):
        win = win.reshape(B, MS, W) * active[:, :, None]
        kers = ir_rev[meas.reshape(X)].reshape(B, MS, 2, L)
        kers = kers.transpose(0, 2, 1, 3).reshape(B * 2, MS, L)
        y = lax.conv_general_dilated(
            win.reshape(1, B * MS, W), kers,
            window_strides=(1,), padding="VALID",
            feature_group_count=B,
            dimension_numbers=("NCW", "OIW", "NCW"),
            precision=HI)
        return y[0].reshape(B, 2, fs)

    @jax.jit
    def f_conv_fgroup(carry):
        _, active, _, meas, seg_idx, qoff, c = scene_batched(key_of(carry))
        win = gather_windows(seg_idx, qoff, c)
        y = conv_fgroup(win, meas, active.astype(jnp.float32))
        return y.sum() * 1e-9

    def conv_ftoep(win, meas, active, prec):
        # frames over the output grid: Fw[x, f, jj] = win[x, 128f + jj]
        winp = jnp.pad(win, ((0, 0), (0, 129)))                 # W=16255->16384
        blk = winp.reshape(X, 128, 128)
        Fw = jnp.concatenate([blk[:, 0:125], blk[:, 1:126], blk[:, 2:127]],
                             axis=-1)[:, :, :128 + L - 1]       # (X,125,383)
        Kx = KB[meas.reshape(X)]                                # (X,383,256)
        out = jnp.einsum("xfj,xjc->xfc", Fw, Kx, precision=prec)
        y = out.reshape(B, MS, 125, 2, 128) * active[:, :, None, None, None]
        y = y.sum(axis=1)                                       # (B,125,2,128)
        return y.transpose(0, 2, 1, 3).reshape(B, 2, fs)

    def mk_f_conv_ftoep(prec):
        @jax.jit
        def f(carry):
            _, active, _, meas, seg_idx, qoff, c = scene_batched(key_of(carry))
            win = gather_windows(seg_idx, qoff, c)
            y = conv_ftoep(win, meas, active.astype(jnp.float32), prec)
            return y.sum() * 1e-9
        return f

    # ---------------- cc with strided diag extraction ----------------
    kept, j0, w_int = _lag_plan(fs, fs, 100, 3.0)
    mk = int(np.max(np.abs(kept)))
    n_s = 2 * mk + 1
    j0_d = jnp.asarray(j0)
    w_d = jnp.asarray(w_int)

    def cc_mxu2(wl, wr, prec):
        nb = wl.shape[0]
        lf = wl - jnp.mean(wl, axis=-1, keepdims=True)
        rf = wr - jnp.mean(wr, axis=-1, keepdims=True)
        Lp = jnp.pad(lf, ((0, 0), (mk, mk + 32)))
        Lb = Lp.reshape(nb, 126, 128)
        Lw = jnp.concatenate([Lb[:, :125], Lb[:, 1:126]], axis=-1)
        Rf = rf.reshape(nb, 125, 128)
        C = jnp.einsum("bfi,bfj->bij", Rf, Lw, precision=prec)  # (nb,128,256)
        Cp = jnp.pad(C.reshape(nb, 128 * 256), ((0, 0), (0, 128)))
        corr = Cp.reshape(nb, 128, 257)[:, :, :n_s].sum(axis=1)
        peak = jnp.max(jnp.abs(corr), axis=-1, keepdims=True) + 1e-8
        cc = corr / peak
        c0 = cc[:, j0_d]
        c1 = cc[:, j0_d + 1]
        return (c0 + w_d[None, :] * (c1 - c0)).astype(jnp.float32)

    def mk_f_cc2(prec):
        @jax.jit
        def f(carry, wl_a, wr_a):
            wl = wl_a + carry * 1e-30
            return cc_mxu2(wl, wr_a, prec).sum() * 1e-9
        return f

    rng = np.random.default_rng(0)
    wavL_in = jnp.asarray(rng.standard_normal((B, fs)).astype(np.float32))
    wavR_in = jnp.asarray(rng.standard_normal((B, fs)).astype(np.float32))

    # ---------------- full candidate pipeline ----------------
    def labels_from(sectors, meas, active):
        from biear_tpu.data.labels import N_DIST_CLASSES
        hi = HI
        maskf = active.astype(jnp.float32)
        sec1 = jax.nn.one_hot(sectors, 8, dtype=jnp.float32)    # (B,MS,8)
        sound = jnp.einsum("bms,bm->bs", sec1, maskf, precision=hi)
        angle = jnp.einsum("bms,bm->bs", sec1, norm_t[meas] * maskf,
                           precision=hi)
        base = jnp.concatenate(
            [jnp.ones((8, 1)), jnp.zeros((8, N_DIST_CLASSES - 1))], axis=1)
        dcls_i = dcls_t[meas].astype(jnp.int32)
        rows_ = jax.nn.one_hot(
            jnp.where(active, dcls_i + 1, 0), N_DIST_CLASSES)   # (B,MS,C)
        covered = jnp.sum(sec1, axis=1)                         # (B,8)
        onehot = (base[None] * (1.0 - covered)[:, :, None]
                  + jnp.einsum("bms,bmc->bsc", sec1, rows_, precision=hi))
        return jnp.concatenate([sound[..., None], angle[..., None], onehot],
                               axis=2).reshape(B, -1)

    def mk_f_pipe(convkind):
        @jax.jit
        def f(carry):
            _, active, sectors, meas, seg_idx, qoff, c = scene_batched(
                key_of(carry))
            win = gather_windows(seg_idx, qoff, c)
            af = active.astype(jnp.float32)
            if convkind == "ftoep":
                y = conv_ftoep(win, meas, af, None)
            else:
                y = conv_fgroup(win, meas, af)
            peak = jnp.maximum(jnp.max(jnp.abs(y), axis=(1, 2),
                                       keepdims=True), 1e-8)
            y = y / peak
            x3 = cc_mxu2(y[:, 0], y[:, 1], None)
            yl = labels_from(sectors, meas, active)
            return (y.sum() + x3.sum() + yl.sum()) * 1e-9
        return f

    rows = {
        "scene2": (f_scene2, ()),
        "win": (f_win, ()),
        "conv:fgroup": (f_conv_fgroup, ()),
        "conv:ftoep_default": (mk_f_conv_ftoep(None), ()),
        "conv:ftoep_highest": (mk_f_conv_ftoep(HI), ()),
        "cc2:default": (mk_f_cc2(None), (wavL_in, wavR_in)),
        "cc2:highest": (mk_f_cc2(HI), (wavL_in, wavR_in)),
        "pipe:ftoep": (mk_f_pipe("ftoep"), ()),
        "pipe:fgroup": (mk_f_pipe("fgroup"), ()),
    }

    # correctness: cc2 vs oracle; ftoep vs direct conv on a tiny case
    cc_ref = np.asarray(cross_correlation_feature(
        wavL_in[:8], wavR_in[:8], fs, num_lags=100))
    cc_new = np.asarray(jax.jit(
        lambda a, b: cc_mxu2(a, b, HI))(wavL_in[:8], wavR_in[:8]))
    cc_err = float(np.max(np.abs(cc_ref - cc_new)))
    print(json.dumps({"check": "cc2_vs_fft_max_err", "value": cc_err}),
          flush=True)

    w_t = np.asarray(rng.standard_normal((1, W)).astype(np.float32))
    m_t = np.asarray([[1]], np.int32)
    y_toep = np.asarray(jax.jit(lambda w: jnp.einsum(
        "xfj,xjc->xfc",
        jnp.concatenate([jnp.pad(w, ((0, 0), (0, 129))).reshape(1, 128, 128)[:, i:125 + i]
                         for i in range(3)], axis=-1)[:, :, :383],
        KB[jnp.asarray([1])], precision=HI))(jnp.asarray(w_t)))
    y_toep = y_toep.reshape(1, 125, 2, 128).transpose(0, 2, 1, 3).reshape(1, 2, fs)
    y_ref = np.stack([np.convolve(w_t[0], ir_rev_np[1, e][::-1],
                                  mode="valid") for e in range(2)])[None]
    toep_err = float(np.max(np.abs(y_toep - y_ref)))
    print(json.dumps({"check": "ftoep_vs_npconv_max_err", "value": toep_err,
                      "scale": float(np.max(np.abs(y_ref)))}), flush=True)

    only = args.only.split(",") if args.only else None
    for name, (fn, a) in rows.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        try:
            ms = chain_timeit(fn, a, args.steps, args.windows)
            print(json.dumps({"part": name, "batch": B, "pool": args.pool,
                              "ms": round(ms, 3)}), flush=True)
        except Exception as e:
            print(json.dumps({"part": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()

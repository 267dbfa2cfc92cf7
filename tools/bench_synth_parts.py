#!/usr/bin/env python
"""Component-level synthesis micro-benchmark with candidate reformulations.

Round-2 left the fused synthesize->train pipeline data-bound 26x (38.6 ms
synthesis vs 1.5 ms train step at batch 1024). This tool times each piece
of the synthesis pipeline standalone AND the candidate TPU reformulations
of the expensive ones, so the production implementation is chosen by
measurement (the round-2 kernel-ladder discipline):

  scene     per-sample RNG + sector/measurement sampling only
  sel:*     segment selection variants (one-hot matmul / row gather)
  conv:*    HRIR convolution variants (vmapped grouped conv / flat
            batch-grouped conv / block-Toeplitz batched matmul)
  crop:*    the random 1-s output crop (misaligned dynamic_slice vs none)
  cc:*      cross-correlation feature variants (FFT / two-matmul MXU
            contraction over the kept lags / depthwise conv)
  full      current production sample_batch for reference

Every timed call is dependency-chained through a carry scalar (same-input
async dispatches report fantasy numbers through this TPU tunnel). Prints
one JSON line per row: {"part": ..., "ms": ..., "check": ...}.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HI = None  # set to jax.lax.Precision.HIGHEST after import


def chain_timeit(make_fn, steps, windows):
    """Time fn(carry)->carry chains; carry is a device scalar so every
    dispatch depends on the previous one."""
    import jax
    import jax.numpy as jnp
    made = make_fn()
    fn, args = made if isinstance(made, tuple) else (made, ())
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
    ap.add_argument("--only", default=None, help="comma-list of row prefixes")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    global HI
    HI = lax.Precision.HIGHEST

    from biear_tpu.data.synth import (AnechoicSynthesizer, select_segments,
                                      make_test_hrir_bank, make_test_segments)
    from biear_tpu.ops.xcorr import cross_correlation_feature, _lag_plan

    B, MS, fs, L = args.batch, 3, 16000, 256
    X = B * MS
    ir, az, dist = make_test_hrir_bank()
    M = ir.shape[0]
    segs_pool = make_test_segments(args.pool)
    synth = AnechoicSynthesizer(ir, az, dist, segs_pool, fs=fs, num_lags=100)
    pool_dev = synth._bank["segments"]          # (NP, T) padded to 128
    NP, T = pool_dev.shape
    ir_rev = synth._bank["ir_rev"]              # (M, 2, L)

    rng = np.random.default_rng(0)
    segs_in = jnp.asarray(rng.standard_normal((B, MS, fs)).astype(np.float32))
    meas_in = jnp.asarray(rng.integers(0, M, (B, MS)).astype(np.int32))
    crop_in = jnp.asarray(rng.integers(0, L, (B, MS)).astype(np.int32))
    wavL_in = jnp.asarray(rng.standard_normal((B, fs)).astype(np.float32))
    wavR_in = jnp.asarray(rng.standard_normal((B, fs)).astype(np.float32))

    def key_of(carry):
        return jax.random.PRNGKey(carry.astype(jnp.int32) & 0xFFFF)

    rows = {}

    # ---------------- scene sampling only ----------------
    def mk_scene():
        tbl = jnp.asarray(synth._sector_table)
        cnt = jnp.asarray(synth._sector_counts)

        @jax.jit
        def f(carry):
            keys = jax.random.split(key_of(carry), B)

            def one(key):
                ks = jax.random.split(key, 6)
                n_src = jax.random.randint(ks[0], (), 1, MS + 1)
                active = (jnp.arange(MS) < n_src)
                sectors = jax.random.permutation(ks[1], 8)[:MS]
                u = jax.random.uniform(ks[2], (MS,))
                counts = cnt[sectors]
                kslot = jnp.minimum((u * counts).astype(jnp.int32),
                                    counts - 1)
                meas = tbl[sectors, kslot]
                seg_idx = jax.random.randint(ks[3], (MS,), 0, NP)
                c = jax.random.randint(ks[5], (MS,), 0, L)
                return (meas.sum() + seg_idx.sum() + c.sum()
                        + active.sum() + sectors.sum())

            return jax.vmap(one)(keys).sum().astype(jnp.float32) * 1e-9
        return f

    rows["scene"] = mk_scene

    # ---------------- segment selection ----------------
    def mk_sel_onehot(prec):
        def make():
            @jax.jit
            def f(carry):
                k = key_of(carry)
                si = jax.random.randint(k, (X,), 0, NP)
                qo = jax.random.randint(jax.random.fold_in(k, 1), (X,), 0,
                                        (T - fs) // 128 + 1)
                Mh = jax.nn.one_hot(si, NP, dtype=jnp.float32)
                rws = jnp.matmul(Mh, pool_dev,
                                 precision=prec).reshape(X, T // 128, 128)
                nbo = fs // 128
                S = (jnp.arange(T // 128)[None, None, :]
                     == jnp.arange(nbo)[None, :, None] + qo[:, None, None]
                     ).astype(jnp.float32)
                out = jnp.einsum("sob,sbk->sok", S, rws,
                                 precision=prec).reshape(X, fs)
                return out.sum() * 1e-9
            return f
        return make

    rows["sel:onehot_default"] = mk_sel_onehot(None)
    rows["sel:onehot_highest"] = mk_sel_onehot(HI)

    def mk_sel_rowgather():
        @jax.jit
        def f(carry):
            k = key_of(carry)
            si = jax.random.randint(k, (X,), 0, NP)
            qo = jax.random.randint(jax.random.fold_in(k, 1), (X,), 0,
                                    (T - fs) // 128 + 1)
            rws = pool_dev[si].reshape(X, T // 128, 128)
            nbo = fs // 128
            S = (jnp.arange(T // 128)[None, None, :]
                 == jnp.arange(nbo)[None, :, None] + qo[:, None, None]
                 ).astype(jnp.float32)
            out = jnp.einsum("sob,sbk->sok", S, rws,
                             precision=HI).reshape(X, fs)
            return out.sum() * 1e-9
        return f

    rows["sel:rowgather"] = mk_sel_rowgather

    def mk_sel_dynslice():
        @jax.jit
        def f(carry):
            k = key_of(carry)
            si = jax.random.randint(k, (X,), 0, NP)
            so = jax.random.randint(jax.random.fold_in(k, 1), (X,), 0,
                                    T - fs + 1)
            out = jax.vmap(lambda i, o: lax.dynamic_slice(
                pool_dev[i], (o,), (fs,)))(si, so)
            return out.sum() * 1e-9
        return f

    rows["sel:dynslice"] = mk_sel_dynslice

    # ---------------- HRIR convolution ----------------
    def mk_conv_vmapped(prec):
        def make():
            @jax.jit
            def f(carry, segs_a, meas_a, crop_a):
                segs = segs_a + carry * 1e-30

                def one(seg, m, c):
                    seg_pad = jnp.pad(seg, (L - 1, L - 1))
                    y = lax.conv_general_dilated(
                        seg_pad[None, None, :], ir_rev[m][:, None, :],
                        window_strides=(1,), padding="VALID",
                        precision=prec)[0]
                    return lax.dynamic_slice(y, (0, c), (2, fs))

                out = jax.vmap(jax.vmap(one))(segs, meas_a, crop_a)
                return out.sum() * 1e-9
            return f, (segs_in, meas_in, crop_in)
        return make

    rows["conv:vmapped_highest"] = mk_conv_vmapped(HI)
    rows["conv:vmapped_default"] = mk_conv_vmapped(None)

    def mk_conv_vmapped_nocrop():
        @jax.jit
        def f(carry, segs_a, meas_a):
            segs = segs_a + carry * 1e-30

            def one(seg, m):
                seg_pad = jnp.pad(seg, (L - 1, L - 1))
                y = lax.conv_general_dilated(
                    seg_pad[None, None, :], ir_rev[m][:, None, :],
                    window_strides=(1,), padding="VALID",
                    precision=HI)[0]
                return y[:, :fs]

            out = jax.vmap(jax.vmap(one))(segs, meas_a)
            return out.sum() * 1e-9
        return f, (segs_in, meas_in)

    rows["conv:vmapped_nocrop"] = mk_conv_vmapped_nocrop

    def mk_conv_flat(prec):
        def make():
            @jax.jit
            def f(carry, segs_a, meas_a, crop_a):
                segs = (segs_a + carry * 1e-30).reshape(X, fs)
                seg_pad = jnp.pad(segs, ((0, 0), (L - 1, L - 1)))
                kers = ir_rev[meas_a.reshape(X)]           # (X, 2, L)
                y = lax.conv_general_dilated(
                    seg_pad[None], kers.reshape(2 * X, 1, L),
                    window_strides=(1,), padding="VALID",
                    feature_group_count=X,
                    dimension_numbers=("NCW", "OIW", "NCW"),
                    precision=prec)
                y = y[0].reshape(X, 2, fs + L - 1)
                out = jax.vmap(lambda yy, c: lax.dynamic_slice(
                    yy, (0, c), (2, fs)))(y, crop_a.reshape(X))
                return out.sum() * 1e-9
            return f, (segs_in, meas_in, crop_in)
        return make

    rows["conv:flat_highest"] = mk_conv_flat(HI)
    rows["conv:flat_default"] = mk_conv_flat(None)

    # block-Toeplitz batched matmul; K bank (M, 383, 2*128) precomputed
    ir_np = np.asarray(ir, np.float32)          # (M, 2, L)
    KB = np.zeros((M, 128 + L - 1, 2, 128), np.float32)
    jj = np.arange(128 + L - 1)[:, None]
    ii = np.arange(128)[None, :]
    d = jj - ii                                 # ir_rev index = ir[L-1-d]
    valid = (d >= 0) & (d < L)
    for m in range(M):
        for e in range(2):
            KB[m, :, e, :] = np.where(valid, ir_np[m, e, L - 1 - d.clip(0, L - 1)], 0.0)
    KB = jnp.asarray(KB.reshape(M, 128 + L - 1, 2 * 128))

    def mk_conv_toep(prec):
        def make():
            nf = (fs + L - 1 + 127) // 128      # output frames
            pad_to = (nf + 2) * 128

            @jax.jit
            def f(carry, segs_a, meas_a, crop_a):
                segs = (segs_a + carry * 1e-30).reshape(X, fs)
                segpad = jnp.pad(segs, ((0, 0), (L - 1, pad_to - fs - L + 1)))
                blk = segpad.reshape(X, pad_to // 128, 128)
                Sw = jnp.concatenate(
                    [blk[:, 0:nf], blk[:, 1:nf + 1], blk[:, 2:nf + 2]],
                    axis=-1)[:, :, :128 + L - 1]           # (X, nf, 383)
                Kx = KB[meas_a.reshape(X)]                  # (X, 383, 256)
                out = jnp.einsum("xfj,xjc->xfc", Sw, Kx,
                                 precision=prec)            # (X, nf, 256)
                y = out.reshape(X, nf, 2, 128).transpose(0, 2, 1, 3)
                y = y.reshape(X, 2, nf * 128)[:, :, :fs + L - 1]
                yc = jax.vmap(lambda yy, c: lax.dynamic_slice(
                    yy, (0, c), (2, fs)))(y, crop_a.reshape(X))
                return yc.sum() * 1e-9
            return f, (segs_in, meas_in, crop_in)
        return make

    rows["conv:toep_highest"] = mk_conv_toep(HI)
    rows["conv:toep_default"] = mk_conv_toep(None)

    # ---------------- crop cost isolated ----------------
    yfull_in = jnp.asarray(rng.standard_normal(
        (X, 2, fs + L - 1)).astype(np.float32))

    def mk_crop_dyn():
        @jax.jit
        def f(carry, y_a, crop_a):
            y = y_a + carry * 1e-30
            out = jax.vmap(lambda yy, c: lax.dynamic_slice(
                yy, (0, c), (2, fs)))(y, crop_a.reshape(X))
            return out.sum() * 1e-9
        return f, (yfull_in, crop_in)

    rows["crop:dynslice"] = mk_crop_dyn

    def mk_crop_static():
        @jax.jit
        def f(carry, y_a):
            y = y_a + carry * 1e-30
            return y[:, :, :fs].sum() * 1e-9
        return f, (yfull_in,)

    rows["crop:static"] = mk_crop_static

    # ---------------- cross-correlation ----------------
    def mk_cc_fft():
        @jax.jit
        def f(carry, wl_a, wr_a):
            wl = wl_a + carry * 1e-30
            cc = cross_correlation_feature(wl, wr_a, fs, num_lags=100)
            return cc.sum() * 1e-9
        return f, (wavL_in, wavR_in)

    rows["cc:fft"] = mk_cc_fft

    kept, j0, w_int = _lag_plan(fs, fs, 100, 3.0)
    mk = int(np.max(np.abs(kept)))              # 48
    n_s = 2 * mk + 1                            # 97
    Dsel = np.zeros((128, 256, n_s), np.float32)
    for i in range(128):
        for s in range(n_s):
            if i + s < 256:
                Dsel[i, i + s, s] = 1.0
    Dsel = jnp.asarray(Dsel)
    j0_d = jnp.asarray(j0)
    w_d = jnp.asarray(w_int)

    def cc_mxu_impl(wl, wr, prec):
        nb = wl.shape[0]
        lf = wl - jnp.mean(wl, axis=-1, keepdims=True)
        rf = wr - jnp.mean(wr, axis=-1, keepdims=True)
        Lp = jnp.pad(lf, ((0, 0), (mk, mk + 32)))      # (nb, 16128)
        Lb = Lp.reshape(nb, 126, 128)
        Lw = jnp.concatenate([Lb[:, :125], Lb[:, 1:126]], axis=-1)
        Rf = rf.reshape(nb, 125, 128)
        C = jnp.einsum("bfi,bfj->bij", Rf, Lw, precision=prec)
        corr = jnp.einsum("bij,ijs->bs", C, Dsel, precision=prec)
        peak = jnp.max(jnp.abs(corr), axis=-1, keepdims=True) + 1e-8
        cc_crop = corr / peak
        c0 = cc_crop[:, j0_d]
        c1 = cc_crop[:, j0_d + 1]
        return (c0 + w_d[None, :] * (c1 - c0)).astype(jnp.float32)

    def mk_cc_mxu(prec):
        def make():
            @jax.jit
            def f(carry, wl_a, wr_a):
                wl = wl_a + carry * 1e-30
                cc = cc_mxu_impl(wl, wr_a, prec)
                return cc.sum() * 1e-9
            return f, (wavL_in, wavR_in)
        return make

    rows["cc:mxu_highest"] = mk_cc_mxu(HI)
    rows["cc:mxu_default"] = mk_cc_mxu(None)

    def mk_cc_depthconv():
        @jax.jit
        def f(carry, wl_a, wr_a):
            wl = wl_a + carry * 1e-30
            lf = wl - jnp.mean(wl, axis=-1, keepdims=True)
            rf = wr_a - jnp.mean(wr_a, axis=-1, keepdims=True)
            Lp = jnp.pad(lf, ((0, 0), (mk, mk)))       # (B, 16096)
            corr = lax.conv_general_dilated(
                Lp[None], rf[:, None, :],
                window_strides=(1,), padding="VALID",
                feature_group_count=B,
                dimension_numbers=("NCW", "OIW", "NCW"),
                precision=HI)[0]                        # (B, 97)
            peak = jnp.max(jnp.abs(corr), axis=-1, keepdims=True) + 1e-8
            cc_crop = corr / peak
            c0 = cc_crop[:, j0_d]
            c1 = cc_crop[:, j0_d + 1]
            return (c0 + w_d[None, :] * (c1 - c0)).sum() * 1e-9
        return f, (wavL_in, wavR_in)

    rows["cc:depthconv"] = mk_cc_depthconv

    # ---------------- full current pipeline ----------------
    def mk_full():
        def f(carry):
            k = jax.random.PRNGKey(0)  # host-side key; chain via block
            out = synth.sample_batch(
                jax.random.fold_in(k, 0), B)
            return out[2].sum() * 1e-9
        # sample_batch is already jitted; carry chain via fold_in of carry
        @jax.jit
        def key_from(carry):
            return jax.random.PRNGKey(carry.astype(jnp.int32) & 0xFFFF)

        def g(carry):
            out = synth.sample_batch(key_from(carry), B)
            return out[2].sum() * 1e-9
        return g

    rows["full"] = mk_full

    # correctness spot-check for cc:mxu vs oracle
    cc_ref = np.asarray(cross_correlation_feature(
        wavL_in[:8], wavR_in[:8], fs, num_lags=100))
    cc_new = np.asarray(jax.jit(
        lambda a, b: cc_mxu_impl(a, b, HI))(wavL_in[:8], wavR_in[:8]))
    cc_err = float(np.max(np.abs(cc_ref - cc_new)))

    only = args.only.split(",") if args.only else None
    for name, make in rows.items():
        if only and not any(name.startswith(p) for p in only):
            continue
        try:
            ms = chain_timeit(make, args.steps, args.windows)
            row = {"part": name, "batch": B, "pool": args.pool,
                   "ms": round(ms, 3)}
            if name.startswith("cc:mxu"):
                row["max_err_vs_fft"] = cc_err
            print(json.dumps(row), flush=True)
        except Exception as e:
            print(json.dumps({"part": name, "error": str(e)[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()

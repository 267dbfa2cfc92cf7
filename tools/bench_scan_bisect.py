#!/usr/bin/env python
"""Bisect the fused-chunk scan body at DRAIN rate.

This tunnel's block_until_ready does not synchronously block on
execution completion until the in-flight queue saturates, so short
timing windows measure dispatch, not compute. Here every variant is
timed over enough scan iterations (--iters) that the sustained drain
rate dominates, with an initial saturating window discarded.

Variants (scan over C iterations, B batch):
  synth        body = synthesize batch only (sum reduced to scalar)
  synth_nocc   synthesize without the CC feature
  gather       body = Pallas window gather only
  fwd          body = synth + forward loss (no grad)
  fwdbwd       body = synth + value_and_grad
  full         body = synth + train step core (grad + adam + telemetry)
  train_only   body = train step core on a key-refreshed frozen batch
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=96,
                    help="total scan iterations per timed window")
    ap.add_argument("--variants",
                    default="synth,synth_nocc,gather,fwd,fwdbwd,full,train_only")
    args = ap.parse_args()
    B, C = args.batch, args.chunk
    n_disp = max(args.iters // C, 1)

    import functools
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig, active_forward
    from biear_tpu.models.biear import init_active
    from biear_tpu.train import TrainHyper, make_optimizer
    from biear_tpu.train.loop import _train_step_core, _loss_fn
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)
    from biear_tpu.ops.window_gather import gather_windows

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0)
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)
    loss_impl = _loss_fn("active")

    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(256)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                num_lags=cfg.n_bands)
    bank = synth.bank
    bfn = synth.batch_fn(B)

    kh = {"k": jax.random.PRNGKey(0)}

    def nk():
        kh["k"], k = jax.random.split(kh["k"])
        return k

    def _sync(out):
        # block_until_ready does NOT wait for execution completion on this
        # tunnel backend; a device_get data transfer does (ground-truthed
        # in round 3: the chunk "measured" 0.18 ms/step with
        # block_until_ready vs a true 126 ms/step under device_get).
        return jax.device_get(jax.tree.leaves(out)[0])

    def drain_time(once, label):
        _sync(once())                    # compile + warmup
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_disp):
                out = once()
            _sync(out)
            dt = time.perf_counter() - t0
            rates.append(dt * 1000 / (n_disp * C))
        ms = statistics.median(rates)
        print(f"{label:>12}: {ms:9.3f} ms/step  ({B/ms*1000:,.0f} utt/s)"
              f"  windows={['%.2f' % r for r in rates]}", flush=True)

    want = set(args.variants.split(","))

    if "synth" in want:
        @jax.jit
        def scan_synth(bank, rng):
            def body(c, k):
                k_synth, _ = jax.random.split(k)
                b = bfn(bank, k_synth)
                return c + b[0].sum() + b[2].sum() + b[3].sum(), 0.0
            keys = jax.random.split(rng, C)
            c, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return c
        drain_time(lambda: scan_synth(bank, nk()), "synth")

    if "synth_nocc" in want:
        @jax.jit
        def scan_synth2(bank, rng):
            def body(c, k):
                k_synth, _ = jax.random.split(k)
                active, sectors, meas, seg_idx, qoff, crop = \
                    synth._scene_batched(k_synth, B, 0)
                y = synth._mix_fast(bank, active, meas, seg_idx, qoff,
                                    crop, B)
                lab = synth._labels_batched(bank, active, sectors, meas)
                return c + y.sum() + lab.sum(), 0.0
            keys = jax.random.split(rng, C)
            c, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return c
        drain_time(lambda: scan_synth2(bank, nk()), "synth_nocc")

    if "gather" in want:
        MS = synth.max_sources
        X = B * MS

        @jax.jit
        def scan_gather(bank, rng):
            def body(c, k):
                k1, k2 = jax.random.split(k)
                rows = jax.random.randint(
                    k1, (X,), 0, bank["pool3"].shape[0])
                offs = jax.random.randint(k2, (X,), 0, synth.ir_len)
                w = gather_windows(bank["pool3"], rows, offs)
                return c + w.sum(), 0.0
            keys = jax.random.split(rng, C)
            c, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return c
        drain_time(lambda: scan_gather(bank, nk()), "gather")

    if "fwd" in want:
        @jax.jit
        def scan_fwd(bank, p, rng):
            def body(c, k):
                k_synth, k_step = jax.random.split(k)
                b = bfn(bank, k_synth)
                loss, _ = loss_impl(p, cfg, hp, b, k_step, True)
                return c + loss, 0.0
            keys = jax.random.split(rng, C)
            c, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return c
        drain_time(lambda: scan_fwd(bank, params, nk()), "fwd")

    if "fwdbwd" in want:
        @jax.jit
        def scan_fb(bank, p, rng):
            def body(c, k):
                k_synth, k_step = jax.random.split(k)
                b = bfn(bank, k_synth)

                def lf(p_):
                    return loss_impl(p_, cfg, hp, b, k_step, True)
                (loss, _), g = jax.value_and_grad(lf, has_aux=True)(p)
                gn = sum(jnp.sum(x * x) for x in jax.tree.leaves(g))
                return c + loss + gn, 0.0
            keys = jax.random.split(rng, C)
            c, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return c
        drain_time(lambda: scan_fb(bank, params, nk()), "fwdbwd")

    if "full" in want:
        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def scan_full(bank, p, o, rng, lr):
            def body(carry, k):
                p, o = carry
                k_synth, k_step = jax.random.split(k)
                b = bfn(bank, k_synth)
                p, o, m = _train_step_core(loss_impl, cfg, hp, opt, 200,
                                           p, o, b, k_step, lr)
                return (p, o), m["loss"]
            keys = jax.random.split(rng, C)
            (p, o), losses = jax.lax.scan(body, (p, o), keys)
            return p, o, losses

        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

        def once_full():
            st["p"], st["o"], ls = scan_full(bank, st["p"], st["o"], nk(),
                                             jnp.float32(1.0))
            return ls

        drain_time(once_full, "full")

    if "train_only" in want:
        rng0 = np.random.default_rng(0)
        batch = (jnp.asarray(rng0.uniform(-1, 1, (B, cfg.fs))
                             .astype(np.float32)),
                 jnp.asarray(rng0.uniform(-1, 1, (B, cfg.fs))
                             .astype(np.float32)),
                 jnp.asarray(rng0.uniform(-1, 1, (B, 100))
                             .astype(np.float32)),
                 jnp.asarray(np.tile(
                     np.eye(7, dtype=np.float32)[2][None],
                     (B, 8)).reshape(B, 56)))

        @functools.partial(jax.jit, donate_argnums=(1, 2))
        def scan_tr(b, p, o, rng, lr):
            def body(carry, k):
                p, o = carry
                _, k_step = jax.random.split(k)
                p, o, m = _train_step_core(loss_impl, cfg, hp, opt, 200,
                                           p, o, b, k_step, lr)
                return (p, o), m["loss"]
            keys = jax.random.split(rng, C)
            (p, o), losses = jax.lax.scan(body, (p, o), keys)
            return p, o, losses

        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

        def once_tr():
            st["p"], st["o"], ls = scan_tr(batch, st["p"], st["o"], nk(),
                                           jnp.float32(1.0))
            return ls

        drain_time(once_tr, "train_only")


if __name__ == "__main__":
    main()

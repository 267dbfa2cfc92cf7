#!/usr/bin/env python
"""Probe: why is the fused chunk slow? Times chunk variants at batch B:
  A  chunk with the production batch_fn (fast path incl. Pallas gather)
  B  chunk with XLA-gather windows (BIEAR_WINGATHER=xla equivalent)
  C  chunk with a frozen batch (no synthesis at all) — train-only scan
  D  one-step chunk (scan of 1) with production batch_fn
Optionally dumps a profiler trace of variant A (--trace DIR).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, steps, windows=3):
    import jax
    out = fn()
    jax.block_until_ready(out)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        jax.block_until_ready(out)
        rates.append(steps / (time.perf_counter() - t0))
    return 1000.0 / statistics.median(rates)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--trace", default=None)
    ap.add_argument("--variants", default="ABCD")
    args = ap.parse_args()
    B, C = args.batch, args.chunk

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.train import TrainHyper, make_optimizer, make_train_step
    from biear_tpu.train.loop import make_train_chunk
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0)
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)

    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(256)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                num_lags=cfg.n_bands)
    print(f"fast={synth._fast} L={synth.ir_len} n_q={synth._n_q}",
          file=sys.stderr)

    key_holder = {"k": jax.random.PRNGKey(0)}

    def nk():
        key_holder["k"], k = jax.random.split(key_holder["k"])
        return k

    def run_variant(name, batch_fn, csteps, bank=None):
        chunk = make_train_chunk(cfg, hp, opt, "active", batch_fn, csteps)
        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}
        bk = synth.bank if bank is None else bank

        def once():
            st["p"], st["o"], ms = chunk(bk, st["p"], st["o"], nk(),
                                         jnp.float32(1.0))
            return ms["loss"]

        ms = timeit(once, steps=4)
        print(f"{name}: {ms:8.2f} ms/chunk  {ms/csteps:8.2f} ms/step "
              f"({B*csteps/ms*1000:.0f} utt/s)", flush=True)
        return once

    if "A" in args.variants:
        once_a = run_variant("A prod-fastpath", synth.batch_fn(B), C)
        if args.trace:
            with jax.profiler.trace(args.trace):
                once_a()
                jax.block_until_ready(once_a())
            print(f"trace -> {args.trace}")

    if "B" in args.variants:
        os.environ["BIEAR_WINGATHER"] = "xla"
        import biear_tpu.ops.window_gather as wg

        orig = wg.gather_windows

        def xla_gw(pool3, rows, offs, use_kernel=None):
            return orig(pool3, rows, offs, use_kernel=False)

        wg.gather_windows = xla_gw
        # rebuild synth trace: new jit wrapper object
        synth2 = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                     num_lags=cfg.n_bands)
        run_variant("B xla-gather  ", synth2.batch_fn(B), C, bank=synth2.bank)
        wg.gather_windows = orig

    if "C" in args.variants:
        rng = np.random.default_rng(0)
        wavL = jnp.asarray(rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32))
        wavR = jnp.asarray(rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32))
        x3 = jnp.asarray(rng.uniform(-1, 1, (B, 100)).astype(np.float32))
        y = np.zeros((B, 8, 7), np.float32)
        y[:, :, 2] = 1.0
        y = jnp.asarray(y.reshape(B, 56))
        batch = (wavL, wavR, x3, y)
        run_variant("C frozen-batch", lambda bk, k: batch, C)

    if "D" in args.variants:
        run_variant("D chunk=1     ", synth.batch_fn(B), 1)

    if set("EFGHIJ") & set(args.variants):
        rng = np.random.default_rng(0)
        wavL = jnp.asarray(rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32))
        wavR = jnp.asarray(rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32))
        x3 = jnp.asarray(rng.uniform(-1, 1, (B, 100)).astype(np.float32))
        y = np.zeros((B, 8, 7), np.float32)
        y[:, :, 2] = 1.0
        y = jnp.asarray(y.reshape(B, 56))
        batch = (wavL, wavR, x3, y)

    if "E" in args.variants:
        # frozen batch, NO histograms
        chunk = make_train_chunk(cfg, hp, opt, "active", lambda bk, k: batch,
                                 C, max_param_log=0)
        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

        def once_e():
            st["p"], st["o"], ms = chunk(synth.bank, st["p"], st["o"],
                                         nk(), jnp.float32(1.0))
            return ms["loss"]

        ms = timeit(once_e, steps=4)
        print(f"E frozen nohist: {ms:8.2f} ms/chunk {ms/C:8.2f} ms/step")

    if "F" in args.variants:
        # frozen batch, f32-accumulate histograms
        import biear_tpu.train.loop as lp
        orig_gh = lp._grad_histograms

        def f32_gh(grads, max_leaves):
            edges = jnp.asarray(lp.GRAD_HIST_EDGES)
            rows = []
            for _, g in jax.tree_util.tree_leaves_with_path(
                    grads)[:max_leaves]:
                a = jnp.abs(g).reshape(-1)
                gt = jnp.sum(a[None, :] > edges[:, None], axis=1,
                             dtype=jnp.float32)
                n = jnp.float32(a.shape[0])
                rows.append(jnp.concatenate([
                    (n - gt[0])[None], gt[:-1] - gt[1:], gt[-1][None]]))
            return jnp.stack(rows).astype(jnp.float32)

        lp._grad_histograms = f32_gh
        chunk = make_train_chunk(cfg, hp, opt, "active", lambda bk, k: batch, C)
        lp._grad_histograms = orig_gh
        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

        def once_f():
            st["p"], st["o"], ms = chunk(synth.bank, st["p"], st["o"],
                                         nk(), jnp.float32(1.0))
            return ms["loss"]

        ms = timeit(once_f, steps=4)
        print(f"F frozen f32hist:{ms:8.2f} ms/chunk {ms/C:8.2f} ms/step")

    if "G" in args.variants:
        # no-scan single step, same wrapper shape as the chunk (donation,
        # metrics dict), frozen batch
        from biear_tpu.train.loop import _train_step_core, _loss_fn
        import functools as ft
        loss_impl = _loss_fn("active")

        @ft.partial(jax.jit, donate_argnums=(0, 1))
        def one_noscan(p, o, rng, lr):
            k_synth, k_step = jax.random.split(rng)
            return _train_step_core(loss_impl, cfg, hp, opt, 200,
                                    p, o, batch, k_step, lr)

        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

        def once_g():
            st["p"], st["o"], m = one_noscan(st["p"], st["o"], nk(),
                                             jnp.float32(1.0))
            return m["loss"]

        ms = timeit(once_g, steps=8)
        print(f"G noscan step:   {ms:8.2f} ms/step")

    if "H" in args.variants:
        # scan of 1 with frozen batch (isolate scan vs synth)
        chunk = make_train_chunk(cfg, hp, opt, "active", lambda bk, k: batch, 1)
        st = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

        def once_h():
            st["p"], st["o"], m = chunk(synth.bank, st["p"], st["o"],
                                        nk(), jnp.float32(1.0))
            return m["loss"]

        ms = timeit(once_h, steps=8)
        print(f"H scan1 frozen:  {ms:8.2f} ms/step")

    if "I" in args.variants:
        # scan of 16 over a TRIVIAL body (param increment) — pure scan cost
        @jax.jit
        def triv(p, rng):
            def body(c, k):
                return jax.tree.map(lambda x: x + 1e-6, c), jnp.float32(0)
            keys = jax.random.split(rng, C)
            c, ys = jax.lax.scan(body, p, keys)
            return c["body"]["l1"]["w"][0, 0], ys

        def once_i():
            return triv(params, nk())[0]

        ms = timeit(once_i, steps=8)
        print(f"I trivial scan16:{ms:8.2f} ms/chunk {ms/C:8.2f} ms/step")

    if "J" in args.variants:
        # G but with batch as ARGUMENT (vs captured constant), K-sweep
        from biear_tpu.train.loop import _train_step_core, _loss_fn
        import functools as ft
        loss_impl = _loss_fn("active")

        @ft.partial(jax.jit, donate_argnums=(0, 1))
        def one_arg(p, o, b, rng, lr):
            k_synth, k_step = jax.random.split(rng)
            return _train_step_core(loss_impl, cfg, hp, opt, 200,
                                    p, o, b, k_step, lr)

        @ft.partial(jax.jit, donate_argnums=(0, 1))
        def one_cap(p, o, rng, lr):
            k_synth, k_step = jax.random.split(rng)
            return _train_step_core(loss_impl, cfg, hp, opt, 200,
                                    p, o, batch, k_step, lr)

        for name, call in [("arg", lambda st, k: one_arg(
                st["p"], st["o"], batch, k, jnp.float32(1.0))),
                           ("cap", lambda st, k: one_cap(
                st["p"], st["o"], k, jnp.float32(1.0)))]:
            st = {"p": jax.tree.map(jnp.copy, params),
                  "o": jax.tree.map(jnp.copy, opt_state)}

            def once():
                st["p"], st["o"], m = call(st, nk())
                return m["loss"]

            once()  # compile
            jax.block_until_ready(once())
            for K in (1, 4, 16):
                t0 = time.perf_counter()
                for _ in range(K):
                    out = once()
                jax.block_until_ready(out)
                dt = (time.perf_counter() - t0) * 1000
                print(f"J {name} K={K:<3d} {dt:9.2f} ms total "
                      f"{dt/K:8.2f} ms/step", flush=True)


if __name__ == "__main__":
    main()

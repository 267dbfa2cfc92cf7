#!/usr/bin/env python
"""Where the time goes: component-level timing of the production training
pipeline at a given batch size (default: bench.py's operating point).

Times, each as median of --windows x --steps dispatches on the default
device:
  synth      on-device batch synthesis + CC feature (the data pipeline)
  fwd        flagship forward (eval mode)
  fwd_bwd    forward + BPTT gradients
  train      full train step (fwd + BPTT + Adam + telemetry)
  chunk      fused synthesize->train lax.scan step, amortised per step

Prints one JSON line per row plus a stderr summary. Used by RESULTS.md's
where-the-time-goes table (round-1 VERDICT weak item 2).
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


def _timeit(fn, steps: int, windows: int):
    import jax
    out = fn()                       # compile + warmup
    jax.block_until_ready(out)
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        jax.block_until_ready(out)
        rates.append(steps / (time.perf_counter() - t0))
    return statistics.median(rates)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=16)
    args = ap.parse_args()
    B = args.batch

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig, active_forward
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
    train_step = make_train_step(cfg, hp, opt, "active")

    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(256)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                num_lags=cfg.n_bands)

    rng = np.random.default_rng(0)
    wavL = jnp.asarray(rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32))
    wavR = jnp.asarray(rng.uniform(-1, 1, (B, cfg.fs)).astype(np.float32))
    x3 = jnp.asarray(rng.uniform(-1, 1, (B, 100)).astype(np.float32))
    y = np.zeros((B, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    y[:, 0, :3] = (1.0, 0.5, 0.0)
    y[:, 0, 3] = 1.0
    y = jnp.asarray(y.reshape(B, 56))
    batch = (wavL, wavR, x3, y)

    key_holder = {"k": jax.random.PRNGKey(0)}

    def nk():
        key_holder["k"], k = jax.random.split(key_holder["k"])
        return k

    rows = {}

    # synth: one jitted batch synthesis dispatch
    rows["synth"] = _timeit(
        lambda: synth.sample_batch(nk(), B)[0], args.steps, args.windows)

    # fwd (eval mode)
    @jax.jit
    def fwd(p, b):
        s, a, d, _ = active_forward(p, cfg, b[0], b[1], b[2], train=False)
        return s

    rows["fwd"] = _timeit(lambda: fwd(params, batch),
                          args.steps, args.windows)

    # fwd + BPTT
    @jax.jit
    def fwd_bwd(p, b, k):
        def lf(p):
            s, a, d, aux = active_forward(p, cfg, b[0], b[1], b[2],
                                          rng=k, train=True)
            return jnp.sum(s) + jnp.sum(a) + jnp.sum(d)
        return jax.grad(lf)(p)["body"]["l1"]["w"]

    rows["fwd_bwd"] = _timeit(lambda: fwd_bwd(params, batch, nk()),
                              args.steps, args.windows)

    # full train step (non-donated copies so the originals survive)
    state = {"p": jax.tree.map(jnp.copy, params),
             "o": jax.tree.map(jnp.copy, opt_state)}

    def step_once():
        state["p"], state["o"], m = train_step(
            state["p"], state["o"], batch, nk(), jnp.float32(1.0))
        return m["loss"]

    rows["train"] = _timeit(step_once, args.steps, args.windows)

    # fused synthesize->train chunk, amortised per inner step
    chunk = make_train_chunk(cfg, hp, opt, "active",
                             synth.batch_fn(B), args.chunk)
    cstate = {"p": jax.tree.map(jnp.copy, params),
              "o": jax.tree.map(jnp.copy, opt_state)}

    def chunk_once():
        cstate["p"], cstate["o"], ms = chunk(
            synth.bank, cstate["p"], cstate["o"], nk(), jnp.float32(1.0))
        return ms["loss"]

    chunk_rate = _timeit(chunk_once, max(args.steps // 4, 2), args.windows)
    rows["chunk_per_step"] = chunk_rate * args.chunk

    print(f"{'component':>14} {'disp/s':>10} {'ms/disp':>9} "
          f"{'utt/s':>12}", file=sys.stderr)
    for name, rate in rows.items():
        print(json.dumps({"component": name, "batch": B,
                          "dispatch_per_sec": round(rate, 2),
                          "ms": round(1000.0 / rate, 3),
                          "utt_per_sec": round(rate * B, 1)}))
        print(f"{name:>14} {rate:>10.2f} {1000.0/rate:>9.3f} "
              f"{rate*B:>12.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()

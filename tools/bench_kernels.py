#!/usr/bin/env python
"""Kernel-ladder benchmark: full train-step throughput per Pallas mode.

Measures utterances/sec of the flagship dual-controller adaptive-Q train
step (fwd + BPTT + Adam) for each BIEAR_USE_PALLAS rung (off / v1 / fb2 /
step) at batch 64 / 256 / 1024 on the default device, plus eval-mode
(inference) throughput. This is the measurement the VERDICT asked for:
the kernel either beats XLA at the production operating point and becomes
the default, or the number recording its loss is kept here.

Usage:  python tools/bench_kernels.py [--modes off,fb2,step]
        [--batches 64,256,1024] [--steps 10] [--windows 3] [--tile-b 32]
Writes one JSON line per (mode, batch) to stdout and a summary table to
stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(mode: str, batch: int, steps: int, windows: int, tile_b: int,
            eval_only: bool = False) -> dict:
    os.environ["BIEAR_USE_PALLAS"] = mode
    os.environ["BIEAR_PALLAS_TILE_B"] = str(tile_b)

    import jax
    import jax.numpy as jnp
    import numpy as np

    import biear_tpu.models.frontend as fe
    fe._fused_fb_apply.cache_clear()

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.train import TrainHyper, make_optimizer, make_train_step
    from biear_tpu.train.loop import make_eval_step

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0)
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)
    step = make_train_step(cfg, hp, opt, "active")
    estep = make_eval_step(cfg, hp, "active")

    rng = np.random.default_rng(0)
    wavL = jnp.asarray(rng.uniform(-1, 1, (batch, cfg.fs)).astype(np.float32))
    wavR = jnp.asarray(rng.uniform(-1, 1, (batch, cfg.fs)).astype(np.float32))
    x3 = jnp.asarray(rng.uniform(-1, 1, (batch, 100)).astype(np.float32))
    y = np.zeros((batch, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    y[:, 0, :3] = (1.0, 0.5, 0.0)
    y[:, 0, 3] = 1.0
    y = jnp.asarray(y.reshape(batch, 56))
    b = (wavL, wavR, x3, y)

    key = jax.random.PRNGKey(0)
    out = {"mode": mode, "batch": batch, "tile_b": tile_b}

    if not eval_only:
        t0 = time.perf_counter()
        key, k = jax.random.split(key)
        params, opt_state, m = step(params, opt_state, b, k,
                                    jnp.float32(1.0))
        jax.block_until_ready(m["loss"])
        out["compile_s"] = round(time.perf_counter() - t0, 1)

        rates = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(steps):
                key, k = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, b, k,
                                            jnp.float32(1.0))
            jax.block_until_ready(m["loss"])
            rates.append(batch * steps / (time.perf_counter() - t0))
        out["train_utt_s"] = round(statistics.median(rates), 1)
        out["train_best"] = round(max(rates), 1)

    m = estep(params, b)
    jax.block_until_ready(m["loss"])
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            m = estep(params, b)
        jax.block_until_ready(m["loss"])
        rates.append(batch * steps / (time.perf_counter() - t0))
    out["eval_utt_s"] = round(statistics.median(rates), 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="off,v1,fb2,step")
    ap.add_argument("--batches", default="64,256,1024")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--tile-b", type=int, default=32)
    ap.add_argument("--eval-only", action="store_true")
    args = ap.parse_args()

    results = []
    for mode in args.modes.split(","):
        for batch in (int(x) for x in args.batches.split(",")):
            try:
                r = measure(mode, batch, args.steps, args.windows,
                            args.tile_b, eval_only=args.eval_only)
            except Exception as e:
                # a kernel that fails to compile at this point (e.g. VMEM
                # OOM) is a valid ladder measurement: record it and keep
                # sweeping the remaining rungs
                r = {"mode": mode, "batch": batch, "tile_b": args.tile_b,
                     "error": str(e).split("\n")[0][:300]}
            print(json.dumps(r), flush=True)
            results.append(r)

    hdr = f"{'mode':>6} {'batch':>6} {'train utt/s':>12} {'eval utt/s':>11}"
    print("\n" + hdr, file=sys.stderr)
    for r in results:
        print(f"{r['mode']:>6} {r['batch']:>6} "
              f"{r.get('train_utt_s', float('nan')):>12} "
              f"{r.get('eval_utt_s', float('nan')):>11}"
              f"{'  ' + r['error'] if 'error' in r else ''}",
              file=sys.stderr)


if __name__ == "__main__":
    main()

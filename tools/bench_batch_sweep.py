#!/usr/bin/env python
"""Ground-truth batch-size sweep for the train-step operating point.

docs/mfu_attribution.md's "Operating point" section argues batch 1024
stays because the hot fusions are already HBM-bound there (the round-2
suggestion to move to 2048 rested on dispatch-rate artifact numbers).
This tool substantiates that claim with data: it measures the bare model
step AND the fused synthesize->train chunk at several batch sizes with
the same device_get-synced methodology as bench.py, and writes one JSON
(docs/batch_sweep.json) with per-batch utt/s and ms/step.

Usage:
  python tools/bench_batch_sweep.py [--batches 256,512,1024,2048]
      [--out docs/batch_sweep.json] [--f32-parity]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 16
STEPS = 20
CHUNK_DISPATCHES = 3
WINDOWS = 3


def measure_batch(batch: int, fb_w_dtype: str,
                  mix_dtype: str = "bfloat16") -> dict:
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
                      deltaQ_high_factor=5.0, fb_w_dtype=fb_w_dtype)
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)
    step = make_train_step(cfg, hp, opt, "active")

    rng = np.random.default_rng(0)
    wavL = jnp.asarray(rng.uniform(-1, 1, (batch, cfg.fs)).astype(np.float32))
    wavR = jnp.asarray(rng.uniform(-1, 1, (batch, cfg.fs)).astype(np.float32))
    x3 = jnp.asarray(rng.uniform(-1, 1, (batch, 100)).astype(np.float32))
    y = np.zeros((batch, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    for b in range(batch):
        s = rng.integers(0, 8)
        y[b, s, :3] = (1.0, rng.uniform(), 0.0)
        y[b, s, 3 + rng.integers(0, 4)] = 1.0
    y = jnp.asarray(y.reshape(batch, 56))
    data = (wavL, wavR, x3, y)

    def sync(m):
        # device_get forces execution completion; block_until_ready does
        # not on this tunnel backend (bench.py module docstring)
        return jax.device_get(m["loss"] if isinstance(m, dict) else m)

    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    params_b, opt_state_b, m = step(params, opt_state, data, k,
                                    jnp.float32(1.0))
    sync(m)
    step_rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            params_b, opt_state_b, m = step(params_b, opt_state_b, data,
                                            k, jnp.float32(1.0))
        sync(m)
        step_rates.append(batch * STEPS / (time.perf_counter() - t0))
    del params_b, opt_state_b

    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(256)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                num_lags=cfg.n_bands, mix_dtype=mix_dtype)
    chunk = make_train_chunk(cfg, hp, opt, "active", synth.batch_fn(batch),
                             CHUNK)
    params2 = init_active(jax.random.PRNGKey(0), cfg)
    st = {"p": params2, "o": opt.init(params2)}
    kh = {"k": key}

    def chunk_once():
        kh["k"], k2 = jax.random.split(kh["k"])
        st["p"], st["o"], ms = chunk(synth.bank, st["p"], st["o"], k2,
                                     jnp.float32(1.0))
        return ms

    sync(chunk_once())
    fused_rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(CHUNK_DISPATCHES):
            ms = chunk_once()
        sync(ms)
        fused_rates.append(batch * CHUNK * CHUNK_DISPATCHES
                           / (time.perf_counter() - t0))

    step_med = statistics.median(step_rates)
    fused_med = statistics.median(fused_rates)
    return {
        "batch": batch,
        "step_utt_s": round(step_med, 1),
        "step_ms": round(1e3 * batch / step_med, 2),
        "step_windows": [round(r, 1) for r in step_rates],
        "fused_utt_s": round(fused_med, 1),
        "fused_step_ms": round(1e3 * batch / fused_med, 2),
        "fused_windows": [round(r, 1) for r in fused_rates],
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batches", default="256,512,1024,2048")
    ap.add_argument("--out", default="docs/batch_sweep.json")
    ap.add_argument("--f32-parity", action="store_true")
    args = ap.parse_args()

    fb_w_dtype = "float32" if args.f32_parity else "bfloat16"
    mix_dtype = "float32" if args.f32_parity else "bfloat16"
    rows = []
    for b in [int(x) for x in args.batches.split(",") if x]:
        r = measure_batch(b, fb_w_dtype, mix_dtype)
        print(json.dumps(r), file=sys.stderr)
        rows.append(r)

    import jax
    out = {
        "fb_w_dtype": fb_w_dtype,
        "synth_mix_dtype": mix_dtype,
        "device": getattr(jax.devices()[0], "device_kind",
                          str(jax.devices()[0])),
        "methodology": ("device_get-synced windows (median of "
                        f"{WINDOWS}); step: {STEPS} steps/window; fused: "
                        f"{CHUNK_DISPATCHES} x {CHUNK}-step chunks"),
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": args.out, "rows": len(rows)}))


if __name__ == "__main__":
    main()

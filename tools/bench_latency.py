#!/usr/bin/env python
"""Serving-latency benchmark: single-request inference latency of the
flagship active model (dual-controller adaptive-Q), the metric that
matters for deployment/serving (bench.py covers training throughput).

Two numbers per batch size, both device_get-synced (block_until_ready
does not sync on this image's tunnelled TPU — see bench.py):

  e2e_ms     p50/p95 wall time of one dispatch + result readback — what a
             caller of a naive RPC server sees. On this image it includes
             the tunnel round-trip (~hundreds of ms), so it upper-bounds
             any real deployment.
  device_ms  on-device compute per forward, RTT amortised away: K
             forwards chained into one dispatch via a numerically-inert
             data dependency (out[t] feeds 0*sum into in[t+1]), so XLA
             cannot overlap them; (T_chain - T_overhead) / K.

Usage: python tools/bench_latency.py [--batches 1,8,64] [--reps 15]
       [--chain 32] [--json docs/serving_latency.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8,64")
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--chain", type=int, default=32,
                    help="K >= 2: forwards per dispatch for the "
                         "RTT-amortised device_ms estimate")
    ap.add_argument("--json", default=None, metavar="PATH",
                    help="also write the result dict to PATH")
    ap.add_argument("--fb-w-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()
    if args.chain < 2:
        ap.error("--chain must be >= 2 (device_ms is the K-chain minus "
                 "1-chain difference divided by K-1)")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import active_forward, init_active

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0, fb_w_dtype=args.fb_w_dtype)
    params = init_active(jax.random.PRNGKey(0), cfg)
    dev = jax.devices()[0]
    out = {"device": str(dev), "fb_w_dtype": args.fb_w_dtype,
           "chain": args.chain, "reps": args.reps, "sync": "device_get",
           "batches": {}}

    @jax.jit
    def fwd(p, wavL, wavR, x3):
        s, a, d, _ = active_forward(p, cfg, wavL, wavR, x3, train=False)
        return s, a, d

    def chained(k: int):
        @jax.jit
        def run(p, wavL, wavR, x3):
            def body(wl, _):
                s, a, d, _ = active_forward(p, cfg, wl, wavR, x3,
                                            train=False)
                # numerically-inert serial dependency: 0 * a feed-through
                wl = wl + 0.0 * jnp.mean(a)
                return wl, (jnp.mean(s), jnp.mean(a))
            _, ys = jax.lax.scan(body, wavL, None, length=k)
            return ys
        return run

    rng = np.random.default_rng(0)
    for bs in [int(b) for b in args.batches.split(",")]:
        wavL = jnp.asarray(rng.uniform(-1, 1, (bs, cfg.fs)), jnp.float32)
        wavR = jnp.asarray(rng.uniform(-1, 1, (bs, cfg.fs)), jnp.float32)
        x3 = jnp.asarray(rng.uniform(-1, 1, (bs, 100)), jnp.float32)

        # ---- e2e: one dispatch + readback per request ----
        jax.device_get(fwd(params, wavL, wavR, x3))        # compile+warm
        e2e = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.device_get(fwd(params, wavL, wavR, x3))
            e2e.append((time.perf_counter() - t0) * 1e3)
        e2e.sort()

        # ---- device compute: K-chain minus 1-chain, per forward ----
        runk = chained(args.chain)
        run1 = chained(1)
        jax.device_get(runk(params, wavL, wavR, x3))       # compile+warm
        jax.device_get(run1(params, wavL, wavR, x3))
        tk = []
        t1 = []
        for _ in range(max(args.reps // 3, 3)):
            t0 = time.perf_counter()
            jax.device_get(runk(params, wavL, wavR, x3))
            tk.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.device_get(run1(params, wavL, wavR, x3))
            t1.append(time.perf_counter() - t0)
        dev_ms = (statistics.median(tk) - statistics.median(t1)) \
            / (args.chain - 1) * 1e3

        out["batches"][bs] = {
            "e2e_p50_ms": round(statistics.median(e2e), 2),
            "e2e_p95_ms": round(e2e[min(len(e2e) - 1,
                                        int(0.95 * len(e2e)))], 2),
            "device_ms_per_forward": round(dev_ms, 3),
            "device_utt_s": round(bs / (dev_ms / 1e3), 1),
        }
        print(f"[latency] bs={bs}: e2e p50 "
              f"{out['batches'][bs]['e2e_p50_ms']} ms, p95 "
              f"{out['batches'][bs]['e2e_p95_ms']} ms; device "
              f"{out['batches'][bs]['device_ms_per_forward']} ms/fwd "
              f"({out['batches'][bs]['device_utt_s']} utt/s)")

    print(json.dumps(out))
    if args.json:
        os.makedirs(os.path.dirname(args.json) or ".", exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

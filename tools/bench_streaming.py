#!/usr/bin/env python
"""Streaming-serving benchmark: per-hop stream_step latency and real-time
margin of the flagship active model (serve/streaming.py).

A real-time localisation deployment receives one hop of audio
(win/fs seconds, ~52.6 ms at the canonical 19-frame config) per stream
per tick and must advance every concurrent stream within that budget.
Two numbers per batch size (batch = concurrent streams):

  e2e_ms     p50/p95 wall time of dispatch + state readback of ONE
             stream_step — what a naive RPC loop sees. Includes this
             image's tunnel RTT, so it upper-bounds a real deployment.
  device_ms  on-device compute per step with RTT amortised away:
             lax.scan chains of K and 2K steps (the state dependency
             serialises them), device_ms = (T(2K) - T(K)) / K. All
             timing windows end with jax.device_get (block_until_ready
             returns at dispatch on this tunnel — see bench.py).

Derived: rt_factor = hop_duration / device_ms (how many times faster
than real time one chip advances that many streams) and
streams_per_chip = batch * rt_factor (steady-state concurrent-stream
capacity at full utilisation).

Usage: python tools/bench_streaming.py [--batches 1,8,64]
       [--reps 15] [--chain 16] [--json docs/serving_streaming.json]
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
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--json", default=None, metavar="PATH")
    ap.add_argument("--fb-w-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.serve import stream_init, stream_step, stream_plan

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0, fb_w_dtype=args.fb_w_dtype)
    params = init_active(jax.random.PRNGKey(0), cfg)
    plan = stream_plan(cfg)
    hop = plan["hop"]
    hop_ms = 1e3 * hop / cfg.fs
    dev = jax.devices()[0]
    print(f"device={dev.platform} hop={hop} samples ({hop_ms:.1f} ms) "
          f"fb_w_dtype={args.fb_w_dtype}", file=sys.stderr)

    step1 = jax.jit(stream_step, static_argnums=1)

    def chain_fn(k):
        del k  # chain length is carried by the chunk arrays' leading axis
        def run(params, state, chunksL, chunksR):
            def body(st, ch):
                return stream_step(params, cfg, st, ch[0], ch[1]), ()
            st, _ = jax.lax.scan(body, state, (chunksL, chunksR))
            return st
        return jax.jit(run)

    def sync(tree):
        jax.device_get(jax.tree.leaves(tree)[0])

    rows = []
    rng = np.random.default_rng(0)
    for bs in [int(b) for b in args.batches.split(",")]:
        state0 = stream_init(params, cfg, bs)
        cL = jnp.asarray(rng.standard_normal((bs, hop)), jnp.float32)
        cR = jnp.asarray(rng.standard_normal((bs, hop)), jnp.float32)

        # e2e: one step + readback
        st = step1(params, cfg, state0, cL, cR)
        sync(st)                                       # compile + warmup
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            st = step1(params, cfg, state0, cL, cR)
            sync(st)
            ts.append(1e3 * (time.perf_counter() - t0))
        e2e_p50 = statistics.median(ts)
        e2e_p95 = sorted(ts)[max(0, int(round(0.95 * len(ts))) - 1)]

        # device: difference of K-chain and 2K-chain scans. At small
        # batch the per-step compute is far below the tunnel RTT, so a
        # short chain's T(2K)-T(K) can be noise (even negative, which
        # once crashed this tool on int(inf)); double K until the delta
        # clears the measured RTT jitter, else report nulls.
        K, device_ms = args.chain, None
        while K <= 16 * args.chain:
            res = {}
            for k in (K, 2 * K):
                chL = jnp.asarray(rng.standard_normal((k, bs, hop)),
                                  jnp.float32)
                chR = jnp.asarray(rng.standard_normal((k, bs, hop)),
                                  jnp.float32)
                f = chain_fn(k)
                sync(f(params, state0, chL, chR))      # compile + warmup
                best = []
                for _ in range(max(5, args.reps // 2)):
                    t0 = time.perf_counter()
                    sync(f(params, state0, chL, chR))
                    best.append(time.perf_counter() - t0)
                res[k] = min(best)
            delta_ms = 1e3 * (res[2 * K] - res[K])
            jitter_ms = 1e3 * (max(best) - min(best))
            if delta_ms > max(2.0, jitter_ms):
                device_ms = delta_ms / K
                break
            print(f"  batch={bs}: K={K} delta {delta_ms:.2f} ms within "
                  f"jitter {jitter_ms:.2f} ms — doubling the chain",
                  file=sys.stderr)
            K *= 2
        rt = hop_ms / device_ms if device_ms else None
        row = {"batch": bs, "e2e_p50_ms": round(e2e_p50, 3),
               "e2e_p95_ms": round(e2e_p95, 3),
               "chain": K,
               "device_ms": round(device_ms, 4) if device_ms else None,
               "rt_factor": round(rt, 1) if rt else None,
               "streams_per_chip": int(bs * rt) if rt else None}
        rows.append(row)
        print(json.dumps(row), file=sys.stderr)

    out = {"metric": "streaming_step_device_ms",
           "hop_ms": round(hop_ms, 2),
           "fb_w_dtype": args.fb_w_dtype,
           "device": dev.platform,
           "note": ("device_ms = (T(2K)-T(K))/K over lax.scan step chains, "
                    "device_get-synced; e2e includes the axon tunnel RTT; "
                    "rt_factor = hop_ms / device_ms; streams_per_chip = "
                    "batch * rt_factor"),
           "rows": rows}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Streaming soak benchmark: sustained serving under stream CHURN.

bench_streaming.py measures steady-state hop latency with a fixed batch
of lockstep streams; a real deployment has streams joining and leaving
continuously. This tool drives the production churn path — per-slot
stream_reset (exactness-tested in tests/test_streaming.py) fused with
stream_step in ONE jitted hop — under a Poisson-like arrival process
(each active stream ends per hop with p = 1/mean_len, its slot
immediately re-seeded), and reports:

  e2e hop latency   p50 / p95 / p99 over a MINUTES-long run (one
                    dispatch + device_get per hop — the RPC view; this
                    image's tunnel RTT rides inside, so it upper-bounds
                    a colocated server).
  device ms/hop     chained lax.scan of K vs 2K churned hops,
                    (T(2K)-T(K))/K — pure device cost incl. the reset
                    selects, compared against the no-churn figure so the
                    churn overhead is measured, not assumed.
  capacity          streams/chip at real time under churn:
                    batch * hop_duration / device_ms.

Usage: python tools/bench_streaming_soak.py [--batch 64] [--hops 3000]
       [--mean-len 19] [--chain 32] [--json docs/serving_soak.json]
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--hops", type=int, default=3000)
    ap.add_argument("--mean-len", type=int, default=19,
                    help="mean stream length in hops (19 = 1 s utterances)")
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--json", default=None, metavar="PATH")
    ap.add_argument("--fb-w-dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.serve import (stream_init, stream_plan, stream_reset,
                                 stream_step)

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0, fb_w_dtype=args.fb_w_dtype)
    params = init_active(jax.random.PRNGKey(0), cfg)
    plan = stream_plan(cfg)
    hop = plan["hop"]
    B = args.batch
    hop_ms = hop / cfg.fs * 1e3

    @jax.jit
    def churn_hop(params, state, mask, chL, chR):
        state = stream_reset(params, cfg, state, mask)
        return stream_step(params, cfg, state, chL, chR)

    def chain_fn(n_hops):
        @jax.jit
        def run(params, state, masks, chL, chR):
            def body(st, xs):
                m, l, r = xs
                st = stream_reset(params, cfg, st, m)
                return stream_step(params, cfg, st, l, r), ()
            st, _ = jax.lax.scan(body, state, (masks, chL, chR))
            return st
        del n_hops
        return run

    def chain_nochurn():
        @jax.jit
        def run(params, state, chL, chR):
            def body(st, xs):
                return stream_step(params, cfg, st, xs[0], xs[1]), ()
            st, _ = jax.lax.scan(body, state, (chL, chR))
            return st
        return run

    rng = np.random.default_rng(0)
    p_end = 1.0 / args.mean_len

    def audio(n):
        return (jnp.asarray(rng.uniform(-1, 1, (n, B, hop)), jnp.float32),
                jnp.asarray(rng.uniform(-1, 1, (n, B, hop)), jnp.float32))

    def sync(state):
        jax.device_get(state["t"])

    # ---- e2e RPC-view soak ----
    state = stream_init(params, cfg, B)
    chL1, chR1 = audio(1)
    sync(churn_hop(params, state, jnp.zeros((B,), bool),
                   chL1[0], chR1[0]))                    # compile
    lat = []
    resets_total = 0
    t_soak0 = time.perf_counter()
    for i in range(args.hops):
        mask = rng.random(B) < p_end
        resets_total += int(mask.sum())
        mj = jnp.asarray(mask)
        cl, cr = audio(1)
        t0 = time.perf_counter()
        state = churn_hop(params, state, mj, cl[0], cr[0])
        sync(state)
        lat.append((time.perf_counter() - t0) * 1e3)
    soak_s = time.perf_counter() - t_soak0
    lat.sort()
    q = lambda p: lat[min(len(lat) - 1, int(p * len(lat)))]

    # ---- device-only cost via K vs 2K chains, churn and no-churn ----
    def chain_time(with_churn, n):
        st = stream_init(params, cfg, B)
        cl, cr = audio(n)
        if with_churn:
            masks = jnp.asarray(rng.random((n, B)) < p_end)
            f = chain_fn(n)
            sync(f(params, st, masks, cl, cr))           # compile
            t0 = time.perf_counter()
            sync(f(params, st, masks, cl, cr))
        else:
            f = chain_nochurn()
            sync(f(params, st, cl, cr))
            t0 = time.perf_counter()
            sync(f(params, st, cl, cr))
        return time.perf_counter() - t0

    def device_ms(with_churn):
        reps = 5
        t1 = statistics.median(chain_time(with_churn, args.chain)
                               for _ in range(reps))
        t2 = statistics.median(chain_time(with_churn, 2 * args.chain)
                               for _ in range(reps))
        return max(t2 - t1, 1e-9) / args.chain * 1e3

    dev_churn = device_ms(True)
    dev_plain = device_ms(False)

    out = {
        "what": ("streaming soak under churn: per-slot reset fused with "
                 "stream_step, geometric stream lengths"),
        "batch_streams": B,
        "hops": args.hops,
        "soak_duration_s": round(soak_s, 1),
        "mean_stream_len_hops": args.mean_len,
        "resets_total": resets_total,
        "churn_per_hop": round(resets_total / args.hops, 2),
        "hop_duration_ms": round(hop_ms, 2),
        "e2e_ms": {"p50": round(q(0.50), 3), "p95": round(q(0.95), 3),
                   "p99": round(q(0.99), 3), "max": round(lat[-1], 3)},
        "device_ms_per_hop_churn": round(dev_churn, 4),
        "device_ms_per_hop_nochurn": round(dev_plain, 4),
        "churn_overhead_pct": round(100 * (dev_churn / dev_plain - 1), 1),
        "rt_factor_churn": round(hop_ms / dev_churn, 1),
        "streams_per_chip_churn": int(B * hop_ms / dev_churn),
        "fb_w_dtype": args.fb_w_dtype,
        "sync": "device_get",
    }
    print(json.dumps(out, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

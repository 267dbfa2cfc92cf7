#!/usr/bin/env python
"""Benchmark: active-mode training throughput (utterances/sec/chip).

Prints ONE JSON line:
  {"metric": "active_train_utterances_per_sec", "value": N, "unit": "utt/s",
   "vs_baseline": R, "best": ..., "median": ..., "flops_per_utt": ...,
   "mfu": ..., "device": ...}

The metric is full training steps (fwd + BPTT + optimizer update, flagship
dual-controller adaptive-Q model) on the default JAX device, at this chip's
production operating point (batch 1024 with frontend remat; see the
RESULTS.md batch-scaling table). `value` is the MEDIAN of the timed
windows (the honest expectation through this image's flaky TPU tunnel);
`best` is the max (the hardware capability). flops_per_utt comes from the
compiled executable's own cost analysis (XLA's count, not a hand
estimate), and mfu = achieved FLOP/s / chip peak for the dtype the policy
actually runs (bf16-class MXU under the default matmul precision).

Baseline: the PyTorch reference publishes no numbers (BASELINE.md), so the
denominator is the reference implementation itself (its own batch-64
config), timed on this host (torch, CPU — the only device torch has here)
the first time bench runs and cached in BENCH_BASELINE.json.
vs_baseline = median / reference, both in utterances/sec/chip.

--trace DIR dumps a jax.profiler trace of one timed window for kernel-level
attribution (used by RESULTS.md's where-the-time-goes analysis).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BENCH_BASELINE.json")
BATCH = 1024   # per-chip production operating point (RESULTS.md scaling table)
STEPS = 20
WINDOWS = 5

# Peak dense matmul throughput per chip, bf16 inputs (the default-precision
# MXU mode), FLOP/s. Sources: public TPU spec sheets.
PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
    "TPU v6 lite": 918e12,
}


def _peak_for(device) -> float | None:
    kind = getattr(device, "device_kind", "") or ""
    for name, peak in PEAK_FLOPS.items():
        if kind.lower().startswith(name.lower()):
            return peak
    return None


def measure_ours(trace_dir: str | None = None) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.train import TrainHyper, make_optimizer, make_train_step

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0)
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)
    step = make_train_step(cfg, hp, opt, "active")

    rng = np.random.default_rng(0)
    wavL = jnp.asarray(rng.uniform(-1, 1, (BATCH, cfg.fs)).astype(np.float32))
    wavR = jnp.asarray(rng.uniform(-1, 1, (BATCH, cfg.fs)).astype(np.float32))
    x3 = jnp.asarray(rng.uniform(-1, 1, (BATCH, 100)).astype(np.float32))
    y = np.zeros((BATCH, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    for b in range(BATCH):
        s = rng.integers(0, 8)
        y[b, s, :3] = (1.0, rng.uniform(), 0.0)
        y[b, s, 3 + rng.integers(0, 4)] = 1.0
    y = jnp.asarray(y.reshape(BATCH, 56))
    batch = (wavL, wavR, x3, y)

    key = jax.random.PRNGKey(0)
    # ONE AOT compile serves execution AND cost analysis (a second
    # .lower().compile() would pay the full multi-minute tunnel compile
    # twice)
    key, k = jax.random.split(key)
    step = step.lower(params, opt_state, batch, k,
                      jnp.float32(1.0)).compile()

    # XLA's own FLOP count for the compiled step (per-executable; covers
    # fwd + BPTT + Adam). Not every backend reports it — null when absent.
    flops_per_step = None
    try:
        ca = step.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        if ca and ca.get("flops", 0) > 0:
            flops_per_step = float(ca["flops"])
    except Exception as e:                           # pragma: no cover
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    # warmup (first execution also smokes out runtime errors)
    params, opt_state, m = step(params, opt_state, batch, k, jnp.float32(1.0))
    jax.block_until_ready(m["loss"])

    rates = []
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            params, opt_state, m = step(params, opt_state, batch, k,
                                        jnp.float32(1.0))
        jax.block_until_ready(m["loss"])
        rates.append(BATCH * STEPS / (time.perf_counter() - t0))

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(4):
                key, k = jax.random.split(key)
                params, opt_state, m = step(params, opt_state, batch, k,
                                            jnp.float32(1.0))
            jax.block_until_ready(m["loss"])
        print(f"[bench] profiler trace written to {trace_dir}",
              file=sys.stderr)

    median = statistics.median(rates)
    dev = jax.devices()[0]
    peak = _peak_for(dev)
    out = {
        "median": median,
        "best": max(rates),
        "windows": [round(r, 1) for r in rates],
        "flops_per_utt": (flops_per_step / BATCH
                          if flops_per_step else None),
        "device": getattr(dev, "device_kind", str(dev)),
    }
    if flops_per_step and peak:
        # achieved FLOP/s = steps/s * flops/step; steps/s = median / BATCH
        out["mfu"] = round((median / BATCH) * flops_per_step / peak, 4)
        out["peak_flops_assumed"] = peak
    else:
        out["mfu"] = None
    return out


def measure_reference() -> float | None:
    """Time the PyTorch reference's train step (fwd+bwd+Adam) on this host.

    Returns utterances/sec, or None if the reference tree is unavailable."""
    ref_dir = "/root/reference"
    if not os.path.isdir(ref_dir):
        return None
    try:
        import torch
        sys.path.insert(0, ref_dir)
        import model_torch as ref

        torch.manual_seed(0)
        model = ref.build_model_active(
            use_cc=True, fixed_frontend_q=False, deltaQ_base=1.0,
            deltaQ_low_factor=0.3, deltaQ_high_factor=5.0,
            deltaQ_mode="relative")
        model.train()
        device = "cuda" if torch.cuda.is_available() else "cpu"
        model.to(device)
        opt = torch.optim.Adam(model.parameters(), lr=1e-4,
                               weight_decay=1e-5, eps=1e-7)
        bce = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.full((8,), 3.0, device=device))
        sl1 = torch.nn.SmoothL1Loss(beta=0.02)
        ce = torch.nn.CrossEntropyLoss()

        B = 64      # the reference's own batch size (conf/config.yaml:7)
        g = torch.Generator().manual_seed(0)
        wavL = torch.rand(B, 16000, generator=g) * 2 - 1
        wavR = torch.rand(B, 16000, generator=g) * 2 - 1
        x3 = torch.rand(B, 100, generator=g) * 2 - 1
        ys = (torch.rand(B, 8, generator=g) < 0.25).float()
        ya = torch.rand(B, 8, generator=g)
        yd = torch.randint(0, 5, (B * 8,), generator=g)
        wavL, wavR, x3 = (t.to(device) for t in (wavL, wavR, x3))
        ys, ya, yd = ys.to(device), ya.to(device), yd.to(device)

        def one_step():
            opt.zero_grad(set_to_none=True)
            s, a, d = model(wavL, wavR, x3)
            loss = (0.2 * bce(s, ys) + 0.45 * sl1(a, ya)
                    + 0.35 * ce(d.reshape(-1, 5), yd))
            loss.backward()
            opt.step()

        one_step()                                   # warmup
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            one_step()
        dt = time.perf_counter() - t0
        return B * n / dt
    except Exception as e:                           # pragma: no cover
        print(f"[bench] reference measurement failed: {e}", file=sys.stderr)
        return None
    finally:
        if ref_dir in sys.path:
            sys.path.remove(ref_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="dump a jax.profiler trace of one window")
    args = ap.parse_args()

    ours = measure_ours(trace_dir=args.trace)

    baseline = None
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f).get("reference_utterances_per_sec")
    if baseline is None:
        baseline = measure_reference()
        if baseline is not None:
            with open(BASELINE_CACHE, "w") as f:
                json.dump({
                    "reference_utterances_per_sec": baseline,
                    "note": "PyTorch reference train step (fwd+bwd+Adam), "
                            "batch 64, measured on this host's torch device",
                }, f, indent=2)

    vs = (ours["median"] / baseline) if baseline else None
    print(json.dumps({
        "metric": "active_train_utterances_per_sec",
        "value": round(ours["median"], 2),
        "unit": "utt/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "best": round(ours["best"], 2),
        "windows": ours["windows"],
        "flops_per_utt": (round(ours["flops_per_utt"])
                          if ours["flops_per_utt"] else None),
        "mfu": ours["mfu"],
        "device": ours["device"],
        "batch": BATCH,
    }))


if __name__ == "__main__":
    main()

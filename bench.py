#!/usr/bin/env python
"""Benchmark: active-mode training throughput (utterances/sec/chip).

Prints ONE JSON line:
  {"metric": "fused_train_pipeline_utterances_per_sec", "value": N,
   "unit": "utt/s", "vs_baseline": R, "model_step_utt_s": ...,
   "flops_per_utt": ..., "mfu": ..., "device": ..., "baseline_device": ...}

The HEADLINE metric is the production training pipeline: the fused
on-device synthesize->train chunk (scene sampling + HRIR mixing + CC
feature + fwd + BPTT + Adam, flagship dual-controller adaptive-Q model)
at batch 512 — what a user actually gets per chip-second of training.
(Operating point measured, not guessed: tools/bench_batch_sweep.py →
docs/batch_sweep.json; 512 runs the bare step at its saturation rate
with the fused pipeline tied with the batch-256 peak.)
`model_step_utt_s` reports the bare train step on a fixed in-HBM batch
(the round-1/2 headline) for continuity.

Measurement methodology (round 3): on this image's tunnelled TPU,
`jax.block_until_ready` returns before execution completes, so timing
windows that end with it measure DISPATCH rate, not compute — the fused
step "measured" 0.18 ms that way vs a true 126 ms. Every timed window
here therefore ends with a `jax.device_get` (a data transfer, which does
force completion), and linear scaling over window length was verified
when the method was established (tools/bench_scan_bisect.py).

flops_per_utt comes from the compiled executable's own cost analysis
(XLA's count, not a hand estimate); mfu = achieved FLOP/s / chip peak for
the dtype the policy actually runs (bf16-class MXU under the default
matmul precision).

Baseline: the PyTorch reference publishes no numbers (BASELINE.md), so
the denominator is the reference implementation itself (its own batch-64
config), timed on this host over >=20 steps with warmup discard — torch
has only the CPU here, which the JSON self-describes via
"baseline_device" (a cross-device comparison: one v5e chip vs one host
CPU; the reference's dev GPU is not available for a like-for-like run).

--trace DIR dumps a jax.profiler trace of one timed window for
kernel-level attribution.
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
BATCH = 512    # per-chip production operating point (docs/batch_sweep.json)
CHUNK = 16     # fused-chunk scan length (production SYNTH_CHUNK_STEPS)
STEPS = 20     # model-step window length
CHUNK_DISPATCHES = 3   # fused windows: 3 dispatches x CHUNK steps
WINDOWS = 3

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


def measure_ours(trace_dir: str | None = None,
                 fb_w_dtype: str = "bfloat16",
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

    # fb_w_dtype="bfloat16" is the production policy: numerically the
    # DEFAULT TPU matmul precision (operands bf16-rounded either way; the
    # round-2 protocol ran the same numerics class) at ~3.6x lower cost on
    # the HBM-bound W contraction (ops/filterbank.py). "float32" is the
    # HIGHEST-precision parity surface (--f32-parity).
    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0, fb_w_dtype=fb_w_dtype)
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

    def sync(m):
        # device_get forces execution completion (block_until_ready does
        # not, on this tunnel backend — see module docstring)
        return jax.device_get(m["loss"] if isinstance(m, dict) else m)

    # ---- bare model step (fixed in-HBM batch) ----
    params_b, opt_state_b, m = step(params, opt_state, batch, k,
                                    jnp.float32(1.0))
    sync(m)                                          # warmup
    step_rates = []
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, k = jax.random.split(key)
            params_b, opt_state_b, m = step(params_b, opt_state_b, batch,
                                            k, jnp.float32(1.0))
        sync(m)
        step_rates.append(BATCH * STEPS / (time.perf_counter() - t0))

    if trace_dir:
        with jax.profiler.trace(trace_dir):
            for _ in range(4):
                key, k = jax.random.split(key)
                params_b, opt_state_b, m = step(params_b, opt_state_b,
                                                batch, k, jnp.float32(1.0))
            sync(m)
        print(f"[bench] profiler trace written to {trace_dir}",
              file=sys.stderr)
    del params_b, opt_state_b

    # ---- fused synthesize->train pipeline (production path) ----
    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(256)
    # mix_dtype="bfloat16" is the production synthesis policy (bf16
    # operands on the block-Toeplitz HRIR mix, f32 accumulation): measured
    # -16% on the synthesis chain at batch 512 (data/synth.py::_mix_fast).
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                num_lags=cfg.n_bands, mix_dtype=mix_dtype)
    chunk = make_train_chunk(cfg, hp, opt, "active", synth.batch_fn(BATCH),
                             CHUNK)
    # fresh state: the bare-step phase DONATED params/opt_state (its jit
    # buffers), so the originals are deleted by now
    params2 = init_active(jax.random.PRNGKey(0), cfg)
    st = {"p": params2, "o": opt.init(params2)}

    def chunk_once():
        key2, k2 = jax.random.split(kh["k"])
        kh["k"] = key2
        st["p"], st["o"], ms = chunk(synth.bank, st["p"], st["o"], k2,
                                     jnp.float32(1.0))
        return ms

    kh = {"k": key}
    sync(chunk_once())                               # compile + warmup
    fused_rates = []
    for w in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(CHUNK_DISPATCHES):
            ms = chunk_once()
        sync(ms)
        fused_rates.append(BATCH * CHUNK * CHUNK_DISPATCHES
                           / (time.perf_counter() - t0))

    fused_median = statistics.median(fused_rates)
    step_median = statistics.median(step_rates)
    dev = jax.devices()[0]
    peak = _peak_for(dev)
    out = {
        "fused_median": fused_median,
        "fused_best": max(fused_rates),
        "fused_windows": [round(r, 1) for r in fused_rates],
        "step_median": step_median,
        "step_best": max(step_rates),
        "step_windows": [round(r, 1) for r in step_rates],
        "flops_per_utt": (flops_per_step / BATCH
                          if flops_per_step else None),
        "device": getattr(dev, "device_kind", str(dev)),
    }
    if flops_per_step and peak:
        # achieved FLOP/s on the bare model step
        out["mfu"] = round((step_median / BATCH) * flops_per_step / peak, 4)
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

        for _ in range(2):                           # warmup discard
            one_step()
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            one_step()
        dt = time.perf_counter() - t0
        return B * n / dt, device
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
    ap.add_argument("--f32-parity", action="store_true",
                    help="measure the float32/HIGHEST parity surface "
                         "instead of the production bf16-W policy")
    args = ap.parse_args()

    fb_w = "float32" if args.f32_parity else "bfloat16"
    mix = "float32" if args.f32_parity else "bfloat16"
    ours = measure_ours(trace_dir=args.trace, fb_w_dtype=fb_w,
                        mix_dtype=mix)

    baseline = baseline_dev = None
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        baseline = cached.get("reference_utterances_per_sec")
        baseline_dev = cached.get("baseline_device")
    if baseline is None:
        ref = measure_reference()
        if ref is not None:
            baseline, baseline_dev = ref
            with open(BASELINE_CACHE, "w") as f:
                json.dump({
                    "reference_utterances_per_sec": baseline,
                    "baseline_device": baseline_dev,
                    "note": "PyTorch reference train step (fwd+bwd+Adam), "
                            "batch 64, 20 steps after 2-step warmup, on "
                            "this host's torch device (CPU-only image: "
                            "cross-device comparison, flagged via "
                            "baseline_device)",
                }, f, indent=2)

    vs = (ours["fused_median"] / baseline) if baseline else None
    print(json.dumps({
        "metric": "fused_train_pipeline_utterances_per_sec",
        "value": round(ours["fused_median"], 2),
        "unit": "utt/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "best": round(ours["fused_best"], 2),
        "windows": ours["fused_windows"],
        "model_step_utt_s": round(ours["step_median"], 2),
        "model_step_windows": ours["step_windows"],
        "flops_per_utt": (round(ours["flops_per_utt"])
                          if ours["flops_per_utt"] else None),
        "mfu": ours["mfu"],
        "device": ours["device"],
        "baseline_device": baseline_dev,
        "batch": BATCH,
        "fb_w_dtype": fb_w,
        "synth_mix_dtype": mix,
        "sync": "device_get",
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Break down the fused-pipeline vs bare-step gap, ms by ms (round-5 item 3).

BENCH_r04: fused synthesize->train 44.9k utt/s vs bare model step 52.6k —
a 15 % gap attributed to "on-device synthesis + input" but never measured
at the operating point. This tool compiles the SHIPPED fused chunk
(make_train_chunk: CHUNK scan iterations of synthesize->step per
dispatch), dumps its optimized HLO, traces one dispatch, and attributes
every leaf op to SYNTHESIS (data/synth.py + ops/window_gather.py +
ops/xcorr.py source metadata) vs MODEL STEP (everything else), so the gap
decomposes into:

    fused wall/step = busy_synth + busy_model + dispatch_gap/CHUNK

Usage:
  python tools/trace_fused_breakdown.py --out docs/fused_breakdown.json
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

BATCH = 512
CHUNK = 16

SYNTH_FILES = ("synth.py", "synth_reverb.py", "window_gather.py",
               "xcorr.py", "speech.py", "labels.py")


def build_chunk():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.train import TrainHyper, make_optimizer
    from biear_tpu.train.loop import make_train_chunk
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0, fb_w_dtype="bfloat16")
    hp = TrainHyper()
    params = init_active(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(params, hp)
    opt_state = opt.init(params)

    ir, az, dist = make_test_hrir_bank()
    segs = make_test_segments(256)
    synth = AnechoicSynthesizer(ir, az, dist, segs, fs=cfg.fs,
                                num_lags=cfg.n_bands,
                                mix_dtype="bfloat16")
    chunk = make_train_chunk(cfg, hp, opt, "active", synth.batch_fn(BATCH),
                             CHUNK)
    key = jax.random.PRNGKey(0)
    compiled = chunk.lower(synth.bank, params, opt_state, key,
                           jnp.float32(1.0)).compile()
    return compiled, synth, params, opt_state, key


_METADATA = re.compile(r'metadata=\{([^}]*)\}')
_SOURCE = re.compile(r'source_file="([^"]*)"')


def fusion_sources(hlo_text: str):
    """fusion/computation name -> set of source basenames of its
    instructions (from HLO metadata)."""
    comp_srcs: dict[str, set] = {}
    fusion_to_comp: dict[str, str] = {}
    cur = None
    hdr = re.compile(r"^(%?[\w\.\-]+) \(.*\) -> .* \{$")
    fcall = re.compile(r"%?([\w\.\-]+) = .*? fusion\(.*calls=%?([\w\.\-]+)")
    for line in hlo_text.splitlines():
        s = line.strip()
        m = hdr.match(s)
        if m:
            cur = m.group(1).lstrip("%")
            comp_srcs[cur] = set()
            continue
        if s == "}":
            cur = None
            continue
        fm = fcall.search(s)
        if fm:
            fusion_to_comp[fm.group(1)] = fm.group(2).lstrip("%")
        md = _METADATA.search(s)
        if cur is not None and md:
            sm = _SOURCE.search(md.group(1))
            if sm:
                comp_srcs[cur].add(os.path.basename(sm.group(1)))
        # top-level (entry/while-body) instructions: attribute by own name
        if cur is None and md:
            sm = _SOURCE.search(md.group(1))
            if sm and "=" in s:
                name = s.split("=")[0].strip().lstrip("%")
                comp_srcs.setdefault(f"@{name}", set()).add(
                    os.path.basename(sm.group(1)))
    return fusion_to_comp, comp_srcs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/fused_breakdown.json")
    ap.add_argument("--trace-dir", default="/tmp/trace_fused")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("[fused_breakdown] compiling chunk...", file=sys.stderr)
    compiled, synth, params, opt_state, key = build_chunk()
    hlo = compiled.as_text()
    fusion_to_comp, comp_srcs = fusion_sources(hlo)

    # make_train_chunk's jit DONATES (params, opt_state): every call
    # consumes its state buffers, so thread the outputs back in (reusing
    # the originals surfaces as an opaque axon InvalidArgument on call 2)
    st = {"p": params, "o": opt_state}

    def run_once(k):
        st["p"], st["o"], ms = compiled(synth.bank, st["p"], st["o"], k,
                                        jnp.float32(1.0))
        return ms

    key, k = jax.random.split(key)
    ms = run_once(k)
    jax.device_get(ms["loss"])                        # warmup

    # measured wall for 1 chunk dispatch (dispatch gap shows up here)
    key, k = jax.random.split(key)
    t0 = time.perf_counter()
    ms = run_once(k)
    jax.device_get(ms["loss"])
    wall_s = time.perf_counter() - t0

    key, k = jax.random.split(key)
    with jax.profiler.trace(args.trace_dir):
        ms = run_once(k)
        jax.device_get(ms["loss"])

    from trace_attribution import load_trace, device_pid, leaf_events
    events = load_trace(args.trace_dir)
    pid = device_pid(events)
    leaves = leaf_events(events, pid)

    buckets = collections.Counter()
    unattributed = collections.Counter()
    for e in leaves:
        base = e["name"].split(" ")[0]
        # Pallas custom calls carry no HLO source metadata; both live in
        # ops/window_gather.py and run only on the synthesis side of the
        # fused chunk (scene gather+mix, CC-lag extraction of x3)
        if base.startswith(("_gather_mix_pallas", "_cc_pallas")):
            buckets["synthesis"] += e["dur"]
            continue
        # boundary copies (copy/copy-done): scan-carry + donation +
        # synth->step handoff traffic — kept as their own bucket rather
        # than guessed onto either side
        if base.split(".")[0] in ("copy", "copy-done", "copy-start"):
            buckets["boundary_copies"] += e["dur"]
            continue
        comp = fusion_to_comp.get(base)
        srcs = comp_srcs.get(comp, comp_srcs.get(f"@{base}", set())) \
            if (comp or f"@{base}" in comp_srcs) else set()
        if not srcs:
            buckets["unattributed"] += e["dur"]
            unattributed[base.split(".")[0]] += e["dur"]
            continue
        synth_hit = any(s in SYNTH_FILES for s in srcs)
        model_hit = any(s not in SYNTH_FILES for s in srcs)
        if synth_hit and not model_hit:
            buckets["synthesis"] += e["dur"]
        elif model_hit and not synth_hit:
            buckets["model_step"] += e["dur"]
        else:
            buckets["mixed"] += e["dur"]
    busy_us = sum(buckets.values())

    per_step = {k: round(v / CHUNK / 1e3, 3) for k, v in buckets.items()}
    out = {
        "what": ("fused-chunk device attribution: synthesis vs model-step "
                 "vs dispatch, per train step (batch %d, chunk %d)"
                 % (BATCH, CHUNK)),
        "wall_ms_per_step": round(wall_s * 1e3 / CHUNK, 3),
        "device_busy_ms_per_step": round(busy_us / CHUNK / 1e3, 3),
        "dispatch_gap_ms_per_step": round(
            wall_s * 1e3 / CHUNK - busy_us / CHUNK / 1e3, 3),
        "busy_by_origin_ms_per_step": per_step,
        "unattributed_top": {k: round(v / CHUNK / 1e3, 3)
                             for k, v in unattributed.most_common(8)},
        "implied_fused_utt_s": round(BATCH / wall_s * CHUNK, 1),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

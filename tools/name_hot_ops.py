#!/usr/bin/env python
"""NAME the ops behind the step-time attribution buckets (round-5 item 2).

docs/mfu_attribution_bf16.json attributes 74 % of step busy time to
"everything else" — loop fusions, data formatting, GRU/heads/loss/Adam —
by HLO category only. This tool joins a fresh device trace of the SAME
compiled executable with its optimized-HLO metadata, so every hot fusion
gets the jax source op names it was fused from:

  1. build the shipped train step exactly as bench.py does (batch 512,
     bf16-W, dft auto->matmul, custom-VJP auto), AOT-compile once;
  2. dump compiled.as_text() (optimized HLO with per-instruction
     metadata op_name="jit(train_step)/...");
  3. trace a 4-step window on the device (same executable => same
     fusion numbering);
  4. per top-op: resolve the fusion's computation and summarise its
     instructions' metadata op_names + source lines.

Usage:
  python tools/name_hot_ops.py --out docs/hot_ops_named.json \
      [--trace-dir /tmp/trace_name_hot] [--steps 4] [--top 30]
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


def build_step(batch: int):
    """The bench.py bare-step operating point, AOT-compiled."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from biear_tpu.models import BiEARConfig
    from biear_tpu.models.biear import init_active
    from biear_tpu.train import TrainHyper, make_optimizer, make_train_step

    cfg = BiEARConfig(controller_mode="dual", deltaQ_mode="relative",
                      deltaQ_base=1.0, deltaQ_low_factor=0.3,
                      deltaQ_high_factor=5.0, fb_w_dtype="bfloat16")
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
    y = jnp.asarray(y.reshape(batch, 56))
    b = (wavL, wavR, x3, y)

    key = jax.random.PRNGKey(0)
    compiled = step.lower(params, opt_state, b, key,
                          jnp.float32(1.0)).compile()
    return compiled, (params, opt_state, b, key)


# ---------------- HLO metadata join ----------------

_COMP_HDR = re.compile(r"^(%?[\w\.\-]+) \(.*\) -> .* \{$")
_FUSION_CALL = re.compile(r"%?([\w\.\-]+) = .*? fusion\(.*calls=%?([\w\.\-]+)")
_METADATA = re.compile(r'metadata=\{([^}]*)\}')
_OPNAME = re.compile(r'op_name="([^"]*)"')
_SOURCE = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')


def parse_hlo(text: str):
    """-> (fusion_name -> computation_name,
           computation_name -> [(opcode, op_name, source)])."""
    fusion_to_comp: dict[str, str] = {}
    comp_instrs: dict[str, list] = {}
    cur = None
    for line in text.splitlines():
        s = line.strip()
        m = _COMP_HDR.match(s)
        if m:
            cur = m.group(1).lstrip("%")
            comp_instrs[cur] = []
            continue
        if s == "}":
            cur = None
            continue
        fm = _FUSION_CALL.search(s)
        if fm:
            fusion_to_comp[fm.group(1)] = fm.group(2).lstrip("%")
        if cur is None or "=" not in s:
            continue
        opcode_m = re.search(r"= (?:[\w\[\],\{\}:\(\)#\* ]+? )?([a-z][\w\-]*)\(", s)
        opcode = opcode_m.group(1) if opcode_m else "?"
        md = _METADATA.search(s)
        op_name, source = "", ""
        if md:
            om = _OPNAME.search(md.group(1))
            if om:
                op_name = om.group(1)
            sm = _SOURCE.search(md.group(1))
            if sm:
                source = f"{os.path.basename(sm.group(1))}:{sm.group(2)}"
        comp_instrs[cur].append((opcode, op_name, source))
    return fusion_to_comp, comp_instrs


def summarise_comp(instrs) -> dict:
    """Compress a fused computation into its distinct jax-level op names
    (module-qualified), weighted by instruction count."""
    names = collections.Counter()
    opcodes = collections.Counter()
    sources = collections.Counter()
    for opcode, op_name, source in instrs:
        if opcode in ("parameter", "constant"):
            continue
        opcodes[opcode] += 1
        if op_name:
            # strip the jit(train_step)/jit(main)/ prefix, keep the tail
            tail = re.sub(r"^jit\([^)]*\)/", "", op_name)
            tail = re.sub(r"^jit\([^)]*\)/", "", tail)
            names[tail] += 1
        if source:
            sources[source] += 1
    return {
        "n_instructions": sum(opcodes.values()),
        "opcodes": dict(opcodes.most_common(8)),
        "op_names": [n for n, _ in names.most_common(10)],
        "sources": [s for s, _ in sources.most_common(6)],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/hot_ops_named.json")
    ap.add_argument("--trace-dir", default="/tmp/trace_name_hot")
    ap.add_argument("--hlo-out", default="/tmp/train_step_optimized.hlo")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("[name_hot_ops] compiling step...", file=sys.stderr)
    compiled, (params, opt_state, batch, key) = build_step(args.batch)
    hlo = compiled.as_text()
    with open(args.hlo_out, "w") as f:
        f.write(hlo)
    print(f"[name_hot_ops] HLO ({len(hlo)/1e6:.1f} MB) -> {args.hlo_out}",
          file=sys.stderr)
    fusion_to_comp, comp_instrs = parse_hlo(hlo)

    def sync(m):
        return jax.device_get(m["loss"])

    p, s = params, opt_state
    p, s, m = compiled(p, s, batch, key, jnp.float32(1.0))
    sync(m)  # warmup
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            key, k = jax.random.split(key)
            p, s, m = compiled(p, s, batch, k, jnp.float32(1.0))
        sync(m)
    wall = time.perf_counter() - t0
    print(f"[name_hot_ops] traced {args.steps} steps in {wall*1e3:.1f} ms",
          file=sys.stderr)

    from trace_attribution import attribute, load_trace
    events = load_trace(args.trace_dir)
    att = attribute(events, args.steps)

    named = []
    for t in att["top_ops"][:args.top]:
        op = dict(t)
        base = t["op"].split(" ")[0]       # "fusion.1564 f32[...]" -> name
        comp = fusion_to_comp.get(base)
        if comp and comp in comp_instrs:
            op["named"] = summarise_comp(comp_instrs[comp])
        named.append(op)

    out = {
        "what": ("top step ops joined with optimized-HLO metadata "
                 "(same executable for trace and text)"),
        "batch": args.batch,
        "device_busy_ms_per_step": att["device_busy_ms_per_step"],
        "by_category_ms": att["by_category_ms"],
        "top_ops_named": named,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"[name_hot_ops] wrote {args.out}", file=sys.stderr)

    for op in named[:20]:
        nm = op.get("named", {})
        print(f"{op['ms_total']/args.steps:7.3f} ms/step x{op['count']:<4} "
              f"{op['category']:<20} {op['op'][:46]}")
        for n in nm.get("op_names", [])[:4]:
            print(f"          {n}")
        if nm.get("sources"):
            print(f"          src: {', '.join(nm['sources'][:3])}")


if __name__ == "__main__":
    main()

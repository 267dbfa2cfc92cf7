#!/usr/bin/env python
"""Anytime streaming-localisation demo on a TRAINED protocol checkpoint.

Loads a committed protocol archive (settings.json + best.pth), synthesizes
one speech+noise scene from the same generator family the model trained
on, then feeds it to the streaming inference path (serve/streaming.py)
one 52.6 ms hop at a time, reading out the 8-sector presence belief after
every hop. Output: a per-hop belief trajectory (JSON) and a figure — the
belief converging onto the ground-truth sectors while the stream is still
playing, which is the capability the offline reference API cannot
express (its forward needs the full 1 s crop; model_torch.py:1065-1112).

Usage:
  python tools/stream_demo.py [--archive docs/protocol_r3/flagship-s1]
      [--n-src 2] [--seed 4] [--png docs/streaming_demo.png]
      [--json docs/streaming_demo.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Colors: dataviz reference palette, first three categorical slots (the
# all-pairs-validated set, light mode) for the <=3 active sources; muted
# gray for inactive sectors; text in ink tokens, not series colors.
SLOTS = ["#2a78d6", "#eb6834", "#1baf7a"]
GRAY = "#b8b7ae"
INK, INK2 = "#1a1a19", "#6b6a60"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--archive", default="docs/protocol_r3/flagship-s1")
    ap.add_argument("--n-src", type=int, default=2)
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--pool-size", type=int, default=64)
    ap.add_argument("--png", default="docs/streaming_demo.png")
    ap.add_argument("--json", default="docs/streaming_demo.json")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from biear_tpu.config import config_from_settings
    from biear_tpu.data.speech import make_speech_pool
    from biear_tpu.serve import stream_init, stream_step, stream_readout, \
        stream_plan
    from biear_tpu.train.evaluate import load_params
    from tools.generate_binaural_data import build_synthesizer

    with open(os.path.join(args.archive, "settings.json")) as f:
        settings = json.load(f)
    cfg = config_from_settings(settings)[0]
    params = load_params(os.path.join(args.archive, "best.pth"), cfg)

    # Same corpus family as the protocol runs (run_full_protocol.py):
    # source-filter speech + diffuse noise at U[5, 25] dB SNR.
    pool = make_speech_pool(args.pool_size, seg_len=cfg.fs + 7 * 128,
                            fs=cfg.fs, seed=args.seed + 1)
    synth = build_synthesizer("anechoic", None, pool, cfg.fs,
                              num_lags=cfg.n_bands, noise_snr_db=(5.0, 25.0))
    wavL, wavR, _, y, _meta = synth.sample_batch_meta(
        jax.random.PRNGKey(args.seed), batch_size=1, n_src=args.n_src)
    gt = np.asarray(y).reshape(8, 7)
    gt_sectors = np.nonzero(gt[:, 0] > 0.5)[0].tolist()

    plan = stream_plan(cfg)
    hop, T = plan["hop"], cfg.timesteps
    state = stream_init(params, cfg, 1)
    step = jax.jit(stream_step, static_argnums=1)
    probs = []
    for t in range(T):
        sl = slice(t * hop, (t + 1) * hop)
        state = step(params, cfg, state, wavL[:, sl], wavR[:, sl])
        tail = (wavL[:, T * hop:], wavR[:, T * hop:]) if t == T - 1 \
            else (None, None)
        sound, _, _ = stream_readout(params, cfg, state, *tail)
        probs.append(np.asarray(jax.nn.sigmoid(sound))[0])
    probs = np.stack(probs)                               # (T, 8)

    final = probs[-1]
    pred_sectors = np.nonzero(final > 0.5)[0].tolist()
    t_axis = (np.arange(1, T + 1) * hop / cfg.fs)
    # First hop from which the thresholded prediction equals ground truth
    # and never changes again — the stream's decision latency.
    correct = [(sorted(np.nonzero(p > 0.5)[0].tolist()) == sorted(gt_sectors))
               for p in probs]
    settle = next((i for i in range(T) if all(correct[i:])), None)

    out = {"archive": args.archive, "n_src": args.n_src, "seed": args.seed,
           "gt_sectors": gt_sectors, "pred_sectors": pred_sectors,
           "settled_at_hop": settle,
           "settled_at_s": None if settle is None else round(
               float(t_axis[settle]), 3),
           "hop_s": round(hop / cfg.fs, 4),
           "probs_per_hop": [[round(float(v), 4) for v in p] for p in probs]}
    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in list(out)[:8]}, indent=1))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.0), dpi=150)
    fig.patch.set_facecolor("white")
    ax.set_facecolor("white")
    for s in range(8):
        if s not in gt_sectors:
            ax.plot(t_axis, probs[:, s], color=GRAY, lw=1.4, zorder=2,
                    label="inactive sectors" if s == min(
                        set(range(8)) - set(gt_sectors)) else None)
    # Direct labels at the line ends, dodged apart when the active lines
    # converge (they all end near 1.0 once the model is confident).
    ends = sorted(((float(probs[-1, s]), s) for s in gt_sectors))
    label_y = []
    for v, _ in ends:
        if label_y and v - label_y[-1] < 0.07:
            v = label_y[-1] + 0.07
        label_y.append(v)
    for (v, s), ly in zip(ends, label_y):
        i = gt_sectors.index(s)
        ax.plot(t_axis, probs[:, s], color=SLOTS[i % 3], lw=2.0, zorder=3,
                label=f"sector {s} (source present)")
        ax.annotate(f"sector {s}", (t_axis[-1], ly), xytext=(4, 0),
                    textcoords="offset points", color=INK, fontsize=9,
                    va="center", annotation_clip=False)
    ax.axhline(0.5, color=INK2, lw=1.0, ls=(0, (4, 4)), zorder=1)
    ax.annotate("decision threshold", (t_axis[0], 0.5), xytext=(2, 5),
                textcoords="offset points", color=INK2, fontsize=8,
                bbox=dict(fc="white", ec="none", pad=0.4))
    if settle is not None and settle > 0:
        ax.axvline(t_axis[settle], color=INK2, lw=1.0, ls=(0, (2, 3)),
                   zorder=1)
        ax.annotate(f"settled: {t_axis[settle]*1e3:.0f} ms",
                    (t_axis[settle], 1.02), color=INK2, fontsize=8,
                    ha="center", annotation_clip=False,
                    bbox=dict(fc="white", ec="none", pad=0.4))
    ax.set_xlim(0, float(t_axis[-1]) * 1.12)
    ax.set_ylim(-0.02, 1.05)
    ax.set_xlabel("audio streamed (s)", color=INK)
    ax.set_ylabel("sector presence belief", color=INK)
    ax.set_title(f"Anytime streaming localisation — {args.n_src} speech "
                 f"sources in noise,\none belief update per "
                 f"{1e3*hop/cfg.fs:.1f} ms hop", color=INK, fontsize=10,
                 loc="left")
    for spine in ("top", "right"):
        ax.spines[spine].set_visible(False)
    for spine in ("left", "bottom"):
        ax.spines[spine].set_color(INK2)
    ax.tick_params(colors=INK2, labelsize=8)
    ax.grid(axis="y", color="#eceae2", lw=0.8, zorder=0)
    ax.legend(loc="center right", bbox_to_anchor=(1.0, 0.3), fontsize=8,
              frameon=False, labelcolor=INK)
    fig.tight_layout()
    fig.savefig(args.png, facecolor="white")
    print(f"wrote {args.png} and {args.json}")


if __name__ == "__main__":
    main()

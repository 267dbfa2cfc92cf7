#!/usr/bin/env python
"""Window-extraction kernel ladder: XLA gather vs Pallas DMA.

The fused synthesis pipeline's dominant cost (bench_synth_parts2) is
extracting X = B*MS conv-input windows pool[row, off : off+W] with
sample-granular offsets: XLA lowers the vmapped dynamic_slice to a gather
running at ~23 GB/s (17 ms for 400 MB at batch 1024). A DMA engine copy
is the right tool: arbitrary-offset row slices at near-memcpy bandwidth.

Variants:
  xla             vmapped dynamic_slice (the XLA gather baseline)
  pallas_direct   one DMA per window, misaligned source offset
  pallas_chunk8   8 windows per grid step, 8 DMAs in flight
  pallas_aligned  aligned-superset DMA + in-VMEM dynamic-slice shift

Each output is (X, 16384) — the 128-block-padded window the downstream
block-Toeplitz conv consumes directly. Prints one JSON line per variant
with ms and GB/s; exactness asserted against numpy slicing first.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, MS, fs, L = args.batch, 3, 16000, 256
    X = B * MS
    W = fs + L - 1           # 16255 needed
    WP = 16384               # 128-block padded window actually produced
    NP = args.pool
    T = 16128                # pool row length (padded 1 s segments)
    # padded pool: left L-1; right enough for off in [0, (T-fs)+L-1] + WP
    offmax = (T - fs) + L - 1
    Tp = -(-(L - 1 + T) // 128) * 128
    while L - 1 + offmax + WP > Tp:          # keep aligned width
        Tp += 128

    rng = np.random.default_rng(0)
    pool_np = rng.standard_normal((NP, Tp)).astype(np.float32)
    pool = jnp.asarray(pool_np)
    rows_np = rng.integers(0, NP, X).astype(np.int32)
    offs_np = rng.integers(0, offmax + 1, X).astype(np.int32)
    rows_d = jnp.asarray(rows_np)
    offs_d = jnp.asarray(offs_np)

    want = np.stack([pool_np[r, o:o + WP]
                     for r, o in zip(rows_np[:4], offs_np[:4])])

    # ---------------- XLA baseline ----------------
    @jax.jit
    def win_xla(carry, rows, offs):
        o2 = offs + (carry.astype(jnp.int32) & 0)
        out = jax.vmap(lambda r, o: lax.dynamic_slice(
            pool[r], (o,), (WP,)))(rows, o2)
        return out

    # ---------------- pallas: 8 windows per step ----------------
    CH = 8

    def kern_chunk(rows_ref, offs_ref, pool_ref, out_ref, sems):
        i = pl.program_id(0)

        def cp(k):
            return pltpu.make_async_copy(
                pool_ref.at[pl.ds(rows_ref[i * CH + k], 1),
                            pl.ds(offs_ref[i * CH + k], WP)],
                out_ref.at[pl.ds(k, 1), :], sems.at[k])

        for k in range(CH):
            cp(k).start()
        for k in range(CH):
            cp(k).wait()

    chunk_call = pl.pallas_call(
        kern_chunk,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(X // CH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((CH, WP), lambda i, rows, offs: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.SemaphoreType.DMA((CH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((X, WP), jnp.float32),
    )

    @jax.jit
    def win_chunk(carry, rows, offs):
        return chunk_call(rows, offs + (carry.astype(jnp.int32) & 0), pool)

    # ------------- pallas: aligned DMA + in-VMEM shift -------------
    WA = WP + 128            # aligned superset

    def kern_aligned(rows_ref, offs_ref, pool_ref, out_ref, scratch, sems):
        i = pl.program_id(0)

        def cp(k):
            o = offs_ref[i * CH + k]
            qb = (o // 128) * 128
            return o, qb, pltpu.make_async_copy(
                pool_ref.at[pl.ds(rows_ref[i * CH + k], 1), pl.ds(qb, WA)],
                scratch.at[pl.ds(k, 1), :], sems.at[k])

        for k in range(CH):
            cp(k)[2].start()
        for k in range(CH):
            o, qb, dma = cp(k)
            dma.wait()
            out_ref[k, :] = scratch[k, pl.ds(o - qb, WP)]

    aligned_call = pl.pallas_call(
        kern_aligned,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(X // CH,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((CH, WP), lambda i, rows, offs: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((CH, WA), jnp.float32),
                            pltpu.SemaphoreType.DMA((CH,))],
        ),
        out_shape=jax.ShapeDtypeStruct((X, WP), jnp.float32),
    )

    @jax.jit
    def win_aligned(carry, rows, offs):
        return aligned_call(rows, offs + (carry.astype(jnp.int32) & 0), pool)

    variants = {
        "xla": win_xla,
        "pallas_chunk8": win_chunk,
        "pallas_aligned": win_aligned,
    }

    gb = X * WP * 4 / 1e9
    only = args.only.split(",") if args.only else None
    for name, fn in variants.items():
        if only and name not in only:
            continue
        try:
            out = fn(jnp.float32(0.0), rows_d, offs_d)
            got = np.asarray(out[:4])
            err = float(np.max(np.abs(got - want)))
            assert err == 0.0, f"{name} mismatch {err}"
            # chained timing: feed a scalar of the output back in
            carry = out[0, 0]
            ms = []
            for _ in range(args.windows):
                t0 = time.perf_counter()
                for _ in range(args.steps):
                    out = fn(carry, rows_d, offs_d)
                    carry = out[0, 0]
                jax.block_until_ready(carry)
                ms.append((time.perf_counter() - t0) * 1000 / args.steps)
            med = statistics.median(ms)
            print(json.dumps({"part": f"win:{name}", "X": X, "ms":
                              round(med, 3),
                              "GBps": round(gb / (med / 1000), 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"part": f"win:{name}",
                              "error": str(e)[:2000]}), flush=True)


if __name__ == "__main__":
    main()

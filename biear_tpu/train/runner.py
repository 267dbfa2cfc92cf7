"""The end-to-end training driver (library form of the reference's
train_biear.py script).

Orchestration parity: sanity batch, epoch loop with train/val, plateau
schedule on val loss, lexicographic best-tuple checkpointing, last/epoch
checkpoints, history.json, final test pass -> test_metrics.json, all under
the standard run-dir tree. TPU-native mechanics: one jitted train step over
a ('data','model') mesh, background device prefetch, on-device metric
accumulation, optional on-device synthesis replacing the H5 train split.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (RunConfig, make_exp_name, make_run_dirs, settings_dict,
                      data_paths)
from ..models.biear import init_active, init_passive
from ..models.auralnet import init_auralnet
from ..parallel.mesh import (make_mesh, batch_sharding, shard_params,
                             shard_opt_state)
from ..data.h5io import ActiveH5Dataset, PassiveH5Dataset
from ..data.pipeline import batch_iterator, Prefetcher
from ..utils.logging import MetricLogger
from .loop import (make_train_step, make_eval_step, make_train_chunk,
                   make_eval_chunk, is_better_tuple, grad_hist_names,
                   GRAD_HIST_EDGES)
from .optim import make_optimizer, PlateauScheduler
from . import state as ckpt


def _init_params(rc: RunConfig, key):
    if rc.model_kind == "auralnet":
        return init_auralnet(key, rc.model_cfg)
    if rc.model_kind == "passive":
        return init_passive(key, rc.model_cfg)
    return init_active(key, rc.model_cfg)


def _open_datasets(rc: RunConfig):
    paths = data_paths(rc)
    if rc.data_format == "shard":
        # Native mmap shards (DATA_FORMAT: shard): the C++ gather core
        # serves batches zero-copy off the page cache — no preload pass,
        # int16 waveforms decode to f32 inside the gather. This is the
        # TPU-host home of the reference's lazy SWMR DataLoader workers
        # (data_save.py:282-286). Shapes restore the per-row geometry the
        # flat shard format erases.
        from ..data.native_loader import ShardDataset
        m = rc.model_cfg
        tb = (m.timesteps, m.n_bands)
        shapes = ([(m.fs,), (m.fs,), (m.n_bands,), (56,)] if rc.active
                  else [tb, tb, (m.n_bands,), tb, tb, (56,)])
        return {k: ShardDataset(v, shapes=shapes) for k, v in paths.items()}
    DS = ActiveH5Dataset if rc.active else PassiveH5Dataset
    return {k: DS(v, preload=rc.preload_h5) for k, v in paths.items()}


class SynthEvalDataset:
    """Fixed evaluation split materialised once from a synthesizer — the
    moral equivalent of the reference's pre-generated val/test H5s.

    By default the batches STAY ON DEVICE: this image's TPU tunnel makes
    bulk device->host transfers pathologically slow, and there is no reason
    for synthetic eval data to ever visit the host. For splits too large to
    pin in HBM (a 9k-row split is ~1.2 GB of waveforms), keep_on_device=
    False spills each batch to host numpy as it is generated (float32 only
    — the tunnel's transfer constraint) and re-uploads per epoch.
    The runner consumes the split via device_batches().

    keep_on_device=None (the default) decides automatically: the split's
    HBM footprint is estimated up front and splits above
    SYNTH_EVAL_HBM_BUDGET_MB (default 2048 — leaves a 16 GB chip room for
    a sibling split, params, optimizer state, and the BPTT working set)
    spill to the host with a log line instead of OOMing the run."""

    def __init__(self, synth, n: int, seed: int, batch_size: int,
                 n_src=None, test_thirds: bool = False,
                 keep_on_device: bool | None = None):
        import jax as _jax
        import numpy as _np
        # read per-instance, not at class definition, so drivers can set
        # the env var after importing this module and still take effect
        self.AUTO_BUDGET_MB = int(
            os.environ.get("SYNTH_EVAL_HBM_BUDGET_MB", 2048))
        if keep_on_device is None:
            fs = getattr(synth, "fs", 16000)
            lags = getattr(synth, "num_lags", 100)
            # synths emitting non-waveform batches (PassiveFeatureSynth)
            # declare their own per-row element count
            row = getattr(synth, "row_elems", 2 * fs + lags + 56)
            est_mb = n * row * 4 / 2**20
            keep_on_device = est_mb <= self.AUTO_BUDGET_MB
            if not keep_on_device:
                print(f"[SynthEvalDataset] split of {n} rows ~{est_mb:.0f} "
                      f"MiB exceeds the {self.AUTO_BUDGET_MB} MiB HBM "
                      f"budget; spilling to host (set "
                      f"SYNTH_EVAL_HBM_BUDGET_MB or keep_on_device to "
                      f"override)")
        key = _jax.random.PRNGKey(seed)
        self._batches = []
        made = 0
        third = n // 3
        while made < n:
            take = min(batch_size, n - made)
            if test_thirds:
                # chunks must not straddle third boundaries, or samples of
                # one source-count third would be generated with another
                # third's forced count (the reference splits are exactly
                # 1/3 per count, generate_anechoic_data.py:251-264)
                ns = 1 if made < third else (2 if made < 2 * third else 3)
                boundary = third if made < third else (
                    2 * third if made < 2 * third else n)
                take = min(take, boundary - made)
            else:
                ns = n_src
            key, k = _jax.random.split(key)
            b = synth.sample_batch(k, take, n_src=ns)
            if not keep_on_device:
                b = tuple(_np.asarray(x) for x in b)
            self._batches.append(b)
            made += take
        self.length = made

        # Device-resident splits additionally get STACKED same-shape groups
        # so an epoch of evaluation is a handful of lax.scan dispatches
        # instead of one dispatch per batch (the tunnel's per-dispatch
        # latency dwarfs the eval compute at reference scale: 141 batches
        # x 150 epochs). The per-batch view (device_batches) slices the
        # stacks, so both access paths share one copy of the split.
        self.stacked_groups = []
        if keep_on_device and self._batches:
            import jax.numpy as _jnp
            groups = {}
            for b in self._batches:
                groups.setdefault(b[0].shape[0], []).append(b)
            self._batches = None
            self.stacked_groups = [
                tuple(_jnp.stack(parts) for parts in zip(*g))
                for g in groups.values()]

    def __len__(self):
        return self.length

    def device_batches(self):
        if self._batches is not None:
            return iter(self._batches)

        def gen():
            for g in self.stacked_groups:
                for j in range(g[0].shape[0]):
                    yield tuple(a[j] for a in g)

        return gen()


class _SynthSource:
    """Adapter: on-device synthesizer -> epoch iterator of train batches."""

    def __init__(self, synth, steps_per_epoch: int, batch_size: int, seed: int):
        self.synth = synth
        self.steps = steps_per_epoch
        self.bs = batch_size
        self.seed = seed

    def epoch(self, epoch_idx: int):
        key = jax.random.PRNGKey(self.seed + epoch_idx)
        for i in range(self.steps):
            key, k = jax.random.split(key)
            yield self.synth.sample_batch(k, self.bs)


def _accumulate(sums, metrics, bs):
    """Epoch metric accumulation, fully ON DEVICE (no per-step host sync,
    preserving async dispatch) and EXCLUDING skipped/nonfinite batches
    from the averages — reference semantics (train_biear.py:514-517):
    a skipped batch increments the skip counter and contributes nothing.

    Metric leaves may be scalars (one step) or carry a leading (n_steps,)
    axis (a fused train chunk / stacked eval group) — the sums reduce over
    whatever is there."""
    skipped = metrics.get("skipped", jnp.float32(0.0))
    ok = jnp.logical_and(jnp.isfinite(metrics["loss"]),
                         jnp.asarray(skipped) == 0)
    w = ok.astype(jnp.float32) * bs
    for k in ("loss", "sound_acc", "aoa_mae", "dist_acc"):
        sums[k] = sums.get(k, jnp.float32(0.0)) + jnp.sum(jnp.where(
            ok, metrics[k].astype(jnp.float32), 0.0) * bs)
    sums["skipped"] = (sums.get("skipped", jnp.float32(0.0))
                       + jnp.sum(1.0 - ok.astype(jnp.float32)))
    sums["_n"] = sums.get("_n", jnp.float32(0.0)) + jnp.sum(w)
    return sums


def _finalize(sums):
    """One host sync per epoch: pull the accumulated device scalars."""
    if not sums:
        return {"loss": float("nan"), "sound_acc": 0.0,
                "aoa_mae": float("nan"), "dist_acc": 0.0, "skipped": 0}
    n = max(float(sums.pop("_n")), 1.0)
    skipped = int(float(sums.pop("skipped")))
    out = {k: float(v) / n for k, v in sums.items()}
    out["skipped"] = skipped
    return out


def train(rc: RunConfig, *, datasets=None, synth=None, seed: int = 0,
          run_id: str | None = None, quiet: bool = False,
          max_steps_per_epoch: int | None = None,
          resume_from: str | None = None) -> dict:
    """Run the full training job; returns a summary dict with run paths,
    history and test metrics.

    datasets: optional {"train","val","test"} dataset objects (tests inject
    tiny ones); otherwise opened from the H5 path convention.
    synth: optional synthesizer replacing the train split
    (rc.synth_on_device path).
    resume_from: an existing run directory — continue from its
    checkpoints/last (params + optimizer state + epoch), appending to its
    history. The reference cannot do this (it never saves optimizer state,
    SURVEY.md §5).
    """
    say = (lambda *a: None) if quiet else print

    # Multi-process discipline: exactly one process owns every host-side
    # write (run tree, settings, logs, checkpoints, history, plots). The
    # others compute the same paths for reading (shared-filesystem
    # semantics, the standard multi-host layout) but never create or
    # mutate them. Steps themselves are collective across processes.
    is_main = jax.process_index() == 0
    n_proc = jax.process_count()

    def barrier(tag: str):
        if n_proc > 1:
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices(tag)

    from ..config import apply_matmul_precision
    apply_matmul_precision(rc.matmul_precision)
    if rc.matmul_precision != "default":
        say(f"[Precision] jax_default_matmul_precision={rc.matmul_precision}")

    if resume_from is not None:
        exp_name = os.path.basename(os.path.normpath(resume_from))
        rc.runs_root = os.path.dirname(os.path.normpath(resume_from)) or "."
        run_id = run_id or "resume"
    else:
        exp_name, run_id = make_exp_name(rc, run_id)
    dirs = make_run_dirs(rc, exp_name, create=is_main)
    if is_main:
        with open(os.path.join(dirs["meta"], "settings.json"), "w") as f:
            json.dump(settings_dict(rc, run_id, exp_name), f, indent=2)
        logger = MetricLogger(dirs["logs_json"], dirs["tb"])
    else:
        from ..utils.logging import NullLogger
        logger = NullLogger()
    say(f"[Run dir] {dirs['run']}")

    import math
    n_dev = len(jax.devices())
    data_axis = rc.mesh_data if rc.mesh_data != -1 else max(
        n_dev // rc.mesh_model, 1)
    # The data axis must divide the global batch; shrink to the gcd so tiny
    # batches still run (replicated) instead of failing to shard.
    data_axis = math.gcd(rc.batch_size, data_axis)
    mesh = make_mesh(data_axis, rc.mesh_model)
    bsh = batch_sharding(mesh)
    say(f"[Mesh] {dict(mesh.shape)} over {len(mesh.devices.flat)} device(s)")

    # Per-process input: BATCH_SIZE stays the GLOBAL batch (reference
    # semantics); each process feeds its 1/n_proc slice and the slices
    # assemble into one global jax.Array per step.
    if rc.batch_size % n_proc:
        raise ValueError(f"BATCH_SIZE {rc.batch_size} must divide evenly "
                         f"over {n_proc} processes")
    local_bs = rc.batch_size // n_proc

    def to_global(batch):
        """Per-host batch tuple -> global sharded device arrays."""
        if n_proc == 1:
            return tuple(jax.device_put(b, bsh) for b in batch)
        return tuple(jax.make_array_from_process_local_data(
            bsh, np.asarray(b), (b.shape[0] * n_proc,) + b.shape[1:])
            for b in batch)
    if synth is not None and hasattr(synth, "set_output_sharding"):
        # the on-device sampler emits batches already sharded over 'data'
        # (no implicit reshard between synthesis and the train step)
        synth.set_output_sharding(bsh)

    key = jax.random.PRNGKey(seed)
    key, k_init = jax.random.split(key)
    params = _init_params(rc, k_init)
    params = shard_params(params, mesh)

    optimizer = make_optimizer(params, rc.hyper,
                               freeze_controller=(rc.active
                                                  and rc.freeze_q_controller_only
                                                  and not rc.fixed_frontend_q))
    # commit the fresh optimizer state to the mesh so the step's first call
    # sees exactly the shardings its outputs will carry (see
    # parallel.mesh.shard_opt_state — an uncommitted opt_state costs a
    # second full compile of the train step)
    opt_state = shard_opt_state(optimizer.init(params), params, mesh)
    model_kind = rc.model_kind if rc.active else "passive"
    train_step = make_train_step(rc.model_cfg, rc.hyper, optimizer,
                                 model_kind, max_param_log=rc.max_param_log)
    hist_names = grad_hist_names(params, rc.max_param_log)
    eval_step = make_eval_step(rc.model_cfg, rc.hyper, model_kind)
    eval_chunk = make_eval_chunk(rc.model_cfg, rc.hyper, model_kind)
    sched = PlateauScheduler(factor=0.5, patience=10)

    # Fused multi-step train dispatch (loop.make_train_chunk), keyed by
    # chunk length so a trailing sub-chunk reuses its own one compilation.
    chunk_runners = {}

    def get_chunk_runner(chunk: int):
        if chunk not in chunk_runners:
            chunk_runners[chunk] = make_train_chunk(
                rc.model_cfg, rc.hyper, optimizer, model_kind,
                synth.batch_fn(rc.batch_size), chunk,
                max_param_log=rc.max_param_log)
        return chunk_runners[chunk]

    if datasets is None:
        if synth is not None and rc.synth_on_device:
            n_eval = int(rc.raw.get("SYNTH_EVAL_SAMPLES", 1024))
            # SYNTH_EVAL_ON_DEVICE: true/false force; unset -> auto-spill
            # oversized splits (SynthEvalDataset HBM budget)
            on_dev = rc.raw.get("SYNTH_EVAL_ON_DEVICE", None)
            on_dev = None if on_dev is None else bool(on_dev)
            say(f"[Synth] materialising val/test splits ({n_eval} samples "
                f"each, {'auto' if on_dev is None else ('HBM' if on_dev else 'host')}-resident)")
            datasets = {
                "val": SynthEvalDataset(synth, n_eval, seed + 101,
                                        rc.batch_size,
                                        keep_on_device=on_dev),
                "test": SynthEvalDataset(synth, n_eval, seed + 202,
                                         rc.batch_size, test_thirds=True,
                                         keep_on_device=on_dev),
            }
        else:
            datasets = _open_datasets(rc)

    n_params = sum(x.size for x in jax.tree.leaves(params))
    say(f"[Params] total={n_params:,}")

    # ---- sanity batch (train_biear.py:276-304) ----
    def first_batch():
        if synth is not None and rc.synth_on_device:
            return synth.sample_batch(jax.random.PRNGKey(0), rc.batch_size)
        # pad AND shard like run_split so the sanity pass shares the epoch
        # loop's one eval_step compilation (jit caches key on input
        # shardings as well as shapes/pytree structure)
        it = batch_iterator(datasets["train"], local_bs, shuffle=False,
                            pad_to_full=True,
                            host_id=jax.process_index(),
                            host_count=n_proc)
        return to_global(next(it))

    sb = first_batch()
    m = eval_step(params, sb)
    if not np.isfinite(float(m["loss"])):
        raise RuntimeError(f"[Sanity] nonfinite loss on first batch: {m}")
    say(f"[Sanity] first-batch loss={float(m['loss']):.4f} (finite)")

    history = {"train": [], "val": []}
    best_tuple = None
    global_step = 0
    lr_scale = 1.0
    start_epoch = 1

    if resume_from is not None:
        last_dir = os.path.join(dirs["checkpoints"], "last")
        if not os.path.isdir(last_dir):
            raise FileNotFoundError(f"no 'last' checkpoint under "
                                    f"{dirs['checkpoints']} to resume from")
        params, opt_state_r, meta = ckpt.load_checkpoint(
            last_dir, params, opt_state)
        params = shard_params(params, mesh)
        if opt_state_r is not None:
            opt_state = shard_opt_state(opt_state_r, params, mesh)
        if meta:
            start_epoch = int(meta.get("epoch", 0)) + 1
            lr_scale = float(meta.get("lr_scale", 1.0))
            if "global_step" in meta:
                global_step = int(meta["global_step"])
            else:
                # pre-global_step checkpoint: derive so resumed telemetry
                # continues the step axis instead of re-logging from 0
                if synth is not None and rc.synth_on_device:
                    spe = max_steps_per_epoch or int(
                        rc.raw.get("SYNTH_STEPS_PER_EPOCH", 128))
                else:
                    spe = -(-len(datasets["train"]) // rc.batch_size)
                    if max_steps_per_epoch is not None:
                        spe = min(spe, max_steps_per_epoch)
                global_step = (start_epoch - 1) * spe
            if meta.get("best_tuple"):
                best_tuple = tuple(meta["best_tuple"])
            s = meta.get("sched")
            if s:
                sched.best = float(s["best"])
                sched.num_bad = int(s["num_bad"])
                sched.scale = float(s["scale"])
        hist_path = os.path.join(dirs["logs_json"], "history.json")
        if os.path.exists(hist_path):
            with open(hist_path) as f:
                history = json.load(f)
        say(f"[Resume] from epoch {start_epoch - 1}, lr_scale={lr_scale}")

    def run_train_chunked(name, epoch, steps, chunk):
        """Train epoch as ceil(steps/chunk) fused lax.scan dispatches —
        the on-device-synthesis fast path (see loop.make_train_chunk).

        RNG: chunk keys derive from PRNGKey(seed + epoch) folded with the
        chunk index — the same epoch-keyed determinism contract as the
        per-step _SynthSource path, so the training stream is reproducible
        across resumes AT A FIXED SYNTH_CHUNK_STEPS. It is NOT invariant
        to the chunk setting: run_chunk's split(rng, chunk_steps) bakes
        the split width into every per-step key, so changing
        SYNTH_CHUNK_STEPS changes the synthesis stream (as does switching
        dispatch shapes — the per-step path splits one key sequentially).
        Seed-matched comparisons must therefore hold SYNTH_CHUNK_STEPS
        fixed, as the protocol fleet does."""
        nonlocal params, opt_state, global_step
        sums = {}
        t0 = time.time()
        done = 0
        ekey = jax.random.PRNGKey(seed + epoch)
        chunk_idx = 0
        while done < steps:
            c = min(chunk, steps - done)
            k = jax.random.fold_in(ekey, chunk_idx)
            chunk_idx += 1
            gs_before = global_step
            params, opt_state, ms = get_chunk_runner(c)(
                synth.bank, params, opt_state, k, jnp.float32(lr_scale))
            sums = _accumulate(sums, ms, rc.batch_size)
            done += c
            global_step += c
            # telemetry keeps the per-step path's HIST_EVERY cadence: log
            # once per crossed multiple, at the step index ON the grid
            # (the logged values are that step's row of the chunk stack).
            # ONE host pull per chunk serves every mark and the progress
            # print — per-value float() pulls each pay the tunnel RTT.
            first_mark = -(-gs_before // rc.hist_every) * rc.hist_every
            marks = list(range(first_mark, global_step, rc.hist_every))
            # print on the same PRINT_EVERY step grid as the per-step path,
            # once per crossed mark with THAT step's row of the chunk stack
            # (independent of chunk size, incl. a trailing sub-chunk) — a
            # chunk crossing several marks prints several lines, like the
            # per-step path would
            first_pmark = -(-gs_before // rc.print_every) * rc.print_every
            pmarks = list(range(first_pmark, global_step, rc.print_every))
            if marks or pmarks:
                hm = jax.device_get({k2: ms[k2] for k2 in
                                     ("loss", "sound_acc", "aoa_mae",
                                      "dist_acc", "grad_fb_norm",
                                      "grad_backend_norm", "grad_hist")})
            for mark in marks:
                row = mark - gs_before
                logger.scalars("train_step", {
                    k2: hm[k2][row] for k2 in
                    ("loss", "sound_acc", "aoa_mae", "dist_acc",
                     "grad_fb_norm", "grad_backend_norm")}, mark)
                logger.histograms("grads",
                                  dict(zip(hist_names, hm["grad_hist"][row])),
                                  GRAD_HIST_EDGES, mark)
            for mark in pmarks:
                row = mark - gs_before
                say(f"[step {mark:06d}] chunk/{c} "
                    f"loss={hm['loss'][row]:.4f}"
                    f" | sound_acc={hm['sound_acc'][row]:.3f}"
                    f" | aoa_mae={hm['aoa_mae'][row]:.3f}"
                    f" | dist_acc={hm['dist_acc'][row]:.3f}")
        out = _finalize(sums)
        out["sec"] = time.time() - t0
        logger.scalars(name, {k: v for k, v in out.items() if k != "sec"},
                       epoch)
        return out

    def run_eval_stacked(name, epoch, ds):
        """Eval split as one lax.scan dispatch per same-shape batch group."""
        sums = {}
        t0 = time.time()
        for g in ds.stacked_groups:
            ms = eval_chunk(params, g)
            sums = _accumulate(sums, ms, g[0].shape[1])
        out = _finalize(sums)
        out["sec"] = time.time() - t0
        logger.scalars(name, {k: v for k, v in out.items() if k != "sec"},
                       epoch)
        return out

    def run_split(name, epoch, training):
        nonlocal params, opt_state, global_step, key
        sums = {}
        padded = False
        if training and synth is not None and rc.synth_on_device:
            steps = max_steps_per_epoch or int(
                rc.raw.get("SYNTH_STEPS_PER_EPOCH", 128))
            chunk_cfg = int(rc.raw.get("SYNTH_CHUNK_STEPS", -1))
            if chunk_cfg < 0:
                # auto: largest divisor of steps <= 128 (one compilation);
                # an indivisible prime-ish count falls back to 128 + a
                # trailing sub-chunk (two compilations)
                chunk = max((d for d in range(2, min(128, steps) + 1)
                             if steps % d == 0), default=min(128, steps))
                if chunk < 16 and steps > 128:
                    chunk = 128
            else:
                chunk = min(chunk_cfg, steps)
            if chunk > 1:
                return run_train_chunked(name, epoch, steps, chunk)
            it = _SynthSource(synth, steps, rc.batch_size, seed).epoch(epoch)
        elif (not training
              and getattr(datasets[name], "stacked_groups", None)):
            return run_eval_stacked(name, epoch, datasets[name])
        elif hasattr(datasets[name], "device_batches"):
            it = datasets[name].device_batches()
        else:
            # pad_to_full: the trailing partial batch is padded to the full
            # batch size with a 0/1 weight vector, so the jitted step sees
            # ONE static shape per run (no tail-batch recompile).
            padded = True
            it = Prefetcher(batch_iterator(
                datasets[name], local_bs, shuffle=training,
                seed=seed, epoch=epoch, pad_to_full=True,
                host_id=jax.process_index(),
                host_count=n_proc), sharding=bsh,
                assemble=to_global if n_proc > 1 else None)
        t0 = time.time()
        try:
            for i, batch in enumerate(it):
                if (max_steps_per_epoch is not None
                        and i >= max_steps_per_epoch):
                    break
                batch = tuple(jnp.asarray(b) for b in batch)
                # effective sample count: real rows only (device scalar —
                # no host sync; padding rows carry zero weight)
                bs = jnp.sum(batch[-1]) if padded else batch[0].shape[0]
                if training:
                    key, k = jax.random.split(key)
                    params, opt_state, m = train_step(
                        params, opt_state, batch, k, jnp.float32(lr_scale))
                    if global_step % rc.hist_every == 0:
                        logger.scalars("train_step", {
                            k2: m[k2] for k2 in
                            ("loss", "sound_acc", "aoa_mae", "dist_acc",
                             "grad_fb_norm", "grad_backend_norm")},
                            global_step)
                        # per-tensor grad histograms every HIST_EVERY steps,
                        # capped at MAX_PARAM_LOG (train_biear.py:206-222)
                        counts = np.asarray(m["grad_hist"])
                        logger.histograms(
                            "grads", dict(zip(hist_names, counts)),
                            GRAD_HIST_EDGES, global_step)
                    if global_step % rc.print_every == 0:
                        say(f"[step {global_step:06d}] "
                            f"loss={float(m['loss']):.4f}"
                            f" | sound_acc={float(m['sound_acc']):.3f}"
                            f" | aoa_mae={float(m['aoa_mae']):.3f}"
                            f" | dist_acc={float(m['dist_acc']):.3f}")
                    global_step += 1
                else:
                    m = eval_step(params, batch)
                sums = _accumulate(sums, m, bs)
        finally:
            # stopping early (max_steps_per_epoch) must release the
            # prefetch worker and its queued device batches
            if hasattr(it, "close"):
                it.close()
        out = _finalize(sums)
        out["sec"] = time.time() - t0
        logger.scalars(name, {k: v for k, v in out.items() if k != "sec"},
                       epoch)
        return out

    for e in range(start_epoch, rc.epochs + 1):
        tr = run_split("train", e, True)
        va = run_split("val", e, False)
        history["train"].append(tr)
        history["val"].append(va)
        say(f"[{e:03d}] train_loss={tr['loss']:.4f} (skip={tr['skipped']}), "
            f"val_loss={va['loss']:.4f}, val_sound_acc={va['sound_acc']:.3f}, "
            f"val_aoa_mae={va['aoa_mae']:.3f}, "
            f"val_dist_acc={va['dist_acc']:.3f}")

        lr_scale = sched.step(va["loss"])
        curr = (va["sound_acc"], va["aoa_mae"], va["dist_acc"])
        if all(np.isfinite(curr)) and is_better_tuple(curr, best_tuple):
            # every process takes this branch together (metrics are
            # replicated global values, identical on all ranks), because
            # save_checkpoint is a COLLECTIVE — orbax writes files on the
            # primary host only, but all ranks must join its barrier
            best_tuple = curr
            ckpt.save_checkpoint(os.path.join(dirs["checkpoints"], "best"),
                                 params, opt_state,
                                 {"epoch": e, "val": va, "lr_scale": lr_scale})
            say(f"Saved new best: sound_acc={curr[0]:.4f}, "
                f"aoa_mae={curr[1]:.4f}, dist_acc={curr[2]:.4f}")
        if rc.save_every_epoch:
            ckpt.save_checkpoint(
                os.path.join(dirs["checkpoints"], f"epoch{e:03d}"),
                params, None, {"epoch": e})
        # rolling crash-resume point (+ history so far)
        ckpt.save_checkpoint(
            os.path.join(dirs["checkpoints"], "last"), params, opt_state,
            {"epoch": e, "lr_scale": lr_scale, "global_step": global_step,
             "best_tuple": list(best_tuple) if best_tuple else None,
             "sched": {"best": sched.best, "num_bad": sched.num_bad,
                       "scale": sched.scale}})
        if is_main:
            with open(os.path.join(dirs["logs_json"], "history.json"),
                      "w") as f:
                json.dump(history, f, indent=2)

    ckpt.save_checkpoint(
        os.path.join(dirs["checkpoints"], "last"), params, opt_state,
        {"epoch": rc.epochs, "lr_scale": lr_scale,
         "global_step": global_step,
         "best_tuple": list(best_tuple) if best_tuple else None,
         "sched": {"best": sched.best, "num_bad": sched.num_bad,
                   "scale": sched.scale}})
    if is_main:
        with open(os.path.join(dirs["logs_json"], "history.json"), "w") as f:
            json.dump(history, f, indent=2)

    # ---- test with best params (train_biear.py:679-689) ----
    # All processes restore best (shared filesystem); the barrier keeps a
    # non-main rank from reading while main is still writing epoch N's
    # checkpoints. Param state MUST stay rank-identical through the test
    # pass — its steps are collectives.
    barrier("pre-best-restore")
    best_dir = os.path.join(dirs["checkpoints"], "best")
    if os.path.isdir(best_dir):
        params, _, _ = ckpt.load_checkpoint(best_dir, params)
        # recommit to the training shardings — restored arrays carry
        # fresh layouts, which would force an avoidable recompile of any
        # step whose other inputs match a cached signature
        params = shard_params(params, mesh)
    te = None
    if datasets is not None and "test" in datasets:
        te = run_split("test", 0, False)
        if is_main:
            with open(os.path.join(dirs["logs_json"], "test_metrics.json"),
                      "w") as f:
                json.dump(te, f, indent=2)
        say(f"Test metrics: {te}")

    # Q visualisation on test batches (train_biear.py:691-700 — a no-op
    # stub in the reference; real plots here). Single-process only: the
    # plot's forward passes would be collectives that only one rank runs.
    if n_proc == 1 and rc.active and rc.model_kind == "active":
        try:
            from ..utils.qvis import visualize_Q_LR
            if hasattr(datasets.get("test"), "device_batches"):
                batches = list(datasets["test"].device_batches())[:2]
            else:
                batches = [tuple(b) for _, b in zip(range(2), batch_iterator(
                    datasets["test"], min(rc.batch_size, 8), shuffle=False))]
            visualize_Q_LR(params, rc.model_cfg, batches, dirs["q_vis"],
                           max_batches=2, sample_per_batch=1)
            say(f"[Q-vis] wrote plots to {dirs['q_vis']}")
        except Exception as e:           # plotting must never fail a run
            say(f"[Q-vis] skipped: {e}")

    logger.close()
    return {"run_dir": dirs["run"], "exp_name": exp_name, "history": history,
            "test": te, "best_tuple": best_tuple, "params": params}

"""Jitted train / eval steps with masked nonfinite handling.

The reference's robustness logic (train_biear.py:508-568) is host-driven:
``if not torch.isfinite(loss): continue`` and a post-clip python scan over
all grads. Under jit there is no data-dependent python control flow, so the
TPU-native equivalent is a masked update: the step always runs, and a
single on-device ``ok`` predicate (loss finite AND every gradient leaf
finite) selects between the updated and the previous (params, opt_state).
Semantics match the reference exactly — a "skipped" batch leaves both the
parameters and the Adam moments untouched and increments a skip counter —
without a single host sync.

Gradient-norm telemetry (frontend/backend global norms, nonfinite flags;
train_biear.py:189-224) is computed in the same jit for free.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import active_forward, passive_forward, auralnet_forward
from ..models.frontend import frontend_constants
from .losses import task_loss, q_regularizers, sanitize_x3, sanitize_wav
from .optim import TrainHyper


def is_better_tuple(curr, best, eps: float = 1e-12):
    """Lexicographic (sound_acc up, aoa_mae down, dist_acc up) checkpoint
    selection (train_biear.py:315-328)."""
    if best is None:
        return True
    cs, ca, cd = curr
    bs, ba, bd = best
    if cs > bs + eps:
        return True
    if abs(cs - bs) <= eps:
        if ca < ba - eps:
            return True
        if abs(ca - ba) <= eps and cd > bd + eps:
            return True
    return False


def _tree_finite(tree):
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)]
    return functools.reduce(jnp.logical_and, leaves, jnp.bool_(True))


def _group_norms(grads):
    """Global grad norms split frontend (bifb) / backend, plus nonfinite
    flags — the telemetry of train_biear.py:189-204."""
    fb = grads.get("bifb", {})
    be = {k: v for k, v in grads.items() if k != "bifb"}

    def norm(tree):
        leaves = jax.tree.leaves(tree)
        if not leaves:
            return jnp.float32(0.0)
        return jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                            for x in leaves))

    def absmax(tree):
        leaves = jax.tree.leaves(tree)
        if not leaves:
            return jnp.float32(0.0)
        return jnp.max(jnp.stack([jnp.max(jnp.abs(x)) for x in leaves]))

    return {
        "grad_fb_norm": norm(fb),
        "grad_backend_norm": norm(be),
        # distribution summaries (the TB-histogram substitute,
        # train_biear.py:206-222)
        "grad_fb_absmax": absmax(fb),
        "grad_backend_absmax": absmax(be),
        "grad_fb_finite": _tree_finite(fb).astype(jnp.float32),
        "grad_backend_finite": _tree_finite(be).astype(jnp.float32),
    }


# Magnitude-decade histogram edges shared by every gradient leaf: 16 bins
# over |g| in [1e-12, 1e4), plus underflow (zeros/denormals) and overflow
# buckets from searchsorted. Fixed bins keep the computation inside the one
# jitted step (data-dependent bin ranges would need a host sync).
GRAD_HIST_EDGES = np.logspace(-12.0, 4.0, 17).astype(np.float32)


def grad_hist_names(params, max_leaves: int):
    """Leaf names in the row order of the train step's grad_hist matrix."""
    paths = jax.tree_util.tree_leaves_with_path(params)[:max_leaves]
    return [jax.tree_util.keystr(p).replace("'", "").strip("[]")
            .replace("][", ".") for p, _ in paths]


def _grad_histograms(grads, max_leaves: int):
    """Per-leaf |grad| histograms, in-jit — the telemetry parity for the
    reference's per-tensor TB histograms capped at MAX_PARAM_LOG tensors
    (train_biear.py:206-222). Returns ONE stacked (n_leaves, n_buckets)
    float32 matrix so the host pull is a single (tiny) transfer — this
    image's TPU tunnel cannot transfer int arrays and charges latency per
    pull (memory: axon-tpu-quirks)."""
    edges = jnp.asarray(GRAD_HIST_EDGES)
    rows = []
    for _, g in jax.tree_util.tree_leaves_with_path(grads)[:max_leaves]:
        a = jnp.abs(g).reshape(-1)
        # count-above-threshold formulation: bucket k of searchsorted+
        # bincount is #{v: edges[k-1] < v <= edges[k]}, which is
        # gt[k-1]-gt[k] for gt[i] = #{v > edges[i]} — comparisons+reduces
        # only (scatter-free; TPU scatter-adds serialize). The reduce
        # accumulates in int32: float32 counts lose integer exactness past
        # 2^24 elements per leaf (the downstream stack converts to f32 for
        # the tunnel's f32-only transfer path, where the counts are already
        # final bucket totals).
        gt = jnp.sum(a[None, :] > edges[:, None], axis=1,
                     dtype=jnp.int32).astype(jnp.float32)
        n = jnp.float32(a.shape[0])
        rows.append(jnp.concatenate([
            (n - gt[0])[None], gt[:-1] - gt[1:], gt[-1][None]]))
    if not rows:
        return jnp.zeros((0, len(GRAD_HIST_EDGES) + 1), jnp.float32)
    return jnp.stack(rows).astype(jnp.float32)


def _active_loss(params, cfg, hp: TrainHyper, batch, rng, train, model: str):
    # An optional trailing (B,) weight vector marks padding rows of a
    # padded trailing partial batch (pipeline.batch_iterator pad_to_full):
    # zero-weight rows contribute nothing to loss or metrics, so every
    # batch has the same static shape and the step compiles exactly once.
    w = batch[4] if len(batch) == 5 else None
    wavL, wavR, x3, y = batch[:4]
    wavL, wavR = sanitize_wav(wavL, wavR)
    x3 = sanitize_x3(x3)
    fwd = auralnet_forward if model == "auralnet" else active_forward
    s, a, d, aux = fwd(params, cfg, wavL, wavR, x3, rng=rng, train=train)
    loss, metrics = task_loss(s, a, d, y.astype(jnp.float32),
                              hp.loss_w_sound, hp.loss_w_aoa, hp.loss_w_dist,
                              cfg.n_dist_class, w=w)
    if aux.get("Q") is not None:
        Q0 = frontend_constants(cfg)["Q0"]
        loss = loss + q_regularizers(aux["Q"], Q0, hp.reg_q_w,
                                     hp.reg_smooth_w, w=w)
        metrics["loss"] = loss
    return loss, metrics


def _passive_loss(params, cfg, hp: TrainHyper, batch, rng, train):
    w = batch[6].astype(jnp.float32) if len(batch) == 7 else None
    x1, x2, x3, x4, x5, y = (b.astype(jnp.float32) for b in batch[:6])
    s, a, d, _ = passive_forward(params, cfg, x1, x2, x3, x4, x5,
                                 rng=rng, train=train)
    return task_loss(s, a, d, y, hp.loss_w_sound, hp.loss_w_aoa,
                     hp.loss_w_dist, cfg.n_dist_class, w=w)


def _loss_fn(model: str):
    if model == "passive":
        return _passive_loss
    return functools.partial(_active_loss, model=model)


def _train_step_core(loss_impl, cfg, hp, optimizer, max_param_log,
                     params, opt_state, batch, rng, lr_scale):
    """Unjitted step body shared by the per-batch step and the fused
    multi-step chunk runner."""
    def lf(p):
        return loss_impl(p, cfg, hp, batch, rng, True)

    (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(params)

    updates, new_opt_state = optimizer.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: u * lr_scale, updates)
    new_params = optax.apply_updates(params, updates)

    ok = jnp.logical_and(jnp.isfinite(loss), _tree_finite(grads))
    sel = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(ok, n, o), new, old)
    params_out = sel(new_params, params)
    opt_state_out = sel(new_opt_state, opt_state)

    metrics = dict(metrics)
    metrics.update(_group_norms(grads))
    metrics["skipped"] = (1.0 - ok.astype(jnp.float32))
    metrics["grad_hist"] = _grad_histograms(grads, max_param_log)
    return params_out, opt_state_out, metrics


def make_train_step(cfg, hp: TrainHyper, optimizer, model: str = "active",
                    max_param_log: int = 200):
    """model: 'active' | 'passive' | 'auralnet'. Returns a jitted
    (params, opt_state, batch, rng, lr_scale) -> (params, opt_state, metrics).

    max_param_log caps the number of gradient leaves that get histogram
    telemetry (the reference's MAX_PARAM_LOG, train_biear.py:219). The
    histograms ride the same compilation; the runner only pulls them
    host-side every HIST_EVERY steps."""
    loss_impl = _loss_fn(model)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch, rng, lr_scale):
        return _train_step_core(loss_impl, cfg, hp, optimizer,
                                max_param_log, params, opt_state, batch,
                                rng, lr_scale)

    return train_step


def make_train_chunk(cfg, hp: TrainHyper, optimizer, model: str,
                     synth_batch_fn, chunk_steps: int,
                     max_param_log: int = 200):
    """Fused multi-step dispatch: CHUNK_STEPS (synthesize -> train step)
    iterations inside ONE jitted lax.scan.

    With on-device synthesis nothing in the inner loop needs the host, so
    running one dispatch per step leaves the chip idle for the host/tunnel
    round-trip latency between steps — on this image's tunnelled TPU that
    latency (~200 ms) exceeds the step compute by two orders of magnitude.
    One scan dispatch amortises it across the whole chunk.

    synth_batch_fn: pure (bank, key) -> batch tuple (from
    synth.batch_fn()). The synthesizer's device-array bank is threaded
    through the jit boundary as run_chunk's first argument — NEVER closed
    over: on this image's TPU tunnel a captured device array is
    re-streamed from the host on every USE, and a lax.scan pays that per
    iteration (~114 ms/step vs 2.4 ms with the argument path;
    tools/bench_chunk_probe.py, round 3).

    Returns jitted (bank, params, opt_state, rng, lr_scale) ->
    (params, opt_state, stacked-metrics) where every metric leaf gains a
    leading (chunk_steps,) axis. RNG contract matches _SynthSource + the
    per-batch path: per step, one key split into (synthesis, dropout)."""
    # Scan amortises dispatch latency, which flips the filterbank-bwd
    # crossover: the custom VJP wins the chunked path at EVERY measured
    # batch (64..2048, +11-16 %; docs/fb_vjp_*_small.json + the 512/1024
    # sweep), so "auto" resolves to it here regardless of batch size.
    if getattr(cfg, "fb_vjp", None) == "auto":
        cfg = dataclasses.replace(cfg, fb_vjp="custom")
    loss_impl = _loss_fn(model)

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def run_chunk(bank, params, opt_state, rng, lr_scale):
        def body(carry, k):
            params, opt_state = carry
            k_synth, k_step = jax.random.split(k)
            batch = synth_batch_fn(bank, k_synth)
            params, opt_state, m = _train_step_core(
                loss_impl, cfg, hp, optimizer, max_param_log,
                params, opt_state, batch, k_step, lr_scale)
            return (params, opt_state), m

        keys = jax.random.split(rng, chunk_steps)
        (params, opt_state), ms = jax.lax.scan(body, (params, opt_state),
                                               keys)
        return params, opt_state, ms

    return run_chunk


def make_eval_chunk(cfg, hp: TrainHyper, model: str = "active"):
    """Evaluate a whole stack of same-shape batches in ONE dispatch.

    batches: tuple of arrays with a leading (n_batches,) axis (a
    SynthEvalDataset stacked group). Returns metrics with that leading
    axis."""
    loss_impl = _loss_fn(model)

    @jax.jit
    def eval_chunk(params, batches):
        def body(_, b):
            _, m = loss_impl(params, cfg, hp, b, None, False)
            return None, m

        _, ms = jax.lax.scan(body, None, batches)
        return ms

    return eval_chunk


def make_eval_step(cfg, hp: TrainHyper, model: str = "active"):
    loss_impl = _loss_fn(model)

    @jax.jit
    def eval_step(params, batch):
        _, metrics = loss_impl(params, cfg, hp, batch, None, False)
        return metrics

    return eval_step

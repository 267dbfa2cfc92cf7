"""Gradient-histogram telemetry: in-jit per-leaf magnitude histograms
capped at MAX_PARAM_LOG (parity for train_biear.py:206-222), logged to
JSONL every HIST_EVERY steps."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biear_tpu.models import BiEARConfig
from biear_tpu.models.biear import init_active
from biear_tpu.train import (make_optimizer, TrainHyper, make_train_step)
from biear_tpu.train.loop import (grad_hist_names, GRAD_HIST_EDGES,
                                  _grad_histograms)


@pytest.fixture(scope="module")
def tiny():
    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24,
                      deltaQ_mode="relative")
    params = init_active(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_grad_histograms_counts(tiny):
    """Each row is a complete histogram of one leaf: counts sum to the
    leaf's element count and land in the right decade buckets."""
    _, params = tiny
    h = np.asarray(_grad_histograms(params, 10_000))
    leaves = jax.tree.leaves(params)
    assert h.shape == (len(leaves), len(GRAD_HIST_EDGES) + 1)
    np.testing.assert_array_equal(h.sum(1),
                                  [l.size for l in leaves])
    # a hand-made leaf: values 0 (underflow), 3e-6 (mid-bucket — an exact
    # power of ten would sit ON an edge, where f32 vs f64 searchsorted can
    # legitimately differ by one), 1e5 (overflow)
    g = {"a": jnp.asarray([0.0, 3e-6, 1e5], jnp.float32)}
    row = np.asarray(_grad_histograms(g, 10))[0]
    assert row[0] == 1 and row[-1] == 1 and row.sum() == 3
    bucket = np.searchsorted(GRAD_HIST_EDGES, np.float32(3e-6))
    assert row[bucket] == 1


def test_grad_hist_names_align_and_cap(tiny):
    _, params = tiny
    names = grad_hist_names(params, 10_000)
    assert len(names) == len(jax.tree.leaves(params))
    assert len(set(names)) == len(names)          # unique
    assert grad_hist_names(params, 7) == names[:7]
    h = np.asarray(_grad_histograms(params, 7))
    assert h.shape[0] == 7                        # MAX_PARAM_LOG consumed


@pytest.mark.slow
def test_train_step_emits_grad_hist(tiny, rng):
    cfg, params = tiny
    hp = TrainHyper()
    opt = make_optimizer(params, hp)
    step = make_train_step(cfg, hp, opt, "active", max_param_log=5)
    batch = (jnp.asarray(rng.uniform(-1, 1, (2, cfg.fs)), jnp.float32),
             jnp.asarray(rng.uniform(-1, 1, (2, cfg.fs)), jnp.float32),
             jnp.asarray(rng.uniform(-1, 1, (2, cfg.n_bands)), jnp.float32),
             jnp.zeros((2, 56), jnp.float32).at[:, 2].set(1.0))
    p = jax.tree.map(jnp.copy, params)
    _, _, m = step(p, opt.init(params), batch, jax.random.PRNGKey(0),
                   jnp.float32(1.0))
    h = np.asarray(m["grad_hist"])
    assert h.shape == (5, len(GRAD_HIST_EDGES) + 1)
    assert h.dtype == np.float32                  # tunnel-safe dtype
    assert (h >= 0).all()


@pytest.mark.slow
def test_runner_logs_histograms(tmp_path, rng):
    """End-to-end: HIST_EVERY=1 training writes 'kind: hist' JSONL records
    whose key count equals min(n_leaves, MAX_PARAM_LOG)."""
    from biear_tpu.config import load_run_config
    from biear_tpu.train.runner import train
    CONF = os.path.join(os.path.dirname(__file__), "..", "conf",
                        "config.yaml")
    rc = load_run_config(CONF)
    rc.runs_root = str(tmp_path / "runs")
    rc.root = str(tmp_path)
    rc.epochs = 1
    rc.batch_size = 4
    rc.hist_every = 1
    rc.max_param_log = 6
    rc.print_every = 1000
    rc.model_cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                               fmin=50.0, fmax=700.0, latent_dim=24,
                               deltaQ_mode="relative")

    from tests.test_padding import _active_ds
    ds = {k: _active_ds(rng, 8) for k in ("train", "val", "test")}
    out = train(rc, datasets=ds, quiet=True, run_id="H")
    jsonl = os.path.join(out["run_dir"], "logs_json", "scalars.jsonl")
    hists = [json.loads(l) for l in open(jsonl)
             if '"kind": "hist"' in l]
    assert hists, "no histogram records logged"
    rec = hists[0]
    keys = [k for k in rec if k.startswith("grads/")]
    assert len(keys) == 6                         # MAX_PARAM_LOG cap
    assert len(rec["edges"]) == len(GRAD_HIST_EDGES)
    assert all(len(rec[k]) == len(GRAD_HIST_EDGES) + 1 for k in keys)

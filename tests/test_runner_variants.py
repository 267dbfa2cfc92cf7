"""Runner end-to-end over the full experiment matrix: passive, fixed-Q,
single-controller, frozen-controller, AuralNet — every config the
reference's three YAML presets (plus the lost AuralNet driver) span."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biear_tpu.config import load_run_config
from biear_tpu.models.config import BiEARConfig
from biear_tpu.data import save_active_h5, save_passive_h5, ActiveH5Dataset, PassiveH5Dataset
from biear_tpu.train.runner import train

pytestmark = pytest.mark.slow  # quick tier: -m 'not slow'

CONF = os.path.join(os.path.dirname(__file__), "..", "conf", "config.yaml")


def _rc(tmp_path, **model_over):
    rc = load_run_config(CONF)
    rc.runs_root = str(tmp_path / "runs")
    rc.root = str(tmp_path)
    rc.epochs = 1
    rc.batch_size = 4
    rc.print_every = 1000
    rc.model_cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                               fmin=50.0, fmax=700.0, latent_dim=24,
                               d_model=32, attn_layers=1, **model_over)
    return rc


def _labels(rng, n):
    y = np.zeros((n, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    for b in range(n):
        s = rng.integers(0, 8)
        y[b, s, :3] = (1.0, rng.uniform(), 0.0)
        y[b, s, 3 + rng.integers(0, 4)] = 1.0
    return y.reshape(n, 56)


def _active_ds(tmp_path, rng, n=8):
    kw = dict(x1=rng.uniform(-1, 1, (n, 1600)).astype(np.float32),
              x2=rng.uniform(-1, 1, (n, 1600)).astype(np.float32),
              x3=rng.uniform(-1, 1, (n, 24)).astype(np.float32),
              y=_labels(rng, n))
    out = {}
    for s in ("train", "val", "test"):
        p = str(tmp_path / f"a_{s}.h5")
        save_active_h5(p, **kw)
        out[s] = ActiveH5Dataset(p)
    return out


def _passive_ds(tmp_path, rng, n=8):
    feats = rng.standard_normal((n, 4, 24)).astype(np.float32)
    out = {}
    for s in ("train", "val", "test"):
        p = str(tmp_path / f"p_{s}.h5")
        save_passive_h5(p, feats, feats, rng.standard_normal(
            (n, 24)).astype(np.float32), feats, feats, _labels(rng, n))
        out[s] = PassiveH5Dataset(p)
    return out


def _check(out):
    h = out["history"]
    assert len(h["train"]) == 1
    assert np.isfinite(h["train"][0]["loss"])
    assert h["train"][0]["skipped"] == 0
    assert out["test"] is not None and np.isfinite(out["test"]["loss"])


def test_runner_passive(tmp_path, rng):
    rc = _rc(tmp_path)
    rc.active = False
    rc.model_kind = "passive"
    _check(train(rc, datasets=_passive_ds(tmp_path, rng), quiet=True,
                 run_id="P"))


def test_runner_fixed_q(tmp_path, rng):
    rc = _rc(tmp_path, fixed_frontend_q=True)
    rc.fixed_frontend_q = True
    out = train(rc, datasets=_active_ds(tmp_path, rng), quiet=True,
                run_id="F")
    _check(out)
    # fixed-Q has no frontend params at all
    assert out["params"]["bifb"] == {}


def test_runner_single_controller(tmp_path, rng):
    rc = _rc(tmp_path, controller_mode="single", deltaQ_mode="absolute")
    rc.controller_mode = "single"
    out = train(rc, datasets=_active_ds(tmp_path, rng), quiet=True,
                run_id="S")
    _check(out)
    assert "ctrl" in out["params"]["bifb"]


def test_runner_frozen_controller(tmp_path, rng):
    rc = _rc(tmp_path)
    rc.freeze_q_controller_only = True
    ds = _active_ds(tmp_path, rng)
    out = train(rc, datasets=ds, quiet=True, run_id="Z")
    _check(out)
    # controller weights must be untouched after training (reproduce the
    # runner's init-key derivation: seed key split once before init)
    from biear_tpu.models.biear import init_active
    _, k_init = jax.random.split(jax.random.PRNGKey(0))
    fresh = init_active(k_init, rc.model_cfg)
    for a, b in zip(jax.tree.leaves(fresh["bifb"]),
                    jax.tree.leaves(out["params"]["bifb"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ...while the backend did train
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(fresh["body"]),
                        jax.tree.leaves(out["params"]["body"])))
    assert changed


def test_runner_auralnet(tmp_path, rng):
    rc = _rc(tmp_path, fixed_frontend_q=True)
    rc.model_kind = "auralnet"
    out = train(rc, datasets=_active_ds(tmp_path, rng), quiet=True,
                run_id="A")
    _check(out)
    assert "attn_L" in out["params"]


def test_auralnet_config_preset():
    rc = load_run_config(os.path.join(os.path.dirname(CONF),
                                      "config_auralnet_deepear.yaml"))
    assert rc.model_kind == "auralnet"
    assert rc.model_cfg.d_model == 128 and rc.model_cfg.n_bands == 100


def test_runner_synth_chunk_modes(tmp_path):
    """On-device synthesis trains through BOTH dispatch shapes: the fused
    lax.scan chunk (default) and the per-step path (SYNTH_CHUNK_STEPS: 1),
    with the stacked single-dispatch eval in each case."""
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)

    ir, az, dist = make_test_hrir_bank(m_per_sector=2, ir_len=64, fs=1600)
    segs = make_test_segments(n=4, seg_len=3200)

    for chunk_cfg in (-1, 1):
        rc = _rc(tmp_path / f"chunk{chunk_cfg}")
        rc.synth_on_device = True
        rc.raw["SYNTH_STEPS_PER_EPOCH"] = 4
        rc.raw["SYNTH_CHUNK_STEPS"] = chunk_cfg
        rc.raw["SYNTH_EVAL_SAMPLES"] = 8
        synth = AnechoicSynthesizer(ir, az, dist, segs, fs=1600, num_lags=24)
        out = train(rc, synth=synth, seed=0, quiet=True)
        _check(out)
        # epoch accounting: 4 steps trained either way
        sc = os.path.join(out["run_dir"], "logs_json", "scalars.jsonl")
        rows = [json.loads(l) for l in open(sc)]
        steps = [r["step"] for r in rows if "train_step/loss" in r]
        # both dispatch shapes log on the same HIST_EVERY grid — with 4
        # steps and the default HIST_EVERY=50 that is exactly step 0
        assert steps == [0]


def test_fb_w_dtype_validated_at_config_layer():
    """A typo like 'bf16' must fail loudly at BiEARConfig construction
    (it would otherwise silently fall through every == 'bfloat16' check
    onto the float32 hot op while claiming bf16 in telemetry)."""
    import pytest
    from biear_tpu.models import BiEARConfig

    BiEARConfig(fb_w_dtype="bfloat16")  # valid values construct fine
    BiEARConfig(fb_w_dtype="float32")
    with pytest.raises(ValueError, match="fb_w_dtype"):
        BiEARConfig(fb_w_dtype="bf16")


def test_eval_split_budget_env_read_per_instance(monkeypatch):
    """SYNTH_EVAL_HBM_BUDGET_MB must take effect when set AFTER importing
    the runner module (it used to be read once at class definition)."""
    from biear_tpu.data.synth import (AnechoicSynthesizer,
                                      make_test_hrir_bank,
                                      make_test_segments)
    from biear_tpu.train.runner import SynthEvalDataset

    ir, az, dist = make_test_hrir_bank(m_per_sector=2, ir_len=64, fs=1600)
    synth = AnechoicSynthesizer(ir, az, dist, make_test_segments(
        n=4, seg_len=3200), fs=1600, num_lags=24)

    monkeypatch.setenv("SYNTH_EVAL_HBM_BUDGET_MB", "0")  # force spill
    ds = SynthEvalDataset(synth, 8, seed=0, batch_size=4)
    assert ds.AUTO_BUDGET_MB == 0
    assert not ds.stacked_groups          # spilled to host numpy
    monkeypatch.setenv("SYNTH_EVAL_HBM_BUDGET_MB", "4096")
    ds2 = SynthEvalDataset(synth, 8, seed=0, batch_size=4)
    assert ds2.AUTO_BUDGET_MB == 4096
    assert ds2.stacked_groups             # tiny split stays on device

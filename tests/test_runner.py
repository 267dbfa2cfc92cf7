"""End-to-end runner tests: config loading, training orchestration,
checkpointing, evaluation round-trip."""

import dataclasses
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from biear_tpu.config import (load_run_config, make_exp_name, settings_dict,
                              h5_paths, load_settings_near_checkpoint,
                              config_from_settings)
from biear_tpu.models.config import BiEARConfig
from biear_tpu.data import save_active_h5, ActiveH5Dataset
from biear_tpu.train.runner import train
from biear_tpu.train.evaluate import evaluate
from biear_tpu.train import state as ckpt_mod

pytestmark = pytest.mark.slow  # quick tier: -m 'not slow'

CONF = os.path.join(os.path.dirname(__file__), "..", "conf", "config.yaml")


def test_load_run_config_canonical():
    rc = load_run_config(CONF)
    assert rc.batch_size == 64 and rc.epochs == 150
    assert rc.active and rc.use_cc and not rc.fixed_frontend_q
    assert rc.controller_mode == "dual"
    assert rc.model_cfg.deltaQ_mode == "relative"
    assert rc.hyper.lr_fb == pytest.approx(5e-5)
    assert rc.hyper.loss_w_aoa == pytest.approx(0.45)
    name, run_id = make_exp_name(rc, run_id="X")
    assert name.startswith("active_ctrl-dual_fixedq-0_type-adaptiveq")
    s = settings_dict(rc, run_id, name)
    # exact reference settings.json key set + our MODEL_KIND extension
    want_keys = {"ROOT", "BATCH_SIZE", "EPOCHS", "USE_CC", "Active",
                 "FIXED_FRONTEND_Q", "Controller_Mode", "ALPHA",
                 "WEIGHT_DECAY", "GRAD_CLIP_NORM", "LR_FB", "LR_BACKEND",
                 "REG_Q_W", "REG_SMOOTH_W", "FREEZE_Q_CONTROLLER_ONLY",
                 "LOSS_WEIGHT_SOUND", "LOSS_WEIGHT_AOA", "LOSS_WEIGHT_DIST",
                 "run_id", "exp_name", "DELTAQ_BASE", "DELTAQ_LOW_FACTOR",
                 "DELTAQ_HIGH_FACTOR", "DELTAQ_MODE", "comments",
                 "MODEL_KIND", "GEOMETRY", "MATMUL_PRECISION"}
    assert set(s) == want_keys
    p = h5_paths(rc)
    assert p["train"].endswith("anechoic_train_active_wav.h5")


def _tiny_rc(tmp_path, **over):
    rc = load_run_config(CONF)
    rc.runs_root = str(tmp_path / "runs")
    rc.root = str(tmp_path)
    rc.epochs = 2
    rc.batch_size = 4
    rc.print_every = 1000
    rc.model_cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                               fmin=50.0, fmax=700.0, latent_dim=24,
                               deltaQ_mode="relative", **over)
    return rc


def _tiny_h5(tmp_path, rng, n=12, fs=1600, bands=24):
    y = np.zeros((n, 8, 7), np.float32)
    y[:, :, 2] = 1.0
    for b in range(n):
        s = rng.integers(0, 8)
        y[b, s, 0] = 1.0; y[b, s, 1] = rng.uniform()
        y[b, s, 2:] = 0.0; y[b, s, 2 + rng.integers(1, 5)] = 1.0
    kw = dict(
        x1=rng.uniform(-1, 1, (n, fs)).astype(np.float32),
        x2=rng.uniform(-1, 1, (n, fs)).astype(np.float32),
        x3=rng.uniform(-1, 1, (n, bands)).astype(np.float32),
        y=y.reshape(n, 56))
    paths = {}
    for split in ("train", "val", "test"):
        p = str(tmp_path / f"{split}.h5")
        save_active_h5(p, **kw)
        paths[split] = p
    return {k: ActiveH5Dataset(v) for k, v in paths.items()}


def test_train_runner_end_to_end(tmp_path, rng):
    rc = _tiny_rc(tmp_path)
    ds = _tiny_h5(tmp_path, rng)
    out = train(rc, datasets=ds, quiet=True, run_id="T")

    run_dir = out["run_dir"]
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "best"))
    assert os.path.isdir(os.path.join(run_dir, "checkpoints", "last"))
    with open(os.path.join(run_dir, "meta", "settings.json")) as f:
        s = json.load(f)
    assert s["Active"] is True and s["run_id"] == "T"
    with open(os.path.join(run_dir, "logs_json", "history.json")) as f:
        h = json.load(f)
    assert len(h["train"]) == 2 and len(h["val"]) == 2
    assert os.path.exists(os.path.join(run_dir, "logs_json",
                                       "test_metrics.json"))
    assert os.path.exists(os.path.join(run_dir, "logs_json",
                                       "scalars.jsonl"))
    assert np.isfinite(h["train"][-1]["loss"])

    # ---- evaluate round-trip from the run's own settings.json ----
    best = os.path.join(run_dir, "checkpoints", "best")
    res = evaluate(best, dataset=ds["test"], batch_size=4, quiet=True,
                   out_path=str(tmp_path / "eval.json"))
    assert "overall" in res and "1spk" in res
    assert 0.0 <= res["overall"]["sound_acc"] <= 1.0
    with open(tmp_path / "eval.json") as f:
        assert "overall" in json.load(f)


def test_checkpoint_roundtrip(tmp_path):
    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24)
    from biear_tpu.models.biear import init_active
    params = init_active(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "ck")
    ckpt_mod.save_checkpoint(path, params, meta={"epoch": 3})
    p2, _, meta = ckpt_mod.load_checkpoint(path, params)
    assert meta["epoch"] == 3
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_export_roundtrip(tmp_path):
    """Our params -> torch .pth -> re-import == identity (interop check)."""
    cfg = BiEARConfig(fs=1600, timesteps=4, n_fft=256, n_bands=24,
                      fmin=50.0, fmax=700.0, latent_dim=24)
    from biear_tpu.models.biear import init_active
    from biear_tpu.utils import torch_import as ti
    params = init_active(jax.random.PRNGKey(1), cfg)
    p = str(tmp_path / "m.pth")
    ckpt_mod.export_torch_pth(p, params, cfg)
    back = ti.import_active(ti.load_state_dict(p), cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_settings_walk_and_rebuild(tmp_path):
    meta = tmp_path / "run" / "meta"
    os.makedirs(meta)
    (tmp_path / "run" / "checkpoints").mkdir()
    s = {"Active": True, "USE_CC": True, "Controller_Mode": "single",
         "DELTAQ_MODE": "absolute", "DELTAQ_BASE": 2.0}
    with open(meta / "settings.json", "w") as f:
        json.dump(s, f)
    got = load_settings_near_checkpoint(
        str(tmp_path / "run" / "checkpoints" / "best.pth"))
    assert got["Controller_Mode"] == "single"
    cfg, hp, _ = config_from_settings(got)
    assert cfg.controller_mode == "single"
    assert cfg.deltaQ_mode == "absolute" and cfg.deltaQ_base == 2.0


def test_resume_continues_training(tmp_path, rng):
    """Crash-resume: train 2 epochs, resume for 2 more from the same run
    dir; history extends and optimizer state carries over."""
    rc = _tiny_rc(tmp_path)
    ds = _tiny_h5(tmp_path, rng)
    out = train(rc, datasets=ds, quiet=True, run_id="R")
    run_dir = out["run_dir"]

    rc2 = _tiny_rc(tmp_path)
    rc2.epochs = 4
    out2 = train(rc2, datasets=ds, quiet=True, resume_from=run_dir)
    assert out2["run_dir"] == run_dir
    with open(os.path.join(run_dir, "logs_json", "history.json")) as f:
        h = json.load(f)
    assert len(h["train"]) == 4          # 2 original + 2 resumed
    # telemetry step axis continues across the resume (checkpoint meta
    # carries global_step; a reset to 0 would fold the resumed epochs
    # onto the original step grid)
    _, _, meta = ckpt_mod.load_checkpoint(
        os.path.join(run_dir, "checkpoints", "last"),
        out2["params"])
    spe = -(-len(ds["train"]) // rc.batch_size)
    assert int(meta["global_step"]) == 4 * spe


def test_evaluate_reference_pth_checkpoint(tmp_path, rng):
    """Interop: evaluate() consumes a raw torch state_dict (.pth) exactly
    like the reference's evaluator, recovering config from settings.json."""
    torch = pytest.importorskip("torch")
    from biear_tpu.models.biear import init_active
    from biear_tpu.train.state import export_torch_pth

    rc = _tiny_rc(tmp_path)
    cfg = rc.model_cfg
    params = init_active(jax.random.PRNGKey(3), cfg)

    run = tmp_path / "run"
    (run / "checkpoints").mkdir(parents=True)
    (run / "meta").mkdir()
    pth = str(run / "checkpoints" / "best.pth")
    export_torch_pth(pth, params, cfg)
    with open(run / "meta" / "settings.json", "w") as f:
        json.dump(settings_dict(rc, "X", "exp"), f)

    ds = _tiny_h5(tmp_path, rng)["test"]
    res = evaluate(pth, dataset=ds, batch_size=4, quiet=True,
                   out_path=str(tmp_path / "m.json"))
    assert "overall" in res and np.isfinite(res["overall"]["aoa_mae"])


def test_synth_eval_thirds_exact(tmp_path):
    """test_thirds chunks must not straddle third boundaries."""
    from biear_tpu.train.runner import SynthEvalDataset
    from biear_tpu.data import (AnechoicSynthesizer, make_test_hrir_bank,
                                make_test_segments)
    from biear_tpu.train import unpack_targets
    ir, az, dist = make_test_hrir_bank()
    s = AnechoicSynthesizer(ir, az, dist, make_test_segments(4))
    ds = SynthEvalDataset(s, 96, seed=0, batch_size=64, test_thirds=True)
    counts = []
    for b in ds.device_batches():
        ys = np.asarray(unpack_targets(b[3])[0])
        counts += ys.sum(1).astype(int).tolist()
    assert counts == [1] * 32 + [2] * 32 + [3] * 32


def test_skipped_batches_excluded_from_epoch_metrics(tmp_path, rng):
    """A poisoned batch must not NaN the epoch averages (reference
    train_biear.py:514-517 semantics)."""
    rc = _tiny_rc(tmp_path)
    rc.epochs = 1
    ds = _tiny_h5(tmp_path, rng)
    # poison ONE train batch's labels: rewrite the h5 with NaNs in rows 0-3
    import h5py
    with h5py.File(str(tmp_path / "train.h5"), "r+") as f:
        y = f["y"][:]
        y[8:12] = np.nan   # NOT rows 0-3: the sanity check reads those
        f["y"][...] = y
    ds["train"] = ActiveH5Dataset(str(tmp_path / "train.h5"))
    out = train(rc, datasets=ds, quiet=True, run_id="N")
    tr = out["history"]["train"][0]
    assert tr["skipped"] >= 1
    assert np.isfinite(tr["loss"])       # the NaN batch didn't poison it


def test_checkpoint_restores_across_topologies(tmp_path):
    """A checkpoint saved from params committed to an 8-device mesh must
    restore into a single-device template (the serve/eval topology) — the
    restore args come from the template, not the save-time device mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from biear_tpu.parallel.mesh import make_mesh
    from biear_tpu.train import state as ckpt

    mesh = make_mesh(4, 2)
    params = {"w": jnp.arange(32, dtype=jnp.float32).reshape(8, 4),
              "b": jnp.ones((8,), jnp.float32)}
    params = {"w": jax.device_put(params["w"],
                                  NamedSharding(mesh, P("data", "model"))),
              "b": jax.device_put(params["b"],
                                  NamedSharding(mesh, P("model")))}
    ckpt.save_checkpoint(str(tmp_path / "ck"), params, None, {"epoch": 1})

    dev0 = jax.devices()[0]
    like = {"w": jax.device_put(jnp.zeros((8, 4), jnp.float32), dev0),
            "b": jax.device_put(jnp.zeros((8,), jnp.float32), dev0)}
    restored, _, meta = ckpt.load_checkpoint(str(tmp_path / "ck"), like)
    assert meta["epoch"] == 1
    np.testing.assert_array_equal(
        np.asarray(restored["w"]),
        np.arange(32, dtype=np.float32).reshape(8, 4))
    assert restored["w"].sharding.device_set == {dev0}

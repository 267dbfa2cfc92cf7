"""Experiment configuration: the reference YAML contract + run folders.

Keeps the public compatibility surface of the reference
(train_biear.py:16-70): the same conf/config.yaml key set (mandatory keys
raise KeyError just like the eager reads there; DELTAQ_MODE keeps its
default), the slugged exp_name (train_biear.py:72-95), the run-dir tree
{tb, checkpoints, logs_json, q_vis, meta} and meta/settings.json with the
identical field set (train_biear.py:128-157) so the evaluator's
settings-roundtrip works on our runs too.

TPU-specific extensions are OPTIONAL keys with defaults (never required):
  MESH_DATA / MESH_MODEL   mesh axis sizes (-1 = all remaining devices)
  SYNTH_ON_DEVICE          replace the H5 train split with the on-device
                           anechoic synthesizer
  PRELOAD_H5               RAM-preload the H5 splits (default true)
  TIMESTEPS / N_FFT / N_BANDS  signal geometry overrides
  DATA_FORMAT / SHARD_ROOT h5 (default) or native mmap shards
                           (tools/h5_to_shard.py + data/native_loader.py)
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from datetime import datetime

import yaml

from .models.config import BiEARConfig
from .train.optim import TrainHyper


@dataclasses.dataclass
class RunConfig:
    """Everything train/evaluate need, parsed from one YAML."""
    root: str
    runs_root: str
    batch_size: int
    epochs: int
    active: bool
    use_cc: bool
    fixed_frontend_q: bool
    controller_mode: str
    freeze_q_controller_only: bool
    alpha: float
    comments: str
    print_every: int
    hist_every: int
    max_param_log: int
    save_every_epoch: bool
    model_cfg: BiEARConfig
    hyper: TrainHyper
    # TPU extensions
    mesh_data: int = -1
    mesh_model: int = 1
    synth_on_device: bool = False
    preload_h5: bool = True
    model_kind: str = "active"      # active | passive | auralnet
    matmul_precision: str = "default"
    data_format: str = "h5"         # h5 | shard (native mmap loader)
    shard_root: str = ""            # shard dir; defaults to ROOT
    raw: dict = dataclasses.field(default_factory=dict)


def _fb_w_dtype(v) -> str:
    """Validate FB_W_DTYPE eagerly: the frontend string-compares against
    'bfloat16' only, so a typo ('bf16') would silently run the ~3.6x
    slower float32/HIGHEST hot op while the run claims the bf16 policy."""
    s = str(v).lower()
    if s not in ("float32", "bfloat16"):
        raise ValueError(f"FB_W_DTYPE must be 'float32' or 'bfloat16', "
                         f"got {v!r}")
    return s


def _fb_vjp(v) -> str:
    """Validate FB_VJP eagerly (see BiEARConfig.fb_vjp): 'auto' resolves
    by the measured crossover, 'custom'/'autodiff' force an impl."""
    s = str(v).lower()
    if s not in ("auto", "custom", "autodiff"):
        raise ValueError(f"FB_VJP must be 'auto', 'custom' or 'autodiff', "
                         f"got {v!r}")
    return s


def _dft_mode(v) -> str:
    """Validate DFT_MODE eagerly (see BiEARConfig.dft_mode): 'auto' ties
    the MXU DFT-matmul spectra to the bf16-W production policy; 'fft' /
    'matmul' force an implementation."""
    s = str(v).lower()
    if s not in ("auto", "fft", "matmul"):
        raise ValueError(f"DFT_MODE must be 'auto', 'fft' or 'matmul', "
                         f"got {v!r}")
    return s


def _data_format(v) -> str:
    """Validate DATA_FORMAT eagerly. 'h5' reads the reference H5 schema;
    'shard' reads the native mmap shards (data/native_loader.py) written by
    tools/h5_to_shard.py — the production home of the C++ gather core."""
    s = str(v).lower()
    if s not in ("h5", "shard"):
        raise ValueError(f"DATA_FORMAT must be 'h5' or 'shard', got {v!r}")
    return s


def load_run_config(path: str) -> RunConfig:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)

    deltaq_mode = cfg.get("DELTAQ_MODE", "absolute")
    model_cfg = BiEARConfig(
        use_cc=bool(cfg["USE_CC"]),
        fixed_frontend_q=bool(cfg["FIXED_FRONTEND_Q"]),
        controller_mode=str(cfg["Controller_Mode"]).lower(),
        alpha=float(cfg["ALPHA"]),
        deltaQ_base=float(cfg["DELTAQ_BASE"]),
        deltaQ_low_factor=float(cfg["DELTAQ_LOW_FACTOR"]),
        deltaQ_high_factor=float(cfg["DELTAQ_HIGH_FACTOR"]),
        deltaQ_mode=deltaq_mode,
        timesteps=int(cfg.get("TIMESTEPS", 19)),
        n_fft=int(cfg.get("N_FFT", 1024)),
        n_bands=int(cfg.get("N_BANDS", 100)),
        d_model=int(cfg.get("D_MODEL", 128)),
        hop_ratio=float(cfg.get("HOP_RATIO", 1.0)),
        fs=int(cfg.get("FS", 16000)),
        fmin=float(cfg.get("FMIN", 50.0)),
        fmax=cfg.get("FMAX", None),
        latent_dim=int(cfg.get("LATENT_DIM", 100)),
        fb_w_dtype=_fb_w_dtype(cfg.get("FB_W_DTYPE", "float32")),
        fb_vjp=_fb_vjp(cfg.get("FB_VJP", "auto")),
        fb_x_grad=bool(cfg.get("FB_X_GRAD", False)),
        dft_mode=_dft_mode(cfg.get("DFT_MODE", "auto")),
    )
    hyper = TrainHyper(
        lr_fb=float(cfg["LR_FB"]),
        lr_backend=float(cfg["LR_BACKEND"]),
        weight_decay=float(cfg["WEIGHT_DECAY"]),
        grad_clip_norm=float(cfg["GRAD_CLIP_NORM"]),
        reg_q_w=float(cfg["REG_Q_W"]),
        reg_smooth_w=float(cfg["REG_SMOOTH_W"]),
        loss_w_sound=float(cfg["LOSS_WEIGHT_SOUND"]),
        loss_w_aoa=float(cfg["LOSS_WEIGHT_AOA"]),
        loss_w_dist=float(cfg["LOSS_WEIGHT_DIST"]),
    )
    active = bool(cfg["Active"])
    kind = str(cfg.get("MODEL_KIND", "active" if active else "passive")).lower()
    return RunConfig(
        root=str(cfg["ROOT"]),
        runs_root=str(cfg["RUNS_ROOT"]),
        batch_size=int(cfg["BATCH_SIZE"]),
        epochs=int(cfg["EPOCHS"]),
        active=active,
        use_cc=bool(cfg["USE_CC"]),
        fixed_frontend_q=bool(cfg["FIXED_FRONTEND_Q"]),
        controller_mode=str(cfg["Controller_Mode"]).lower(),
        freeze_q_controller_only=bool(cfg["FREEZE_Q_CONTROLLER_ONLY"]),
        alpha=float(cfg["ALPHA"]),
        comments=str(cfg.get("COMMENTS", "") or ""),
        print_every=int(cfg["PRINT_EVERY"]),
        hist_every=int(cfg["HIST_EVERY"]),
        max_param_log=int(cfg["MAX_PARAM_LOG"]),
        save_every_epoch=bool(cfg["SAVE_EVERY_EPOCH"]),
        model_cfg=model_cfg,
        hyper=hyper,
        mesh_data=int(cfg.get("MESH_DATA", -1)),
        mesh_model=int(cfg.get("MESH_MODEL", 1)),
        synth_on_device=bool(cfg.get("SYNTH_ON_DEVICE", False)),
        preload_h5=bool(cfg.get("PRELOAD_H5", True)),
        model_kind=kind,
        matmul_precision=str(cfg.get("MATMUL_PRECISION", "default")).lower(),
        data_format=_data_format(cfg.get("DATA_FORMAT", "h5")),
        shard_root=str(cfg.get("SHARD_ROOT", "") or ""),
        raw=cfg,
    )


_PRECISION_NAMES = ("default", "bfloat16", "tensorfloat32", "high",
                    "highest", "float32")


def apply_matmul_precision(name: str) -> str:
    """Set the process-wide default matmul precision policy.

    THE PRECISION POLICY: on TPU, jnp matmuls/einsums without an explicit
    precision run the MXU in bf16-input mode ("default") — fastest, and the
    production default for the GRU/Linear backend. The physics-critical
    filterbank contractions always pin Precision.HIGHEST explicitly
    (ops/filterbank.py:61-63) regardless of this policy, so the frontend's
    numbers are f32-class in every mode. Parity with the torch reference is
    certified at "highest" (tests/test_model_parity.py); the measured
    default-vs-highest delta on hardware is covered by
    tests/test_precision.py::test_tpu_precision_policy_tolerance.
    """
    name = str(name).lower()
    if name not in _PRECISION_NAMES:
        raise ValueError(f"MATMUL_PRECISION must be one of "
                         f"{_PRECISION_NAMES}, got {name!r}")
    if name != "default":
        import jax
        jax.config.update("jax_default_matmul_precision", name)
    return name


def _slug(x: str) -> str:
    x = str(x).strip().lower()
    x = re.sub(r"\s+", "-", x)
    x = re.sub(r"[^a-z0-9_\-\.]+", "", x)
    return x[:120]


def make_exp_name(rc: RunConfig, run_id: str | None = None) -> tuple[str, str]:
    """The slugged experiment-name convention (train_biear.py:79-95)."""
    if run_id is None:
        run_id = datetime.now().strftime("%Y%m%d-%H%M%S")
    hp = rc.hyper
    qtype = "fixedQ" if rc.fixed_frontend_q else "adaptiveQ"
    m = rc.model_cfg
    parts = [
        "active" if rc.active else "passive",
        f"ctrl-{rc.controller_mode}",
        f"fixedq-{int(rc.fixed_frontend_q and rc.active)}",
        f"type-{qtype.lower()}",
        f"alpha{rc.alpha:g}",
        f"cc-{int(rc.use_cc)}",
        f"qctrlfrozen-{int(rc.freeze_q_controller_only and rc.active)}",
        f"bs{rc.batch_size}",
        f"lrfb{hp.lr_fb:g}",
        f"lrbe{hp.lr_backend:g}",
        f"wd{hp.weight_decay:g}",
        f"lossw{hp.loss_w_sound:.2f}_{hp.loss_w_aoa:.2f}_{hp.loss_w_dist:.2f}",
        f"run{run_id}",
        f"dq{m.deltaQ_base:g}_lo{m.deltaQ_low_factor:g}"
        f"_hi{m.deltaQ_high_factor:g}_{m.deltaQ_mode[:3]}",
    ]
    if rc.comments:
        parts.append(_slug(rc.comments))
    return "_".join(parts), run_id


def make_run_dirs(rc: RunConfig, exp_name: str, create: bool = True) -> dict:
    """Run-tree paths; create=False computes them without touching disk
    (non-main processes of a multi-process run must not write the tree)."""
    run_dir = os.path.join(rc.runs_root, exp_name)
    dirs = {
        "run": run_dir,
        "tb": os.path.join(run_dir, "tb"),
        "checkpoints": os.path.join(run_dir, "checkpoints"),
        "logs_json": os.path.join(run_dir, "logs_json"),
        "q_vis": os.path.join(run_dir, "q_vis"),
        "meta": os.path.join(run_dir, "meta"),
    }
    if create:
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
    return dirs


def settings_dict(rc: RunConfig, run_id: str, exp_name: str) -> dict:
    """meta/settings.json field-set parity (train_biear.py:128-154)."""
    hp = rc.hyper
    m = rc.model_cfg
    return dict(
        ROOT=rc.root,
        BATCH_SIZE=rc.batch_size,
        EPOCHS=rc.epochs,
        USE_CC=rc.use_cc,
        Active=rc.active,
        FIXED_FRONTEND_Q=rc.fixed_frontend_q,
        Controller_Mode=rc.controller_mode,
        ALPHA=rc.alpha,
        WEIGHT_DECAY=hp.weight_decay,
        GRAD_CLIP_NORM=hp.grad_clip_norm,
        LR_FB=hp.lr_fb,
        LR_BACKEND=hp.lr_backend,
        REG_Q_W=hp.reg_q_w,
        REG_SMOOTH_W=hp.reg_smooth_w,
        FREEZE_Q_CONTROLLER_ONLY=rc.freeze_q_controller_only,
        LOSS_WEIGHT_SOUND=hp.loss_w_sound,
        LOSS_WEIGHT_AOA=hp.loss_w_aoa,
        LOSS_WEIGHT_DIST=hp.loss_w_dist,
        run_id=run_id,
        exp_name=exp_name,
        DELTAQ_BASE=m.deltaQ_base,
        DELTAQ_LOW_FACTOR=m.deltaQ_low_factor,
        DELTAQ_HIGH_FACTOR=m.deltaQ_high_factor,
        DELTAQ_MODE=m.deltaQ_mode,
        MODEL_KIND=rc.model_kind,
        MATMUL_PRECISION=rc.matmul_precision,
        comments=rc.comments,
        # Extension: full signal geometry, so evaluate can rebuild any
        # non-default model (the reference hardcodes these).
        GEOMETRY=dict(FS=m.fs, TIMESTEPS=m.timesteps, N_FFT=m.n_fft,
                      N_BANDS=m.n_bands, FMIN=m.fmin, FMAX=m.fmax,
                      HOP_RATIO=m.hop_ratio, LATENT_DIM=m.latent_dim,
                      D_MODEL=m.d_model, FB_W_DTYPE=m.fb_w_dtype,
                      FB_VJP=m.fb_vjp, FB_X_GRAD=m.fb_x_grad,
                      DFT_MODE=m.dft_mode),
    )


def h5_paths(rc: RunConfig) -> dict:
    """The data-path convention (train_biear.py:159-167)."""
    if rc.active:
        return {
            "train": f"{rc.root}/anechoic_train_active_wav.h5",
            "val": f"{rc.root}/anechoic_val_active_wav.h5",
            "test": f"{rc.root}/anechoic_test1_active_wav.h5",
        }
    return {
        "train": f"{rc.root}/anechoic_train_gt_group_phase.h5",
        "val": f"{rc.root}/anechoic_val_gt_group_phase.h5",
        "test": f"{rc.root}/anechoic_test2_gt_group_phase.h5",
    }


def data_paths(rc: RunConfig) -> dict:
    """Split -> file path under the configured DATA_FORMAT.

    'h5' keeps the reference convention verbatim (h5_paths). 'shard' maps
    the same basenames to `.shard` files under SHARD_ROOT (default: ROOT) —
    produced by `tools/h5_to_shard.py <split>.h5 <split>.shard`."""
    paths = h5_paths(rc)
    if rc.data_format == "h5":
        return paths
    root = rc.shard_root or rc.root
    return {k: os.path.join(root, os.path.basename(v)[:-3] + ".shard")
            for k, v in paths.items()}


def load_settings_near_checkpoint(ckpt_path: str) -> dict | None:
    """Walk up from a checkpoint path to meta/settings.json
    (evaluate_biear.py:43-60)."""
    d = os.path.dirname(os.path.abspath(ckpt_path))
    for parent in (d, os.path.dirname(d), os.path.dirname(os.path.dirname(d))):
        p = os.path.join(parent, "meta", "settings.json")
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)
    return None


def config_from_settings(s: dict) -> tuple[BiEARConfig, TrainHyper, dict]:
    """Rebuild model/hyper config from a settings.json dict
    (evaluate_biear.py:62-104 defaults included)."""
    g = s.get("GEOMETRY", {})
    model_cfg = BiEARConfig(
        use_cc=bool(s.get("USE_CC", True)),
        fixed_frontend_q=bool(s.get("FIXED_FRONTEND_Q", False)),
        controller_mode=str(s.get("Controller_Mode", "dual")).lower(),
        alpha=float(s.get("ALPHA", 0)),
        deltaQ_base=float(s.get("DELTAQ_BASE", 1.0)),
        deltaQ_low_factor=float(s.get("DELTAQ_LOW_FACTOR", 0.3)),
        deltaQ_high_factor=float(s.get("DELTAQ_HIGH_FACTOR", 5.0)),
        deltaQ_mode=str(s.get("DELTAQ_MODE", "relative")),
        fs=int(g.get("FS", 16000)),
        timesteps=int(g.get("TIMESTEPS", 19)),
        n_fft=int(g.get("N_FFT", 1024)),
        n_bands=int(g.get("N_BANDS", 100)),
        fmin=float(g.get("FMIN", 50.0)),
        fmax=g.get("FMAX", None),
        hop_ratio=float(g.get("HOP_RATIO", 1.0)),
        latent_dim=int(g.get("LATENT_DIM", 100)),
        d_model=int(g.get("D_MODEL", 128)),
        fb_w_dtype=_fb_w_dtype(g.get("FB_W_DTYPE", "float32")),
        fb_vjp=_fb_vjp(g.get("FB_VJP", "auto")),
        fb_x_grad=bool(g.get("FB_X_GRAD", False)),
        # Missing key = settings.json written before the DFT_MODE knob
        # existed; those checkpoints trained on the rFFT spectra path, so
        # re-evaluate with it too ('auto' would silently switch a bf16-W
        # checkpoint to the matmul spectra, a ~1e-3 shift vs training).
        dft_mode=_dft_mode(g.get("DFT_MODE", "fft")),
    )
    hyper = TrainHyper(
        loss_w_sound=float(s.get("LOSS_WEIGHT_SOUND", 0.2)),
        loss_w_aoa=float(s.get("LOSS_WEIGHT_AOA", 0.45)),
        loss_w_dist=float(s.get("LOSS_WEIGHT_DIST", 0.35)),
        reg_q_w=float(s.get("REG_Q_W", 1e-3)),
        reg_smooth_w=float(s.get("REG_SMOOTH_W", 1e-3)),
    )
    return model_cfg, hyper, s

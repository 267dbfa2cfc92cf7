"""Evaluation: overall + per-source-count metrics from a checkpoint.

Parity surface: evaluate_biear.py — settings.json round-trip from the
checkpoint path, the exact train-identical metric definitions over ALL
N x 8 sectors, the per-n_src in {1,2,3} breakdown (test sets are built
1/3-1/3-1/3 by source count), degree-space AoA extraction, and the
evaluate_biear_metrics.json output. Also loads the reference's raw torch
.pth checkpoints directly (our layer layout makes that a key-map).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_settings_near_checkpoint, config_from_settings
from ..models import active_forward, passive_forward, auralnet_forward
from ..models.biear import init_active, init_passive
from ..models.auralnet import init_auralnet
from ..data.h5io import ActiveH5Dataset, PassiveH5Dataset
from ..data.pipeline import batch_iterator
from ..utils import torch_import as ti
from .losses import sanitize_x3, sanitize_wav
from . import state as ckpt

N_SECTORS = 8


def load_params(checkpoint_path: str, cfg, model_kind: str = "active"):
    """Restore params from an orbax dir or a reference .pth file."""
    if checkpoint_path.endswith((".pth", ".pt")):
        sd = ti.load_state_dict(checkpoint_path)
        if model_kind == "auralnet":
            return ti.import_auralnet(sd, cfg)
        if model_kind == "passive":
            return ti.import_passive(sd, cfg)
        return ti.import_active(sd, cfg)
    init = {"auralnet": init_auralnet, "passive": init_passive}.get(
        model_kind, init_active)
    like = init(jax.random.PRNGKey(0), cfg)
    params, _, _ = ckpt.load_checkpoint(checkpoint_path, like)
    return params


def _collect_predictions(params, cfg, ds, batch_size: int, active: bool,
                         model_kind: str):
    souts, aouts, douts, ys = [], [], [], []
    fwd_active = auralnet_forward if model_kind == "auralnet" else active_forward

    @jax.jit
    def step_active(p, wavL, wavR, x3):
        wavL, wavR = sanitize_wav(wavL, wavR)
        return fwd_active(p, cfg, wavL, wavR, sanitize_x3(x3),
                          train=False)[:3]

    @jax.jit
    def step_passive(p, x1, x2, x3, x4, x5):
        return passive_forward(p, cfg, x1, x2, x3, x4, x5, train=False)[:3]

    # pad_to_full keeps the jitted step at ONE compilation even when the
    # split size is not a batch multiple (9,000 % 64 = a 40-row tail in the
    # reference protocol); padding rows are sliced off after prediction.
    for batch in batch_iterator(ds, batch_size, shuffle=False,
                                pad_to_full=True):
        batch = tuple(jnp.asarray(b) for b in batch)
        valid = np.asarray(batch[-1]) > 0.5
        if active:
            wavL, wavR, x3, y = batch[:4]
            s, a, d = step_active(params, wavL, wavR, x3)
        else:
            x1, x2, x3, x4, x5, y = batch[:6]
            s, a, d = step_passive(params, x1, x2, x3, x4, x5)
        souts.append(np.asarray(s)[valid]); aouts.append(np.asarray(a)[valid])
        douts.append(np.asarray(d)[valid]); ys.append(np.asarray(y)[valid])
    return (np.concatenate(souts), np.concatenate(aouts),
            np.concatenate(douts), np.concatenate(ys))


def extract_gt_arrays(y_all):
    """(evaluate_biear.py:209-242): GT presence / normalised+degree AoA /
    distance class, with degree AoA NaN-masked on empty sectors."""
    N = y_all.shape[0]
    yr = y_all.reshape(N, N_SECTORS, 7)
    sound_gt = yr[:, :, 0]
    aoa_gt_norm = yr[:, :, 1]
    dist_gt = yr[:, :, 2:].argmax(-1).astype(np.int64)
    aoa_gt_deg = np.full((N, N_SECTORS), np.nan, np.float32)
    for k in range(N_SECTORS):
        mask = sound_gt[:, k] > 0.5
        aoa_gt_deg[mask, k] = 45.0 * k + aoa_gt_norm[mask, k] * 45.0
    return sound_gt, aoa_gt_norm, aoa_gt_deg, dist_gt


def extract_pred_arrays(sound_logits, aoa_pred, dist_logits,
                        sound_thresh: float = 0.5):
    """(evaluate_biear.py:249-284)."""
    sound_prob = 1.0 / (1.0 + np.exp(-sound_logits))
    dist_cls = dist_logits.argmax(-1).astype(np.int64)
    N = sound_prob.shape[0]
    aoa_deg = np.full((N, N_SECTORS), np.nan, np.float32)
    for k in range(N_SECTORS):
        mask = sound_prob[:, k] > sound_thresh
        aoa_deg[mask, k] = 45.0 * k + aoa_pred[mask, k] * 45.0
    return sound_prob, aoa_pred.astype(np.float32), aoa_deg, dist_cls


def compute_metrics_like_train(sound_gt, sound_pred, aoa_gt_norm,
                               aoa_pred_norm, dist_gt, dist_pred,
                               aoa_gt_deg=None, aoa_pred_deg=None):
    """(evaluate_biear.py:380-393): all-sector averages, train-identical.

    When the NaN-masked degree arrays (extract_*_arrays) are provided, the
    output additionally carries degree-space AoA error figures — the
    reference builds those arrays (evaluate_biear.py:209-284) but never
    reports them; here they land in the metrics JSON:
      aoa_mae_deg         all-sector normalised MAE x 45 (sector width)
      aoa_mae_deg_masked  mean |pred - gt| degrees over sectors where both
                          GT and prediction are present
      aoa_masked_sectors  count of such sectors"""
    sound_acc = np.mean((sound_gt > 0.5) == (sound_pred > 0.5))
    aoa_mae = np.mean(np.abs(aoa_pred_norm.astype(np.float64)
                             - aoa_gt_norm.astype(np.float64)))
    dist_acc = np.mean(dist_pred.flatten() == dist_gt.flatten())
    out = {"sound_acc": float(sound_acc), "aoa_mae": float(aoa_mae),
           "dist_acc": float(dist_acc)}
    if aoa_gt_deg is not None and aoa_pred_deg is not None:
        out["aoa_mae_deg"] = float(aoa_mae * 45.0)
        both = np.isfinite(aoa_gt_deg) & np.isfinite(aoa_pred_deg)
        out["aoa_masked_sectors"] = int(both.sum())
        out["aoa_mae_deg_masked"] = (
            float(np.mean(np.abs(aoa_pred_deg[both] - aoa_gt_deg[both])))
            if both.any() else float("nan"))
    return out


def evaluate(checkpoint_path: str, test_h5: str | None = None,
             batch_size: int = 64, out_path: str | None = None,
             settings: dict | None = None, dataset=None,
             quiet: bool = False) -> dict:
    """Full evaluation pipeline; returns {overall, 1spk, 2spk, 3spk}."""
    say = (lambda *a: None) if quiet else print
    if settings is None:
        settings = load_settings_near_checkpoint(checkpoint_path)
    if settings is None:
        raise ValueError("no meta/settings.json found near checkpoint; "
                         "pass settings= explicitly")
    cfg, _, s = config_from_settings(settings)
    # evaluate under the same precision policy the run trained with
    from ..config import apply_matmul_precision
    apply_matmul_precision(s.get("MATMUL_PRECISION", "default"))
    active = bool(s.get("Active", True))
    model_kind = str(s.get("MODEL_KIND", "active" if active else "passive"))

    params = load_params(checkpoint_path, cfg, model_kind)

    if dataset is None:
        if test_h5 is None:
            root = s["ROOT"]
            test_h5 = (f"{root}/anechoic_test2_active_wav.h5" if active
                       else f"{root}/anechoic_test2_gt_group_phase.h5")
        if test_h5.endswith(".shard"):
            # native mmap shards (DATA_FORMAT: shard / tools/h5_to_shard.py)
            from ..data.native_loader import ShardDataset
            tb = (cfg.timesteps, cfg.n_bands)
            shapes = ([(cfg.fs,), (cfg.fs,), (cfg.n_bands,), (56,)] if active
                      else [tb, tb, (cfg.n_bands,), tb, tb, (56,)])
            dataset = ShardDataset(test_h5, shapes=shapes)
        else:
            DS = ActiveH5Dataset if active else PassiveH5Dataset
            dataset = DS(test_h5)

    s_all, a_all, d_all, y_all = _collect_predictions(
        params, cfg, dataset, batch_size, active, model_kind)

    sound_gt, aoa_gt_norm, aoa_gt_deg, dist_gt = extract_gt_arrays(y_all)
    sound_pred, aoa_pred_norm, aoa_pred_deg, dist_pred = extract_pred_arrays(
        s_all, a_all, d_all)

    overall = compute_metrics_like_train(sound_gt, sound_pred, aoa_gt_norm,
                                         aoa_pred_norm, dist_gt, dist_pred,
                                         aoa_gt_deg, aoa_pred_deg)
    say(f"overall: sound_acc={overall['sound_acc']*100:.2f}% "
        f"aoa_mae={overall['aoa_mae']:.4f} "
        f"({overall['aoa_mae_deg']:.2f} deg; masked "
        f"{overall['aoa_mae_deg_masked']:.2f} deg) "
        f"dist_acc={overall['dist_acc']*100:.2f}%")

    out = {"overall": overall}
    n_sources = (sound_gt > 0.5).sum(1)
    for n_src in (1, 2, 3):
        m = n_sources == n_src
        if m.sum() == 0:
            continue
        out[f"{n_src}spk"] = compute_metrics_like_train(
            sound_gt[m], sound_pred[m], aoa_gt_norm[m], aoa_pred_norm[m],
            dist_gt[m], dist_pred[m], aoa_gt_deg[m], aoa_pred_deg[m])
        say(f"  n_src={n_src} ({int(m.sum())} samples): {out[f'{n_src}spk']}")

    if out_path is None:
        ckpt_dir = os.path.dirname(os.path.abspath(checkpoint_path))
        out_path = os.path.join(ckpt_dir, "..", "evaluate_biear_metrics.json")
    try:
        with open(os.path.abspath(out_path), "w") as f:
            json.dump(out, f, indent=2)
        say(f"Saved metrics to {os.path.abspath(out_path)}")
    except OSError as e:                  # pragma: no cover
        say(f"Could not save metrics: {e}")
    return out

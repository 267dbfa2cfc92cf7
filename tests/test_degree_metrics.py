"""Degree-space AoA metrics in the evaluation output (VERDICT r1 weak #7:
the degree arrays were built but never reported)."""

import numpy as np

from biear_tpu.train.evaluate import (extract_gt_arrays, extract_pred_arrays,
                                      compute_metrics_like_train)


def _y_for(sectors_norm):
    """One sample: dict sector -> (norm_angle, dist_class 1..4)."""
    y = np.zeros((8, 7), np.float32)
    y[:, 2] = 1.0
    for s, (norm, dc) in sectors_norm.items():
        y[s, 0] = 1.0
        y[s, 1] = norm
        y[s, 2:] = 0.0
        y[s, 2 + dc] = 1.0
    return y.reshape(56)


def test_degree_metrics_exact():
    # GT: sector 1 at norm 0.5 -> 67.5deg ; sector 4 at norm 0.2 -> 189deg
    y = np.stack([_y_for({1: (0.5, 2)}), _y_for({4: (0.2, 3)})])
    sound_gt, aoa_gt_norm, aoa_gt_deg, dist_gt = extract_gt_arrays(y)
    assert np.isclose(aoa_gt_deg[0, 1], 67.5)
    assert np.isclose(aoa_gt_deg[1, 4], 189.0)
    assert np.isnan(aoa_gt_deg[0, 0])

    # predictions: sector 1 predicted at norm 0.6 (+4.5deg), sector 4 at
    # norm 0.2 (exact); strong logits so presence matches GT
    logits = np.full((2, 8), -9.0, np.float32)
    logits[0, 1] = 9.0
    logits[1, 4] = 9.0
    aoa_pred = np.zeros((2, 8), np.float32)
    aoa_pred[0, 1] = 0.6
    aoa_pred[1, 4] = 0.2
    dist_logits = np.zeros((2, 8, 5), np.float32)
    dist_logits[:, :, 0] = 5.0
    dist_logits[0, 1] = [0, 0, 5, 0, 0]
    dist_logits[1, 4] = [0, 0, 0, 5, 0]

    sound_pred, aoa_pred_norm, aoa_pred_deg, dist_pred = extract_pred_arrays(
        logits, aoa_pred, dist_logits)
    m = compute_metrics_like_train(sound_gt, sound_pred, aoa_gt_norm,
                                   aoa_pred_norm, dist_gt, dist_pred,
                                   aoa_gt_deg, aoa_pred_deg)
    assert m["sound_acc"] == 1.0 and m["dist_acc"] == 1.0
    # masked degree MAE over the two matched sectors: (4.5 + 0) / 2
    assert m["aoa_masked_sectors"] == 2
    assert np.isclose(m["aoa_mae_deg_masked"], 2.25)
    # all-sector degree MAE = normalized MAE x 45
    assert np.isclose(m["aoa_mae_deg"], m["aoa_mae"] * 45.0)


def test_degree_metrics_no_overlap():
    y = np.stack([_y_for({2: (0.5, 1)})])
    sound_gt, aoa_gt_norm, aoa_gt_deg, dist_gt = extract_gt_arrays(y)
    logits = np.full((1, 8), -9.0, np.float32)   # no predicted presence
    aoa_pred = np.zeros((1, 8), np.float32)
    dist_logits = np.zeros((1, 8, 5), np.float32)
    sound_pred, aoa_pred_norm, aoa_pred_deg, dist_pred = extract_pred_arrays(
        logits, aoa_pred, dist_logits)
    m = compute_metrics_like_train(sound_gt, sound_pred, aoa_gt_norm,
                                   aoa_pred_norm, dist_gt, dist_pred,
                                   aoa_gt_deg, aoa_pred_deg)
    assert m["aoa_masked_sectors"] == 0
    assert np.isnan(m["aoa_mae_deg_masked"])

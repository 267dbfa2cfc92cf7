"""Losses, metrics and input sanitisation.

Parity surface: train_biear.py:226-243 (target unpacking), 417-443 (loss
trio + metric definitions), 479-491 (Q regularisers), 306-313 and 463-470
(input hygiene). Everything is jit-compatible: the reference's host-side
``.item()`` heuristics become traced ``jnp.where`` selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def unpack_targets(y, n_sectors: int = 8, n_dist_class: int = 5):
    """y (B, 56) -> (y_sound (B, 8), y_aoa (B, 8), y_dist (B, 8, C)).

    Layout: per sector k the 7-dim slice [sound, aoa, onehot5] at offset 7k
    (train_biear.py:226-243). A pure reshape — the loop in the reference is
    just a strided view."""
    B = y.shape[0]
    y = y.reshape(B, n_sectors, 2 + n_dist_class)
    return y[:, :, 0], y[:, :, 1], y[:, :, 2:]


def _batch_mean(x, w=None):
    """Mean over all elements of x (B, ...), optionally weighted by a
    per-sample w (B,). With w=None or w=ones this is exactly jnp.mean(x);
    zero-weight rows (padding of a trailing partial batch) contribute
    nothing, so metrics/losses on a padded batch equal those on the
    unpadded one."""
    if w is None:
        return jnp.mean(x)
    wx = w.reshape(w.shape[0], *([1] * (x.ndim - 1)))
    denom = jnp.maximum(jnp.sum(w), 1e-8) * (x.size // x.shape[0])
    return jnp.sum(x * wx) / denom


def bce_pos_weight(logits, targets, pos_weight: float = 3.0, w=None):
    """BCEWithLogitsLoss(pos_weight=3) mean, computed stably.

    l = pw * y * softplus(-x) + (1 - y) * softplus(x)."""
    sp = jax.nn.softplus
    l = pos_weight * targets * sp(-logits) + (1.0 - targets) * sp(logits)
    return _batch_mean(l, w)


def smooth_l1(pred, target, beta: float = 0.02, w=None):
    """torch SmoothL1Loss(beta) mean."""
    d = jnp.abs(pred - target)
    return _batch_mean(jnp.where(d < beta, 0.5 * d * d / beta,
                                 d - 0.5 * beta), w)


def cross_entropy(logits, target_idx, w=None):
    """Mean CE over integer class targets (logits (B, S, C) or (M, C))."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    l = -jnp.take_along_axis(logp, target_idx[..., None], axis=-1)[..., 0]
    return _batch_mean(l, w)


def task_loss(sound_logits, aoa_pred, dist_logits, y,
              w_sound: float = 0.2, w_aoa: float = 0.45, w_dist: float = 0.35,
              n_dist_class: int = 5, w=None):
    """Weighted task loss + train-time metrics (train_biear.py:422-443).

    w: optional (B,) per-sample weights (1 real row / 0 padding row); the
    trailing partial batch of an epoch is padded to the full batch size so
    the jitted step compiles exactly once, and the zero weights keep the
    numbers identical to an unpadded evaluation."""
    y_sound, y_aoa, y_dist = unpack_targets(y, sound_logits.shape[1],
                                            n_dist_class)
    dist_target = jnp.argmax(y_dist, axis=-1)                # (B, S)

    loss_sound = bce_pos_weight(sound_logits, y_sound, w=w)
    loss_aoa = smooth_l1(aoa_pred, y_aoa, w=w)
    loss_dist = cross_entropy(dist_logits, dist_target, w=w)
    loss = w_sound * loss_sound + w_aoa * loss_aoa + w_dist * loss_dist

    sound_acc = _batch_mean(((jax.nn.sigmoid(sound_logits) > 0.5)
                             == (y_sound > 0.5)).astype(jnp.float32), w)
    aoa_mae = _batch_mean(jnp.abs(aoa_pred - y_aoa), w)
    dist_acc = _batch_mean((jnp.argmax(dist_logits, axis=-1)
                            == dist_target).astype(jnp.float32), w)
    metrics = {"loss": loss, "sound_acc": sound_acc, "aoa_mae": aoa_mae,
               "dist_acc": dist_acc}
    return loss, metrics


def q_regularizers(Q, Q0, reg_q_w: float, reg_smooth_w: float, w=None):
    """log-Q deviation + band-smoothness penalties (train_biear.py:483-491).

    Q (B, T, N), Q0 (N,)."""
    logQ = jnp.log(Q + 1e-8)
    logQ0 = jnp.log(Q0 + 1e-8)[None, None, :]
    reg_q = _batch_mean((logQ - logQ0) ** 2, w)
    reg_smooth = _batch_mean((logQ[:, :, 1:] - logQ[:, :, :-1]) ** 2, w)
    return reg_q_w * reg_q + reg_smooth_w * reg_smooth


def sanitize_x3(x3):
    """nan -> 0, per-sample peak-normalise (floor 1), clamp +-5
    (train_biear.py:306-313)."""
    x3 = jnp.nan_to_num(x3.astype(jnp.float32), nan=0.0, posinf=0.0, neginf=0.0)
    scale = jnp.maximum(jnp.max(jnp.abs(x3), axis=1, keepdims=True), 1.0)
    return jnp.clip(x3 / scale, -5.0, 5.0)


def sanitize_wav(wavL, wavR):
    """int16-heuristic rescale then clamp +-1 (train_biear.py:463-470).

    The reference's host-side ``.item()`` check becomes a traced select so
    the whole step stays inside one jit."""
    wavL = wavL.astype(jnp.float32)
    wavR = wavR.astype(jnp.float32)
    maxabs = jnp.maximum(jnp.max(jnp.abs(wavL)), jnp.max(jnp.abs(wavR)))
    scale = jnp.where(maxabs > 2.0, 1.0 / 32768.0, 1.0)
    return (jnp.clip(wavL * scale, -1.0, 1.0),
            jnp.clip(wavR * scale, -1.0, 1.0))

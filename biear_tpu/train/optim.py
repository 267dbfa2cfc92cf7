"""Optimizer: two param groups (frontend / backend) with per-group clipping,
torch-Adam numerics, and a host-driven plateau LR scale.

Parity surface: train_biear.py:360-379 (group split: everything under
``bifb`` is frontend), 523-527 (per-group clip 0.2 / 3.0), 610-627 (Adam
with L2-style weight decay, eps=1e-7, per-group LRs;
ReduceLROnPlateau(0.5, 10)).

TPU-native shape: the groups are an optax.multi_transform over a label
pytree derived from parameter paths; the plateau factor is a scalar fed
into the jitted step (no re-jit on LR drops).
"""

from __future__ import annotations

import dataclasses

import jax
import optax


@dataclasses.dataclass(frozen=True)
class TrainHyper:
    lr_fb: float = 5e-5
    lr_backend: float = 1e-4
    weight_decay: float = 1e-5
    clip_fb: float = 0.2
    clip_backend: float = 3.0
    grad_clip_norm: float = 3.0      # global clip when no frontend group
    adam_eps: float = 1e-7
    reg_q_w: float = 1e-3
    reg_smooth_w: float = 1e-3
    loss_w_sound: float = 0.2
    loss_w_aoa: float = 0.45
    loss_w_dist: float = 0.35
    pos_weight: float = 3.0


def _torch_adam(lr: float, wd: float, eps: float, clip: float):
    """clip -> L2 weight decay folded into the gradient -> Adam -> -lr.

    Matches torch.optim.Adam(weight_decay=wd, eps=eps) preceded by
    clip_grad_norm_(clip): decay is added to the *clipped* gradient before
    the moment updates, exactly like torch."""
    return optax.chain(
        optax.clip_by_global_norm(clip),
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(eps=eps),
        optax.scale(-lr),
    )


def param_labels(params):
    """'frontend' for every leaf under the top-level 'bifb' subtree,
    'backend' otherwise (train_biear.py:369-378)."""
    return {
        k: jax.tree.map(lambda _: "frontend" if k == "bifb" else "backend", v)
        for k, v in params.items()
    }


def make_optimizer(params, hp: TrainHyper, freeze_controller: bool = False):
    """Two-group optimizer; collapses to a single global-clip Adam when the
    frontend group is empty (fixed-Q frontends have no parameters —
    train_biear.py:610-623).

    freeze_controller replicates FREEZE_Q_CONTROLLER_ONLY
    (train_biear.py:251-274): the controller (= the whole bifb subtree) gets
    zero updates and the rest trains under the global clip, exactly like the
    reference's empty-frontend-group fallback."""
    labels = param_labels(params)
    if freeze_controller:
        labels = jax.tree.map(
            lambda lbl: "frozen" if lbl == "frontend" else lbl, labels)
        return optax.multi_transform(
            {
                "frozen": optax.set_to_zero(),
                "backend": _torch_adam(hp.lr_backend, hp.weight_decay,
                                       hp.adam_eps, hp.grad_clip_norm),
            },
            labels,
        )
    has_frontend = any(
        lbl == "frontend" for lbl in jax.tree.leaves(labels)
    )
    if not has_frontend:
        return optax.chain(
            optax.clip_by_global_norm(hp.grad_clip_norm),
            optax.add_decayed_weights(hp.weight_decay),
            optax.scale_by_adam(eps=hp.adam_eps),
            optax.scale(-hp.lr_backend),
        )
    return optax.multi_transform(
        {
            "frontend": _torch_adam(hp.lr_fb, hp.weight_decay, hp.adam_eps,
                                    hp.clip_fb),
            "backend": _torch_adam(hp.lr_backend, hp.weight_decay,
                                   hp.adam_eps, hp.clip_backend),
        },
        labels,
    )


class PlateauScheduler:
    """Host-side ReduceLROnPlateau(mode=min, factor, patience) with torch's
    default relative threshold 1e-4. Emits a scalar multiplier applied to
    the (already -lr scaled) updates inside the jitted step, so LR drops
    never trigger recompilation."""

    def __init__(self, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        import math
        if not math.isfinite(metric):
            self.num_bad += 1
        elif metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale *= self.factor
            self.num_bad = 0
        return self.scale

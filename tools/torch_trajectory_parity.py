"""End-to-end training-TRAJECTORY parity vs the actual PyTorch reference.

Forward parity (tests/test_model_parity.py) pins eval-mode outputs, and the
loss / optimizer numerics are unit-tested against torch functionals
(tests/test_train.py) — but neither runs the reference's *training loop
semantics* end to end. This harness does: starting from identical weights,
it runs K steps of

  torch side (the reference's own loop, /root/reference/train_biear.py):
    forward (model_torch.py:1065-1112, BPTT state built over the 19-frame
    Python loop, model_torch.py:333-380)
    -> task loss + Q regularizers        (train_biear.py:417-443, 479-491)
    -> loss.backward()                   (train_biear.py:521)
    -> clip_grad_norm_(fb, 0.2) / clip_grad_norm_(backend, 3.0)
                                         (train_biear.py:523-527)
    -> Adam(param_groups, wd=1e-5, eps=1e-7, LR 5e-5/1e-4).step()
                                         (train_biear.py:610-623)

  our side: the SHIPPED jitted train step (biear_tpu.train.loop
    make_train_step + optim.make_optimizer) — value_and_grad through the
    lax.scan BPTT, optax multi_transform per-group clip->decay->Adam.

on identical batches, and compares per-step loss trajectories plus the
final parameters (torch final state_dict imported back through
utils.torch_import so the comparison is leaf-by-leaf in our pytree layout).

Dropout is the one training-mode behavior that cannot be RNG-matched
across frameworks, so both sides run with it disabled (torch modules in
.eval() mode with grads enabled; our config with dropout rates 0).
Everything else is the real training path on both sides.

Run standalone for the JSON artifact:
    python tools/torch_trajectory_parity.py --steps 30 --batch 8 \
        --out docs/torch_trajectory_parity.json
The slow-tier test (tests/test_torch_trajectory.py) calls run_parity().
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

REFERENCE_DIR = "/root/reference"


# ---------------------------------------------------------------- batches

def make_batches(seed: int, steps: int, batch: int, fs: int = 16000):
    """Deterministic (wavL, wavR, x3, y) batches with reference-shaped
    labels: per sector [presence, angle_norm, onehot5] with distance class
    0 = no-source (create_h5_data/data_save.py:75-119)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(steps):
        wavL = (rng.uniform(-1, 1, (batch, fs)) * 0.5).astype(np.float32)
        wavR = (rng.uniform(-1, 1, (batch, fs)) * 0.5).astype(np.float32)
        x3 = rng.uniform(-1, 1, (batch, 100)).astype(np.float32)
        y = np.zeros((batch, 8, 7), np.float32)
        for b in range(batch):
            secs = rng.choice(8, rng.integers(1, 4), replace=False)
            for s in range(8):
                if s in secs:
                    y[b, s, 0] = 1.0
                    y[b, s, 1] = rng.uniform(0.0, 1.0)
                    y[b, s, 2 + rng.integers(1, 5)] = 1.0
                else:
                    y[b, s, 2] = 1.0
        out.append((wavL, wavR, x3, y.reshape(batch, 56)))
    return out


FLAGSHIP = dict(deltaQ_base=1.0, deltaQ_low_factor=0.3,
                deltaQ_high_factor=5.0, deltaQ_mode="relative")


# ---------------------------------------------------------------- torch side

def run_torch(batches, seed: int = 0, perturb: float = 0.05,
              fixed_q: bool = False):
    """The reference's training-loop semantics, verbatim (see module doc).

    Returns (per-step losses, final state_dict as numpy). The controller
    output layer is zero-initialised in the reference (Q starts at Q0);
    perturb>0 seeds it with small random weights so the Q feedback path
    and its BPTT gradients are genuinely exercised from step 1. fixed_q
    exercises the reference's empty-frontend-group fallback: single Adam
    group at LR_BACKEND with the global GRAD_CLIP_NORM=3.0
    (train_biear.py:525-527, 612-616)."""
    import torch
    from torch import nn
    sys.path.insert(0, REFERENCE_DIR)
    import model_torch as ref_model

    torch.manual_seed(seed)
    tm = ref_model.build_model_active(use_cc=True, fb_alpha=0.2,
                                      fixed_frontend_q=fixed_q, **FLAGSHIP)
    if perturb and not fixed_q:
        with torch.no_grad():
            for m in (tm.bifb.fb_L.q_out[-1], tm.bifb.fb_R.q_out[-1]):
                m.weight.uniform_(-perturb, perturb)
                m.bias.uniform_(-perturb, perturb)
    init_sd = {k: v.detach().cpu().numpy().copy()
               for k, v in tm.state_dict().items()}
    tm.eval()  # dropout off; grads stay enabled below

    # param groups exactly as train_biear.py:360-379
    fb_params = [p for p in tm.bifb.parameters() if p.requires_grad]
    fb_ids = {id(p) for p in fb_params}
    be_params = [p for p in tm.parameters()
                 if p.requires_grad and id(p) not in fb_ids]
    if fb_params:
        groups = [{"params": fb_params, "lr": 5e-5},
                  {"params": be_params, "lr": 1e-4}]
    else:                                  # train_biear.py:612 fallback
        groups = [{"params": be_params, "lr": 1e-4}]
    opt = torch.optim.Adam(groups, weight_decay=1e-5, eps=1e-7)

    pos_weight = torch.full((8,), 3.0)
    bce = nn.BCEWithLogitsLoss(pos_weight=pos_weight)
    aoa_loss_fn = nn.SmoothL1Loss(beta=0.02)
    ce = nn.CrossEntropyLoss()

    def sanitize_x3(x3):                     # train_biear.py:306-313
        x3 = torch.nan_to_num(x3.float(), nan=0.0, posinf=0.0, neginf=0.0)
        scale = torch.clamp(x3.abs().amax(dim=1, keepdim=True), min=1.0)
        return torch.clamp(x3 / scale, -5.0, 5.0)

    losses = []
    for wavL, wavR, x3, y in batches:
        opt.zero_grad(set_to_none=True)
        wavL_t = torch.clamp(torch.tensor(wavL), -1.0, 1.0)
        wavR_t = torch.clamp(torch.tensor(wavR), -1.0, 1.0)
        x3_t = sanitize_x3(torch.tensor(x3))
        y_t = torch.tensor(y)

        sound, aoa, dist = tm(wavL_t, wavR_t, x3_t)
        y_r = y_t.reshape(-1, 8, 7)
        y_sound, y_aoa, y_dist = y_r[:, :, 0], y_r[:, :, 1], y_r[:, :, 2:]
        loss = (0.2 * bce(sound, y_sound)
                + 0.45 * aoa_loss_fn(aoa, y_aoa)
                + 0.35 * ce(dist.reshape(-1, 5),
                            y_dist.argmax(dim=-1).reshape(-1)))
        Q = tm.last_Q                        # train_biear.py:479-491
        if Q is not None:
            Q0 = tm.bifb.Q0.view(1, 1, -1)
            logQ, logQ0 = torch.log(Q + 1e-8), torch.log(Q0 + 1e-8)
            loss = (loss + 1e-3 * ((logQ - logQ0) ** 2).mean()
                    + 1e-3 * ((logQ[:, :, 1:] - logQ[:, :, :-1]) ** 2).mean())

        loss.backward()                      # train_biear.py:521
        if fb_params:                        # train_biear.py:523-527
            torch.nn.utils.clip_grad_norm_(fb_params, 0.2)
            torch.nn.utils.clip_grad_norm_(be_params, 3.0)
        else:
            torch.nn.utils.clip_grad_norm_(list(tm.parameters()), 3.0)
        opt.step()
        losses.append(float(loss.item()))

    final_sd = {k: v.detach().cpu().numpy().copy()
                for k, v in tm.state_dict().items()}
    return init_sd, losses, final_sd


# ---------------------------------------------------------------- our side

def run_ours(init_sd, batches, fixed_q: bool = False):
    """Our shipped train step (make_train_step + make_optimizer) from the
    torch init, on the same batches. Returns (losses, final params)."""
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    from biear_tpu.models import BiEARConfig
    from biear_tpu.train.loop import make_train_step
    from biear_tpu.train.optim import TrainHyper, make_optimizer
    from biear_tpu.utils import torch_import as ti

    cfg = BiEARConfig(controller_mode="dual", use_cc=True,
                      fixed_frontend_q=fixed_q, ctrl_dropout=0.0,
                      backend_dropout=0.0, **FLAGSHIP)
    params = ti.import_active(init_sd, cfg)
    hp = TrainHyper()
    optimizer = make_optimizer(params, hp)
    opt_state = optimizer.init(params)
    step = make_train_step(cfg, hp, optimizer, "active")

    losses = []
    key = jax.random.PRNGKey(0)  # dropout disabled; key is inert
    for wavL, wavR, x3, y in batches:
        batch = tuple(jnp.asarray(a) for a in (wavL, wavR, x3, y))
        params, opt_state, m = step(params, opt_state, batch, key,
                                    jnp.float32(1.0))
        losses.append(float(m["loss"]))
    return losses, params


def compare_params(cfg_like_final_sd, final_params, fixed_q: bool = False):
    """Leaf-by-leaf |ours - torch| in our pytree layout. Returns summary
    dict {max_abs, max_rel_to_update, per_leaf top offenders}."""
    import jax
    from biear_tpu.models import BiEARConfig
    from biear_tpu.utils import torch_import as ti

    cfg = BiEARConfig(controller_mode="dual", use_cc=True,
                      fixed_frontend_q=fixed_q, **FLAGSHIP)
    torch_final = ti.import_active(cfg_like_final_sd, cfg)

    diffs = {}
    for (path, ours), (_, theirs) in zip(
            jax.tree_util.tree_leaves_with_path(final_params),
            jax.tree_util.tree_leaves_with_path(torch_final)):
        name = jax.tree_util.keystr(path)
        d = np.abs(np.asarray(ours) - np.asarray(theirs))
        diffs[name] = float(d.max())
    return diffs


def run_parity(steps: int, batch: int, seed: int = 0, fixed_q: bool = False):
    batches = make_batches(seed=seed + 1, steps=steps, batch=batch)
    init_sd, t_losses, final_sd = run_torch(batches, seed=seed,
                                            fixed_q=fixed_q)
    j_losses, final_params = run_ours(init_sd, batches, fixed_q=fixed_q)
    diffs = compare_params(final_sd, final_params, fixed_q=fixed_q)
    loss_abs = [abs(a - b) for a, b in zip(t_losses, j_losses)]
    return {
        "steps": steps,
        "batch": batch,
        "fixed_q": fixed_q,
        "torch_losses": t_losses,
        "jax_losses": j_losses,
        "loss_max_abs_diff": max(loss_abs),
        "loss_final_abs_diff": loss_abs[-1],
        "param_max_abs_diff": max(diffs.values()),
        "param_diffs_top": dict(sorted(diffs.items(),
                                       key=lambda kv: -kv[1])[:10]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fixed-q", action="store_true")
    ap.add_argument("--out", default="docs/torch_trajectory_parity.json")
    args = ap.parse_args()

    res = run_parity(args.steps, args.batch, args.seed, fixed_q=args.fixed_q)
    for i, (t, j) in enumerate(zip(res["torch_losses"], res["jax_losses"])):
        print(f"step {i:3d}  torch {t:.6f}  jax {j:.6f}  |d| {abs(t-j):.2e}")
    print(f"loss max|d| {res['loss_max_abs_diff']:.3e}  "
          f"param max|d| {res['param_max_abs_diff']:.3e}")
    with open(args.out, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()

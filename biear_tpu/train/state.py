"""Checkpointing: orbax for native state, plus torch-format export.

The reference saves raw model state_dicts (train_biear.py:661,668,672) with
best/last/epochNNN naming and NO optimizer state (so no true resume). We
keep the naming scheme but save full train state (params + optimizer
moments + counters) via orbax, giving real crash-resume — and offer a
torch-layout .pth export for drop-in use with the reference's evaluator.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, params, opt_state=None, meta: dict | None = None):
    """Write a checkpoint directory {params/, opt_state/, meta.json}.

    Multi-process: orbax's save is a COLLECTIVE (it runs a
    sync_global_processes barrier internally), so EVERY rank must call
    this — a lone rank-0 caller deadlocks against ranks that moved on.
    Actual file writes still happen on the primary host only; non-main
    ranks touch no files (meta.json and directory creation are explicitly
    rank-0-gated here). Cross-process arrays are pulled to host numpy
    first — legal exactly when they are fully replicated (pure-DP training
    state, the production mesh); a cross-process *model-sharded* state
    fails loudly here instead of writing a partial tree."""
    path = os.path.abspath(path)
    is_main = jax.process_index() == 0
    if is_main:
        os.makedirs(path, exist_ok=True)
    if jax.process_count() > 1:
        def to_host(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                if not x.is_fully_replicated:
                    raise ValueError(
                        "host-numpy checkpointing needs fully-replicated "
                        f"cross-process arrays; got sharding {x.sharding}")
                return np.asarray(x)
            return x
        params = jax.tree.map(to_host, params)
        if opt_state is not None:
            opt_state = jax.tree.map(to_host, opt_state)
    with ocp.PyTreeCheckpointer() as cp:
        cp.save(os.path.join(path, "params"), params, force=True)
        if opt_state is not None:
            cp.save(os.path.join(path, "opt_state"), opt_state, force=True)
    if is_main and meta is not None:
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2)


def load_checkpoint(path: str, params_like, opt_state_like=None):
    """Restore (params[, opt_state], meta). *_like provide the pytree
    structure AND target shardings: restore args are constructed from the
    template so a checkpoint written on one topology (e.g. an 8-device
    training mesh) restores onto another (a single eval chip) — without
    this, orbax falls back to the device mesh recorded at save time and
    errors when those devices don't exist here."""
    from orbax.checkpoint import checkpoint_utils
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as cp:
        params = cp.restore(
            os.path.join(path, "params"), item=params_like,
            restore_args=checkpoint_utils.construct_restore_args(params_like))
        opt_state = None
        if opt_state_like is not None and os.path.isdir(
                os.path.join(path, "opt_state")):
            opt_state = cp.restore(
                os.path.join(path, "opt_state"), item=opt_state_like,
                restore_args=checkpoint_utils.construct_restore_args(
                    opt_state_like))
    meta = None
    mp = os.path.join(path, "meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            meta = json.load(f)
    return params, opt_state, meta


# ---------------- torch-format interop ----------------

def _np(x):
    return np.asarray(x)


def _put_lin(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["w"])
    sd[f"{prefix}.bias"] = _np(p["b"])


def _put_ln(sd, prefix, p):
    sd[f"{prefix}.weight"] = _np(p["g"])
    sd[f"{prefix}.bias"] = _np(p["b"])


def _put_gru(sd, prefix, p):
    sd[f"{prefix}.weight_ih_l0"] = _np(p["w_ih"])
    sd[f"{prefix}.weight_hh_l0"] = _np(p["w_hh"])
    sd[f"{prefix}.bias_ih_l0"] = _np(p["b_ih"])
    sd[f"{prefix}.bias_hh_l0"] = _np(p["b_hh"])


def _put_controller(sd, prefix, p):
    _put_gru(sd, f"{prefix}.q_rnn", p["q_rnn"])
    q = p["q_out"]
    _put_lin(sd, f"{prefix}.q_out.0", q["l1"])
    _put_ln(sd, f"{prefix}.q_out.1", q["ln1"])
    _put_lin(sd, f"{prefix}.q_out.4", q["l2"])
    _put_ln(sd, f"{prefix}.q_out.5", q["ln2"])
    _put_lin(sd, f"{prefix}.q_out.8", q["l3"])


def to_torch_state_dict(params, cfg) -> dict:
    """Our active/passive param pytree -> reference torch state_dict
    (numpy values), loadable by the reference evaluate_biear.py."""
    sd: dict = {}
    for enc in ("encoder_ild", "encoder_ipd"):
        if enc in params:
            _put_ln(sd, f"{enc}.in_norm", params[enc]["in_norm"])
            _put_gru(sd, f"{enc}.gru1", params[enc]["gru1"])
            _put_gru(sd, f"{enc}.gru2", params[enc]["gru2"])
    if "cc_proj" in params:
        _put_lin(sd, "cc_proj", params["cc_proj"])
    if "body" in params:
        for i, k in zip((0, 3, 6), ("l1", "l2", "l3")):
            _put_lin(sd, f"body.{i}", params["body"][k])
    if "subheads" in params:
        sh = params["subheads"]
        n = sh["shared"]["w"].shape[0]
        for k in range(n):
            take = lambda p: jax.tree.map(lambda a: a[k], p)
            _put_lin(sd, f"subheads.{k}.shared.0", take(sh["shared"]))
            for branch in ("sound", "aoa", "dist"):
                for j, i in enumerate((0, 2, 4)):
                    _put_lin(sd, f"subheads.{k}.{branch}.{i}",
                             take(sh[branch][j]))
    bifb = params.get("bifb") or {}
    if "fb" in bifb:
        for e, ear in enumerate(("fb_L", "fb_R")):
            _put_controller(sd, f"bifb.{ear}",
                            jax.tree.map(lambda a: a[e], bifb["fb"]))
    elif "ctrl" in bifb:
        _put_controller(sd, "bifb", bifb["ctrl"])
    return sd


def export_torch_pth(path: str, params, cfg):
    """Save a reference-compatible .pth (requires torch)."""
    import torch
    sd = {k: torch.tensor(v) for k, v in to_torch_state_dict(params, cfg).items()}
    torch.save(sd, path)

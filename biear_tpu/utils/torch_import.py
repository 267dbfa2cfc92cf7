"""Import PyTorch reference checkpoints into biear_tpu parameter pytrees.

The reference ships raw ``state_dict`` checkpoints (train_biear.py:661,
optionally wrapped in {"state_dict": ...} / {"model": ...},
evaluate_biear.py:182-188). Because our layer library deliberately uses the
torch weight layout (Linear (out, in), GRU packed r/z/n gates), conversion
is pure key-mapping — no transposes except where noted.

Works on plain numpy-array dicts, so callers can strip tensors with
``{k: v.numpy() for k, v in sd.items()}`` and this module needs no torch.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.config import BiEARConfig


def load_state_dict(path):
    """Load a .pth checkpoint into a numpy dict (requires torch)."""
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if isinstance(obj, dict) and "model" in obj and not hasattr(obj["model"], "shape"):
        obj = obj["model"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()}


def _j(a):
    return jnp.asarray(np.asarray(a), jnp.float32)


def _gru(sd, prefix):
    return {
        "w_ih": _j(sd[f"{prefix}.weight_ih_l0"]),
        "w_hh": _j(sd[f"{prefix}.weight_hh_l0"]),
        "b_ih": _j(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh": _j(sd[f"{prefix}.bias_hh_l0"]),
    }


def _lin(sd, prefix):
    return {"w": _j(sd[f"{prefix}.weight"]), "b": _j(sd[f"{prefix}.bias"])}


def _ln(sd, prefix):
    return {"g": _j(sd[f"{prefix}.weight"]), "b": _j(sd[f"{prefix}.bias"])}


def _controller(sd, prefix):
    """q_rnn + q_out Sequential(0 Lin, 1 LN, 2 SiLU, 3 Drop, 4 Lin, 5 LN,
    6 SiLU, 7 Drop, 8 Lin) -> our controller pytree."""
    return {
        "q_rnn": _gru(sd, f"{prefix}.q_rnn"),
        "q_out": {
            "l1": _lin(sd, f"{prefix}.q_out.0"),
            "ln1": _ln(sd, f"{prefix}.q_out.1"),
            "l2": _lin(sd, f"{prefix}.q_out.4"),
            "ln2": _ln(sd, f"{prefix}.q_out.5"),
            "l3": _lin(sd, f"{prefix}.q_out.8"),
        },
    }


def _encoder(sd, prefix):
    return {
        "in_norm": _ln(sd, f"{prefix}.in_norm"),
        "gru1": _gru(sd, f"{prefix}.gru1"),
        "gru2": _gru(sd, f"{prefix}.gru2"),
    }


def _body(sd, prefix="body"):
    return {"l1": _lin(sd, f"{prefix}.0"), "l2": _lin(sd, f"{prefix}.3"),
            "l3": _lin(sd, f"{prefix}.6")}


def _subheads(sd, n_sectors: int):
    def one(k):
        pre = f"subheads.{k}"
        return {
            "shared": _lin(sd, f"{pre}.shared.0"),
            "sound": [_lin(sd, f"{pre}.sound.{i}") for i in (0, 2, 4)],
            "aoa": [_lin(sd, f"{pre}.aoa.{i}") for i in (0, 2, 4)],
            "dist": [_lin(sd, f"{pre}.dist.{i}") for i in (0, 2, 4)],
        }

    import jax
    heads = [one(k) for k in range(n_sectors)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *heads)


def _backend(sd, cfg: BiEARConfig):
    p = {
        "encoder_ild": _encoder(sd, "encoder_ild"),
        "encoder_ipd": _encoder(sd, "encoder_ipd"),
        "body": _body(sd),
        "subheads": _subheads(sd, cfg.n_sectors),
    }
    if cfg.use_cc:
        p["cc_proj"] = _lin(sd, "cc_proj")
    return p


def import_active(sd, cfg: BiEARConfig):
    """DeepEarActiveWaveform state_dict -> our active-model pytree."""
    import jax
    p = _backend(sd, cfg)
    if cfg.fixed_frontend_q:
        p["bifb"] = {}
    elif cfg.controller_mode == "single":
        p["bifb"] = {"ctrl": _controller(sd, "bifb")}
    else:
        cL = _controller(sd, "bifb.fb_L")
        cR = _controller(sd, "bifb.fb_R")
        p["bifb"] = {"fb": jax.tree.map(lambda a, b: jnp.stack([a, b]), cL, cR)}
    return p


def import_passive(sd, cfg: BiEARConfig):
    """DeepEarTorchILD state_dict -> our passive-model pytree."""
    return _backend(sd, cfg)


def _attn_block(sd, prefix, n_layers: int):
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.encoder.layers.{i}"
        layers.append({
            "self_attn": {
                "in_proj_w": _j(sd[f"{lp}.self_attn.in_proj_weight"]),
                "in_proj_b": _j(sd[f"{lp}.self_attn.in_proj_bias"]),
                "out_proj": _lin(sd, f"{lp}.self_attn.out_proj"),
            },
            "norm1": _ln(sd, f"{lp}.norm1"),
            "norm2": _ln(sd, f"{lp}.norm2"),
            "linear1": _lin(sd, f"{lp}.linear1"),
            "linear2": _lin(sd, f"{lp}.linear2"),
        })
    return {"proj": _lin(sd, f"{prefix}.proj"), "layers": layers}


def import_auralnet(sd, cfg: BiEARConfig):
    """AuralNetActiveWaveform state_dict -> our pytree."""
    p = {
        "attn_L": _attn_block(sd, "attn_L", cfg.attn_layers),
        "attn_R": _attn_block(sd, "attn_R", cfg.attn_layers),
        "attn_diff": _attn_block(sd, "attn_diff", cfg.attn_layers),
        "body": _body(sd),
        "subheads": _subheads(sd, cfg.n_sectors),
    }
    if cfg.use_cc:
        p["cc_proj"] = _lin(sd, "cc_proj")
    return p

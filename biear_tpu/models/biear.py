"""The BiEAR models: active waveform (flagship) and passive feature models.

Parity surface: DeepEarActiveWaveform (model_torch.py:965-1112) and
DeepEarTorchILD (model_torch.py:905-960). Functional API: builders return
a parameter pytree; forwards are pure functions suitable for jit/vmap/grad.
Instead of the reference's `model.last_Q` attribute mutation, the forward
returns an `aux` dict carrying Q for the regulariser.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import BiEARConfig
from . import backend as B
from . import frontend as F
from . import layers as L


# ---------------- init ----------------

def _backend_init(key, cfg: BiEARConfig, in_dim: int):
    ks = jax.random.split(key, 5)
    feat_dim = 2 * cfg.latent_dim + (cfg.latent_dim if cfg.use_cc else 0)
    p = {
        "encoder_ild": B.encoder_init(ks[0], in_dim, 200, cfg.latent_dim),
        "encoder_ipd": B.encoder_init(ks[1], in_dim, 200, cfg.latent_dim),
        "body": B.body_init(ks[2], feat_dim),
        "subheads": B.subheads_init(ks[3], cfg.n_sectors, 200, cfg.n_dist_class),
    }
    if cfg.use_cc:
        p["cc_proj"] = L.linear_init(ks[4], cfg.n_bands, cfg.latent_dim)
    return p


def init_active(key, cfg: BiEARConfig):
    """Parameters for the active waveform model (dual or single controller)."""
    k_fb, k_be = jax.random.split(key)
    if cfg.controller_mode == "single":
        fb = F.single_frontend_init(k_fb, cfg)
    else:
        fb = F.dual_frontend_init(k_fb, cfg)
    p = _backend_init(k_be, cfg, cfg.n_bands)
    p["bifb"] = fb
    return p


def init_passive(key, cfg: BiEARConfig):
    return _backend_init(key, cfg, cfg.n_bands)


# ---------------- forward ----------------

def _heads(params, cfg: BiEARConfig, z_ild, z_ipd, x3, rng, train: bool):
    feats = [z_ild, z_ipd]
    if cfg.use_cc:
        if x3 is None:
            x3 = jnp.zeros((z_ild.shape[0], cfg.n_bands), z_ild.dtype)
        feats.append(x3 @ params["cc_proj"]["w"].T + params["cc_proj"]["b"])
    feat_cat = jnp.concatenate(feats, axis=-1)

    if train and rng is not None:
        k_body, k_heads = jax.random.split(rng)
    else:
        k_body = k_heads = None
    body = B.body_apply(params["body"], feat_cat, k_body, train,
                        cfg.backend_dropout)
    return B.subheads_apply(params["subheads"], body, k_heads, train,
                            cfg.backend_dropout)


def active_forward(params, cfg: BiEARConfig, wavL, wavR, x3=None,
                   rng=None, train: bool = False):
    """wavL, wavR (B, Nsamp), x3 (B, N) -> (sound_logits, aoa, dist_logits, aux).

    Parity: DeepEarActiveWaveform.forward (model_torch.py:1065-1112) with the
    per-band phase fused into the frontend scan.
    """
    wavL = wavL.astype(jnp.float32)
    wavR = wavR.astype(jnp.float32)

    if train:
        if rng is None:
            raise ValueError("active_forward(train=True) requires rng for "
                             "dropout; pass rng= or use train=False")
        k_fb, k_be = jax.random.split(rng)
    else:
        k_fb = k_be = None

    fe = F.single_frontend if cfg.controller_mode == "single" else F.dual_frontend
    YL, YR, QL, QR, phaseL, phaseR = fe(params["bifb"], cfg, wavL, wavR,
                                        k_fb, train)

    x1 = jnp.clip(jnp.log(YL + 1e-8), -12.0, 12.0)
    x2 = jnp.clip(jnp.log(YR + 1e-8), -12.0, 12.0)

    z_ild = B.ild_encoder(params["encoder_ild"], x1, x2)
    z_ipd = B.ipd_encoder(params["encoder_ipd"], phaseL, phaseR)

    sound, aoa, dist = _heads(params, cfg, z_ild, z_ipd, x3, k_be, train)
    aux = {"QL": QL, "QR": QR, "Q": 0.5 * (QL + QR)}
    return sound, aoa, dist, aux


def passive_forward(params, cfg: BiEARConfig, x1, x2, x3, x4, x5,
                    rng=None, train: bool = False):
    """Precomputed features -> heads. Parity: DeepEarTorchILD
    (model_torch.py:938-960). x1/x2: mag feats (B, T, N); x3: CC (B, N);
    x4/x5: phase feats (B, T, N)."""
    if train and rng is None:
        raise ValueError("passive_forward(train=True) requires rng")
    z_ild = B.ild_encoder(params["encoder_ild"], x1, x2)
    z_ipd = B.ipd_encoder(params["encoder_ipd"], x4, x5)
    sound, aoa, dist = _heads(params, cfg, z_ild, z_ipd, x3, rng, train)
    return sound, aoa, dist, {"Q": None}


# ---------------- builders (reference builder parity) ----------------

def build_model_active(key, **overrides):
    """Dual-controller active model (model_torch.py:1303-1334)."""
    cfg = BiEARConfig(controller_mode="dual", **overrides)
    return cfg, init_active(key, cfg)


def build_model_active_single_controller(key, **overrides):
    """Single shared controller (model_torch.py:1267-1300)."""
    cfg = BiEARConfig(controller_mode="single", **overrides)
    return cfg, init_active(key, cfg)


def build_model(key, **overrides):
    """Passive feature model (model_torch.py:1252-1265)."""
    cfg = BiEARConfig(**overrides)
    return cfg, init_passive(key, cfg)

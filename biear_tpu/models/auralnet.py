"""AuralNet-style baseline: fixed filterbank + transformer attention blocks.

Parity surface: AuralNetAttentionBlock / AuralNetActiveWaveform
(model_torch.py:779-823, 1115-1247): per-ear fixed gammatone FB, log
compression, three pre-norm transformer encoders (L, R, L-R) with
sinusoidal positional encoding, time-mean pooling, then the shared
body + 8 sub-heads. Attention weights use the torch packed-qkv layout so
reference checkpoints import directly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .config import BiEARConfig
from . import layers as L
from . import backend as B
from . import frontend as F


@functools.lru_cache(maxsize=None)
def _sinusoidal_pe(T: int, d_model: int):
    """Standard transformer PE (model_torch.py:56-67); static constant.

    Returns NUMPY — an lru_cache must never hold jnp values, because a
    first call inside a jit trace would cache (and later leak) a tracer."""
    position = np.arange(T, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / max(d_model, 1)))
    pe = np.zeros((T, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


# ---------------- multi-head self-attention (torch MHA layout) ----------------

def mha_init(key, d_model: int):
    k1, k2, k3 = jax.random.split(key, 3)
    # torch MultiheadAttention: in_proj xavier_uniform, out_proj kaiming-ish;
    # xavier bound for the packed (3d, d) weight uses fan (3d + d).
    bound = math.sqrt(6.0 / (3 * d_model + d_model))
    return {
        "in_proj_w": jax.random.uniform(k1, (3 * d_model, d_model),
                                        jnp.float32, -bound, bound),
        "in_proj_b": jnp.zeros((3 * d_model,), jnp.float32),
        "out_proj": L.linear_init(k2, d_model, d_model),
    }


def mha_apply(p, x, n_heads: int, rng, train: bool, rate: float):
    """Self-attention over (B, T, d)."""
    Bsz, T, d = x.shape
    hd = d // n_heads
    qkv = x @ p["in_proj_w"].T + p["in_proj_b"]           # (B, T, 3d)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    sh = lambda a: a.reshape(Bsz, T, n_heads, hd).transpose(0, 2, 1, 3)
    q, k, v = sh(q), sh(k), sh(v)
    scores = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(hd)
    attn = jax.nn.softmax(scores, axis=-1)
    attn = L.dropout(rng, attn, rate, not train)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(Bsz, T, d)
    return L.linear(p["out_proj"], out)


# ---------------- pre-norm transformer encoder layer ----------------

def encoder_layer_init(key, d_model: int, d_ff: int):
    ks = jax.random.split(key, 3)
    return {
        "self_attn": mha_init(ks[0], d_model),
        "norm1": L.layer_norm_init(d_model),
        "norm2": L.layer_norm_init(d_model),
        "linear1": L.linear_init(ks[1], d_model, d_ff),
        "linear2": L.linear_init(ks[2], d_ff, d_model),
    }


def encoder_layer_apply(p, x, n_heads: int, rng, train: bool, rate: float):
    """norm_first=True TransformerEncoderLayer with GELU
    (model_torch.py:799-807)."""
    if train and rng is not None:
        ks = jax.random.split(rng, 4)
    else:
        ks = (None,) * 4
    a = mha_apply(p["self_attn"], L.layer_norm(p["norm1"], x),
                  n_heads, ks[0], train, rate)
    x = x + L.dropout(ks[1], a, rate, not train)
    h = L.layer_norm(p["norm2"], x)
    h = jax.nn.gelu(L.linear(p["linear1"], h), approximate=False)
    h = L.dropout(ks[2], h, rate, not train)
    h = L.linear(p["linear2"], h)
    return x + L.dropout(ks[3], h, rate, not train)


def attn_block_init(key, d_in: int, d_model: int, n_layers: int):
    ks = jax.random.split(key, n_layers + 1)
    return {
        "proj": L.linear_init(ks[0], d_in, d_model),
        "layers": [encoder_layer_init(k, d_model, 4 * d_model)
                   for k in ks[1:]],
    }


def attn_block_apply(p, x, cfg: BiEARConfig, rng, train: bool):
    """Linear proj + sinusoidal PE + n pre-norm encoder layers
    (model_torch.py:810-823)."""
    h = L.linear(p["proj"], x)
    h = h + _sinusoidal_pe(x.shape[1], cfg.d_model)[None]
    keys = (jax.random.split(rng, len(p["layers"]))
            if (train and rng is not None) else [None] * len(p["layers"]))
    for lp, k in zip(p["layers"], keys):
        h = encoder_layer_apply(lp, h, cfg.attn_heads, k, train,
                                cfg.attn_dropout)
    return h


# ---------------- full model ----------------

def init_auralnet(key, cfg: BiEARConfig):
    ks = jax.random.split(key, 6)
    feat_dim = 3 * cfg.d_model + (cfg.d_model if cfg.use_cc else 0)
    p = {
        "attn_L": attn_block_init(ks[0], cfg.n_bands, cfg.d_model, cfg.attn_layers),
        "attn_R": attn_block_init(ks[1], cfg.n_bands, cfg.d_model, cfg.attn_layers),
        "attn_diff": attn_block_init(ks[2], cfg.n_bands, cfg.d_model, cfg.attn_layers),
        "body": B.body_init(ks[3], feat_dim),
        "subheads": B.subheads_init(ks[4], cfg.n_sectors, 200, cfg.n_dist_class),
    }
    if cfg.use_cc:
        p["cc_proj"] = L.linear_init(ks[5], cfg.n_bands, cfg.d_model)
    return p


def auralnet_forward(params, cfg: BiEARConfig, wavL, wavR, x3=None,
                     rng=None, train: bool = False):
    """Parity: AuralNetActiveWaveform.forward (model_torch.py:1184-1247)."""
    if train and rng is None:
        raise ValueError("auralnet_forward(train=True) requires rng")
    wavL = jnp.clip(wavL.astype(jnp.float32), -1.0, 1.0)
    wavR = jnp.clip(wavR.astype(jnp.float32), -1.0, 1.0)

    YL = F.auralnet_fb(cfg, wavL)
    YR = F.auralnet_fb(cfg, wavR)
    xL = jnp.clip(jnp.log(YL + 1e-8), -12.0, 12.0)
    xR = jnp.clip(jnp.log(YR + 1e-8), -12.0, 12.0)
    xDiff = xL - xR

    if train and rng is not None:
        kL, kR, kD, k_cc_body = jax.random.split(rng, 4)
    else:
        kL = kR = kD = k_cc_body = None

    zL = jnp.mean(attn_block_apply(params["attn_L"], xL, cfg, kL, train), axis=1)
    zR = jnp.mean(attn_block_apply(params["attn_R"], xR, cfg, kR, train), axis=1)
    zD = jnp.mean(attn_block_apply(params["attn_diff"], xDiff, cfg, kD, train), axis=1)

    feats = [zL, zR, zD]
    if cfg.use_cc:
        if x3 is None:
            x3 = jnp.zeros((wavL.shape[0], cfg.n_bands), jnp.float32)
        feats.append(L.linear(params["cc_proj"], x3.astype(jnp.float32)))
    feat_cat = jnp.concatenate(feats, axis=-1)

    if train and k_cc_body is not None:
        k_body, k_heads = jax.random.split(k_cc_body)
    else:
        k_body = k_heads = None
    body = B.body_apply(params["body"], feat_cat, k_body, train,
                        cfg.backend_dropout)
    sound, aoa, dist = B.subheads_apply(params["subheads"], body, k_heads,
                                        train, cfg.backend_dropout)
    return sound, aoa, dist, {"Q": None}


def build_model_auralnet_active(key, **overrides):
    """Builder parity: model_torch.py:1337-1367."""
    cfg = BiEARConfig(**overrides)
    return cfg, init_auralnet(key, cfg)

"""Backend: ILD / IPD GRU encoders, body MLP and the 8 per-sector sub-heads.

Parity surface: model_torch.py:828-960. TPU-first choices:
  * the 8 SubHeads are ONE leaf-stacked parameter pytree (leading axis 8)
    applied with vmap — all heads compute as one batched matmul, and the
    head axis is a natural model-parallel sharding axis;
  * GRU input projections batch over all T timesteps (see layers.gru_seq).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L
from .config import BiEARConfig


# ---------------- ILD / IPD encoders ----------------

def encoder_init(key, input_dim: int, hidden_dim: int = 200, latent_dim: int = 100):
    k1, k2 = jax.random.split(key)
    return {
        "in_norm": L.layer_norm_init(input_dim),
        "gru1": L.gru_init(k1, input_dim, hidden_dim),
        "gru2": L.gru_init(k2, hidden_dim, latent_dim),
    }


def _encode(p, x):
    x = L.layer_norm(p["in_norm"], x)
    h1, _ = L.gru_seq(p["gru1"], x)
    h2, _ = L.gru_seq(p["gru2"], h1)
    z = jnp.mean(h2, axis=1)
    return jnp.nan_to_num(z, nan=0.0, posinf=0.0, neginf=0.0)


def ild_encoder(p, xL, xR):
    """ILD = clamp(xL - xR, +-10) -> LN -> GRU(100->200->100) -> time-mean.

    Parity: model_torch.py:835-846."""
    ild = jnp.nan_to_num(xL - xR, nan=0.0, posinf=0.0, neginf=0.0)
    return _encode(p, jnp.clip(ild, -10.0, 10.0))


def ipd_encoder(p, xL, xR):
    """IPD = wrapped phase difference -> LN -> GRUs -> time-mean.

    Parity: model_torch.py:855-866."""
    d = xL - xR
    ipd = jnp.arctan2(jnp.sin(d), jnp.cos(d))
    return _encode(p, jnp.nan_to_num(ipd, nan=0.0, posinf=0.0, neginf=0.0))


# ---------------- body MLP ----------------

def body_init(key, feat_dim: int):
    ks = jax.random.split(key, 3)
    return {
        "l1": L.linear_init(ks[0], feat_dim, 512),
        "l2": L.linear_init(ks[1], 512, 400),
        "l3": L.linear_init(ks[2], 400, 200),
    }


def body_apply(p, x, rng, train: bool, rate: float = 0.2):
    """Linear 512 -> 400 -> 200 with ReLU + Dropout(0.2) after each.

    Parity: model_torch.py:1014-1024."""
    ks = jax.random.split(rng, 3) if (train and rng is not None) else (None,) * 3
    x = L.dropout(ks[0], jax.nn.relu(L.linear(p["l1"], x)), rate, not train)
    x = L.dropout(ks[1], jax.nn.relu(L.linear(p["l2"], x)), rate, not train)
    x = L.dropout(ks[2], jax.nn.relu(L.linear(p["l3"], x)), rate, not train)
    return x


# ---------------- sub-heads (stacked x8, vmapped) ----------------

def subheads_init(key, n_sectors: int, body_dim: int = 200, n_dist_class: int = 5):
    def one(k):
        ks = jax.random.split(k, 10)
        return {
            "shared": L.linear_init(ks[0], body_dim, 100),
            "sound": [L.linear_init(ks[1], 100, 50),
                      L.linear_init(ks[2], 50, 10),
                      L.linear_init(ks[3], 10, 1)],
            "aoa": [L.linear_init(ks[4], 100, 50),
                    L.linear_init(ks[5], 50, 10),
                    L.linear_init(ks[6], 10, 1)],
            "dist": [L.linear_init(ks[7], 100, 50),
                     L.linear_init(ks[8], 50, 10),
                     L.linear_init(ks[9], 10, n_dist_class)],
        }

    heads = [one(k) for k in jax.random.split(key, n_sectors)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *heads)


def _branch(ps, h):
    h = jax.nn.relu(L.linear(ps[0], h))
    h = jax.nn.relu(L.linear(ps[1], h))
    return L.linear(ps[2], h)


def subheads_apply(p, body_feat, rng, train: bool, rate: float = 0.2):
    """All 8 sector heads at once via vmap over the stacked head axis.

    Returns (sound_logits (B, 8), aoa_pred (B, 8) in [0,1],
             dist_logits (B, 8, C)). Parity: model_torch.py:868-903."""
    n_heads = p["shared"]["w"].shape[0]
    if train and rng is not None:
        drop_keys = jax.random.split(rng, n_heads)
    else:
        drop_keys = jnp.zeros((n_heads, 2), jnp.uint32)

    def one_head(ph, key):
        h = jax.nn.relu(L.linear(ph["shared"], body_feat))
        h = L.dropout(key if train else None, h, rate, not train)
        return (_branch(ph["sound"], h)[..., 0],
                jax.nn.sigmoid(_branch(ph["aoa"], h))[..., 0],
                _branch(ph["dist"], h))

    sound, aoa, dist = jax.vmap(one_head)(p, drop_keys)   # (8, B[, C])
    return (jnp.moveaxis(sound, 0, -1),
            jnp.moveaxis(aoa, 0, -1),
            jnp.moveaxis(dist, 0, 1))

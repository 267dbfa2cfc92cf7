"""Minimal functional NN layer library over plain-pytree parameters.

Design: every layer is an (init, apply) pair of pure functions; parameters
are nested dicts of jnp arrays. This keeps the whole model a transparent
pytree (trivial to shard with NamedSharding, to split into optimizer param
groups by path, and to import PyTorch reference checkpoints into), and the
weight LAYOUT deliberately matches torch (Linear weight (out, in); GRU
gates ordered r,z,n in stacked (3H, ·) matrices) so a reference state_dict
maps 1:1 onto these leaves.

Initialisers reproduce torch defaults so training dynamics match the
reference: Linear ~ U(+-1/sqrt(fan_in)) for weight and bias; GRU
~ U(+-1/sqrt(hidden)); LayerNorm ones/zeros.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---------------- Linear ----------------

def linear_init(key, in_dim: int, out_dim: int, zero: bool = False):
    if zero:
        return {"w": jnp.zeros((out_dim, in_dim), jnp.float32),
                "b": jnp.zeros((out_dim,), jnp.float32)}
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (out_dim, in_dim), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound),
    }


def linear(p, x):
    return x @ p["w"].T + p["b"]


# ---------------- LayerNorm (torch eps=1e-5, affine) ----------------

def layer_norm_init(dim: int):
    return {"g": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def layer_norm(p, x, eps: float = 1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["g"] + p["b"]


# ---------------- Dropout ----------------

def dropout(key, x, rate: float, deterministic: bool):
    """Inverted dropout, matching torch.nn.Dropout semantics."""
    if deterministic or rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def dropout_masks(key, rate: float, shape):
    """Keep-masks for dropout_apply, drawn in ONE bernoulli call.

    Scan bodies that need per-frame dropout (the Q controller) draw all
    T frames' masks here, outside the scan, and thread them through as
    xs: one big threefry kernel replaces 2T tiny per-frame ones AND the
    masks arrive as scan inputs instead of being stacked into backward
    residuals by per-frame dynamic-update-slices (together 0.6 ms/step
    at batch 512 — docs/hot_ops_named.json)."""
    return jax.random.bernoulli(key, 1.0 - rate, shape)


def dropout_apply(mask, x, rate: float):
    """Inverted dropout from a precomputed keep-mask."""
    return jnp.where(mask, x / (1.0 - rate), 0.0)


# ---------------- GRU (torch layout: gates r, z, n) ----------------

def gru_init(key, in_dim: int, hidden: int):
    ks = jax.random.split(key, 4)
    bound = 1.0 / jnp.sqrt(hidden)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {
        "w_ih": u(ks[0], (3 * hidden, in_dim)),
        "w_hh": u(ks[1], (3 * hidden, hidden)),
        "b_ih": u(ks[2], (3 * hidden,)),
        "b_hh": u(ks[3], (3 * hidden,)),
    }


def gru_cell(p, h, x_proj):
    """One GRU step given the PRE-PROJECTED input gates.

    x_proj = x @ w_ih.T + b_ih, shape (..., 3H). Splitting the input
    projection out lets sequence callers batch it over all timesteps in one
    MXU matmul, leaving only the (H x 3H) recurrent matmul inside the scan.
    """
    H = p["w_hh"].shape[1]
    gh = h @ p["w_hh"].T + p["b_hh"]
    ri, zi, ni = x_proj[..., :H], x_proj[..., H:2 * H], x_proj[..., 2 * H:]
    rh, zh, nh = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(ri + rh)
    z = jax.nn.sigmoid(zi + zh)
    n = jnp.tanh(ni + r * nh)
    return (1.0 - z) * n + z * h


def gru_step(p, h, x):
    """One GRU step from the raw input (used inside the Q-controller scan,
    where the input itself depends on the carry so it cannot be hoisted)."""
    return gru_cell(p, h, x @ p["w_ih"].T + p["b_ih"])


def gru_seq(p, x, h0=None):
    """Run a GRU over (B, T, I) -> (B, T, H), h_last (B, H).

    The input projection for all T timesteps is one batched matmul; the
    lax.scan carries only the recurrent half. Matches torch.nn.GRU
    (batch_first=True) numerics exactly.
    """
    B, T, _ = x.shape
    H = p["w_hh"].shape[1]
    if h0 is None:
        h0 = jnp.zeros((B, H), x.dtype)
    x_proj = x @ p["w_ih"].T + p["b_ih"]          # (B, T, 3H)

    def step(h, xp_t):
        h = gru_cell(p, h, xp_t)
        return h, h

    h_last, hs = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
    return jnp.swapaxes(hs, 0, 1), h_last


# ---------------- small composites ----------------

def mlp_init(key, dims, zero_last: bool = False):
    """Plain ReLU-free stack builder: list of linear params for given dims."""
    keys = jax.random.split(key, len(dims) - 1)
    return [linear_init(k, dims[i], dims[i + 1],
                        zero=(zero_last and i == len(dims) - 2))
            for i, k in enumerate(keys)]


def silu(x):
    return x * jax.nn.sigmoid(x)

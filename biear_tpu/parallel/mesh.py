"""Device mesh + sharding rules.

The reference is single-device (train_biear.py:120); scaling here is
TPU-native: a ('data', 'model') mesh where

  * the global batch shards over 'data' (pure DP — gradient psum over ICI
    is inserted by XLA's SPMD partitioner from the shardings alone);
  * the 'model' axis tensor-shards the widest backend pieces: the body
    MLP's hidden layers in the Megatron column/row pattern, and the
    8 leaf-stacked sub-heads over their head axis (head-parallel).

The model is small (~1.65M params), so DP is the throughput axis; the
model axis exists to keep every subsystem honestly multi-axis and is
exercised by the driver's dryrun_multichip.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data == -1:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} devices, "
                         f"have {n}")
    dev = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


# Every top-level param-tree key any model family produces, and its
# placement intent under model parallelism. A key outside this set is a
# new subsystem nobody taught the partitioner about — with model_parallel
# it must FAIL, not silently replicate (a replicated 'subheads2' would
# compile and train at a fraction of the intended sharding).
_MP_SHARDED_KEYS = {"subheads", "body"}
_MP_REPLICATED_KEYS = {"encoder_ild", "encoder_ipd", "cc_proj", "bifb",
                       "attn_L", "attn_R", "attn_diff"}


def param_pspecs(params, model_parallel: bool):
    """PartitionSpec tree for a model param pytree.

    With model_parallel: sub-heads shard on their stacked head axis; body
    l1 is column-parallel (out dim), l2 row-parallel (in dim); everything
    else replicates. Unknown top-level keys raise under model_parallel
    instead of replicating silently."""

    def rep(tree):
        return jax.tree.map(lambda _: P(), tree)

    specs = {k: rep(v) for k, v in params.items()}
    if not model_parallel:
        return specs
    unknown = set(params) - _MP_SHARDED_KEYS - _MP_REPLICATED_KEYS
    if unknown:
        raise ValueError(
            f"param_pspecs: unknown top-level param keys {sorted(unknown)} "
            f"under model parallelism — add them to _MP_SHARDED_KEYS or "
            f"_MP_REPLICATED_KEYS in parallel/mesh.py with an explicit "
            f"placement decision")
    if "subheads" in params:
        specs["subheads"] = jax.tree.map(
            lambda a: P(*(("model",) + (None,) * (a.ndim - 1))),
            params["subheads"])
    if "body" in params:
        specs["body"] = {
            "l1": {"w": P("model", None), "b": P("model")},
            "l2": {"w": P(None, "model"), "b": P()},
            "l3": rep(params["body"]["l3"]),
        }
    return specs


def shard_params(params, mesh: Mesh):
    """device_put params according to param_pspecs over the mesh."""
    specs = param_pspecs(params, mesh.shape["model"] > 1)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def shard_opt_state(opt_state, params, mesh: Mesh):
    """Commit every optimizer-state leaf to the mesh.

    Adam moments mirror the param tree (inside optax's masked/multi_transform
    wrappers, so at a deeper path whose TAIL is the param path) and get the
    matching param spec; everything else (step counts, scalars) replicates.
    Without this, optax's eagerly-initialised state enters the first train
    step UNCOMMITTED while every later step sees the jit outputs' committed
    NamedShardings — one wasted full compile of the step (5-10 minutes
    through this image's TPU tunnel)."""
    from jax.tree_util import tree_leaves_with_path, tree_map_with_path, keystr
    specs = param_pspecs(params, mesh.shape["model"] > 1)
    spec_leaves = jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, P))
    pindex = [(keystr(p), s) for (p, _), s in
              zip(tree_leaves_with_path(params), spec_leaves)]

    def place(path, x):
        ks = keystr(path)
        for pk, s in pindex:
            if ks.endswith(pk) and getattr(x, "shape", None) is not None:
                return jax.device_put(x, NamedSharding(mesh, s))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return tree_map_with_path(place, opt_state)

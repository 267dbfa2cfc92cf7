"""Platform selection that survives this image's eager-jax sitecustomize.

The container's sitecustomize.py imports jax at interpreter startup and
registers the TPU backend, after which JAX_PLATFORMS in the environment is
no longer consulted. Call honor_platform_env() first thing in every CLI so
`JAX_PLATFORMS=cpu python train_biear.py ...` behaves as a user expects.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS", "").lower()
    if want and want != "axon":
        import jax
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass

"""Numerical parity vs the PyTorch reference implementation.

These tests instantiate the reference models from /root/reference (mounted
read-only), export their randomly-initialised state_dicts, import them into
our pytrees via biear_tpu.utils.torch_import, and compare eval-mode forward
outputs. Skipped automatically when the reference tree is absent.
"""

import os
import sys

import numpy as np
import pytest

import jax

jax.config.update("jax_default_matmul_precision", "highest")

from conftest import REFERENCE_DIR, has_reference

torch = pytest.importorskip("torch")

if has_reference():
    sys.path.insert(0, REFERENCE_DIR)
    import model_torch as ref  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from biear_tpu.models import (  # noqa: E402
    BiEARConfig, active_forward, passive_forward, auralnet_forward,
)
from biear_tpu.utils import torch_import as ti  # noqa: E402

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference tree not mounted")

B = 2
FS = 16000


def _wavs(rng):
    wavL = rng.uniform(-1, 1, (B, FS)).astype(np.float32)
    wavR = rng.uniform(-1, 1, (B, FS)).astype(np.float32)
    x3 = rng.uniform(-1, 1, (B, 100)).astype(np.float32)
    return wavL, wavR, x3


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _check(t_out, j_out, atol):
    for name, t, j in zip(("sound", "aoa", "dist"), t_out, j_out):
        np.testing.assert_allclose(np.asarray(j), t.detach().numpy(),
                                   atol=atol, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("mode,deltaq", [
    ("dual", dict(deltaQ_base=1.0, deltaQ_low_factor=0.3,
                  deltaQ_high_factor=5.0, deltaQ_mode="relative")),
    ("single", dict(deltaQ_base=2.0, deltaQ_low_factor=0.5,
                    deltaQ_high_factor=5.0, deltaQ_mode="absolute")),
])
def test_active_adaptive_parity(rng, mode, deltaq):
    torch.manual_seed(0)
    build = (ref.build_model_active if mode == "dual"
             else ref.build_model_active_single_controller)
    tm = build(use_cc=True, fb_alpha=0.2, fixed_frontend_q=False, **deltaq)
    tm.eval()
    # The controller output layer is zero-initialised (training starts at
    # Q = Q0), which would leave delta == 0 and never exercise the feedback
    # loop. Perturb it (in the torch model; the import picks it up).
    with torch.no_grad():
        mods = ([tm.bifb.fb_L.q_out[-1], tm.bifb.fb_R.q_out[-1]]
                if mode == "dual" else [tm.bifb.q_out[-1]])
        for m in mods:
            m.weight.uniform_(-0.05, 0.05)
            m.bias.uniform_(-0.05, 0.05)

    cfg = BiEARConfig(controller_mode=mode, use_cc=True,
                      fixed_frontend_q=False, **deltaq)
    params = ti.import_active(_sd(tm), cfg)

    wavL, wavR, x3 = _wavs(rng)
    with torch.no_grad():
        t_out = tm(torch.tensor(wavL), torch.tensor(wavR), torch.tensor(x3))
    j_out = active_forward(params, cfg, jnp.asarray(wavL), jnp.asarray(wavR),
                           jnp.asarray(x3), train=False)[:3]
    _check(t_out, j_out, atol=2e-3)
    # Q trajectories must match too (the recurrent feedback path).
    aux = active_forward(params, cfg, jnp.asarray(wavL), jnp.asarray(wavR),
                         jnp.asarray(x3), train=False)[3]
    np.testing.assert_allclose(np.asarray(aux["Q"]),
                               tm.last_Q.detach().numpy(), atol=5e-3)
    # And the controller must actually be moving Q away from Q0.
    q_dev = np.abs(np.asarray(aux["Q"])[:, 1:] - np.asarray(aux["Q"])[:, :1])
    assert q_dev.max() > 1e-4


def test_active_fixed_q_parity(rng):
    torch.manual_seed(1)
    tm = ref.build_model_active(use_cc=True, fixed_frontend_q=True)
    tm.eval()
    cfg = BiEARConfig(controller_mode="dual", use_cc=True, fixed_frontend_q=True)
    params = ti.import_active(_sd(tm), cfg)

    wavL, wavR, x3 = _wavs(rng)
    with torch.no_grad():
        t_out = tm(torch.tensor(wavL), torch.tensor(wavR), torch.tensor(x3))
    j_out = active_forward(params, cfg, jnp.asarray(wavL), jnp.asarray(wavR),
                           jnp.asarray(x3), train=False)[:3]
    _check(t_out, j_out, atol=1e-3)


def test_passive_parity(rng):
    torch.manual_seed(2)
    tm = ref.build_model(use_cc=True)
    tm.eval()
    cfg = BiEARConfig(use_cc=True)
    params = ti.import_passive(_sd(tm), cfg)

    x1, x2 = (rng.standard_normal((B, 19, 100)).astype(np.float32) for _ in range(2))
    x4, x5 = (rng.uniform(-np.pi, np.pi, (B, 19, 100)).astype(np.float32)
              for _ in range(2))
    x3 = rng.uniform(-1, 1, (B, 100)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(*(torch.tensor(a) for a in (x1, x2, x3, x4, x5)))
    j_out = passive_forward(params, cfg, *(jnp.asarray(a)
                                           for a in (x1, x2, x3, x4, x5)),
                            train=False)[:3]
    _check(t_out, j_out, atol=1e-4)


def test_auralnet_parity(rng):
    torch.manual_seed(3)
    tm = ref.build_model_auralnet_active(use_cc=True)
    tm.eval()
    cfg = BiEARConfig(use_cc=True)
    params = ti.import_auralnet(_sd(tm), cfg)

    wavL, wavR, x3 = _wavs(rng)
    with torch.no_grad():
        t_out = tm(torch.tensor(wavL), torch.tensor(wavR), torch.tensor(x3))
    j_out = auralnet_forward(params, cfg, jnp.asarray(wavL), jnp.asarray(wavR),
                             jnp.asarray(x3), train=False)[:3]
    _check(t_out, j_out, atol=1e-3)

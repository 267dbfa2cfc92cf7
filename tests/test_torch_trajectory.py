"""Training-TRAJECTORY parity vs the actual PyTorch reference.

The last link in the matched-accuracy chain: forward parity and
loss/optimizer unit parity are covered elsewhere (test_model_parity.py,
test_train.py); here K steps of the reference's REAL training loop —
loss.backward() through the 19-frame BPTT (model_torch.py:333-380),
per-group clip 0.2/3.0 (train_biear.py:523-527), Adam wd=1e-5/eps=1e-7
(train_biear.py:610-623), Q regularizers (train_biear.py:479-491) — run
in torch on the reference model, against OUR shipped jitted train step
(make_train_step + make_optimizer) from identical weights on identical
batches. Dropout is disabled on both sides (the one non-matchable RNG
stream); everything else is the production path.

Tolerances are set ~10x above measured drift (30-step flagship run:
loss max |d| 4.7e-6, param max |d| 1.4e-3 — docs/
torch_trajectory_parity.json). Param drift concentrates in Adam's
sign-sensitivity on noise-level gradient coordinates (update magnitude
~lr per step on such coords), which the loss trajectory shows to be
functionally irrelevant.
"""

import sys

import numpy as np
import pytest

from conftest import has_reference

sys.path.insert(0, "/root/repo")  # tools/ is imported as a package

torch = pytest.importorskip("torch")

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not has_reference(),
                                 reason="reference tree not mounted")]

from tools.torch_trajectory_parity import run_parity  # noqa: E402


def test_flagship_trajectory_parity():
    """Dual adaptive-Q flagship: per-group clip + two-LR Adam + BPTT."""
    res = run_parity(steps=12, batch=4, seed=0)
    d = np.abs(np.array(res["torch_losses"]) - np.array(res["jax_losses"]))
    assert d.max() < 5e-5, res
    assert res["param_max_abs_diff"] < 3e-3, res["param_diffs_top"]


def test_fixed_q_trajectory_parity():
    """Fixed-Q: the empty-frontend-group fallback — single Adam group at
    LR_BACKEND under the global GRAD_CLIP_NORM=3.0 (train_biear.py:525,
    612-616) vs our make_optimizer collapse branch."""
    res = run_parity(steps=12, batch=4, seed=1, fixed_q=True)
    d = np.abs(np.array(res["torch_losses"]) - np.array(res["jax_losses"]))
    assert d.max() < 5e-5, res
    assert res["param_max_abs_diff"] < 3e-3, res["param_diffs_top"]

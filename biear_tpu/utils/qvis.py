"""Q-trajectory visualisation (the reference ships only a no-op stub,
visualize_q.py:4-6 — this is a real implementation).

visualize_Q_LR(params, cfg, batches, save_dir): for a few samples, plot
the per-ear Q(t, band) trajectories against Q0 over the ERB frequency
axis, plus the time-mean Q deviation, as PNGs (matplotlib) and raw .npz.
"""

from __future__ import annotations

import os

import numpy as np


def visualize_Q_LR(params, cfg, batches, save_dir, max_batches: int = 5,
                   sample_per_batch: int = 1):
    """Run the active forward on up to max_batches batches and dump Q plots.

    batches: iterable of (wavL, wavR, x3, y) tuples.
    """
    import jax.numpy as jnp
    from biear_tpu.models import active_forward
    from biear_tpu.models.frontend import frontend_constants

    os.makedirs(save_dir, exist_ok=True)
    c = frontend_constants(cfg)
    fc, Q0 = np.asarray(c["fc"]), np.asarray(c["Q0"])

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:          # pragma: no cover
        plt = None

    for bi, batch in enumerate(batches):
        if bi >= max_batches:
            break
        wavL, wavR, x3 = (jnp.asarray(a) for a in batch[:3])
        _, _, _, aux = active_forward(params, cfg, wavL, wavR, x3,
                                      train=False)
        QL = np.asarray(aux["QL"])[:sample_per_batch]
        QR = np.asarray(aux["QR"])[:sample_per_batch]
        np.savez(os.path.join(save_dir, f"q_batch{bi:03d}.npz"),
                 QL=QL, QR=QR, fc=fc, Q0=Q0)
        if plt is None:
            continue
        for si in range(QL.shape[0]):
            fig, axes = plt.subplots(1, 3, figsize=(15, 4))
            for ax, Q, name in ((axes[0], QL[si], "left"),
                                (axes[1], QR[si], "right")):
                im = ax.imshow(Q, aspect="auto", origin="lower",
                               extent=[0, len(fc) - 1, 0, Q.shape[0]])
                ax.set_title(f"Q(t, band) {name} ear")
                ax.set_xlabel("band"); ax.set_ylabel("frame")
                fig.colorbar(im, ax=ax)
            axes[2].semilogx(fc, Q0, "k--", label="Q0")
            axes[2].semilogx(fc, QL[si].mean(0), label="mean QL")
            axes[2].semilogx(fc, QR[si].mean(0), label="mean QR")
            axes[2].set_xlabel("fc (Hz)"); axes[2].set_ylabel("Q")
            axes[2].legend(); axes[2].set_title("time-mean Q vs Q0")
            fig.tight_layout()
            fig.savefig(os.path.join(save_dir,
                                     f"q_batch{bi:03d}_s{si}.png"), dpi=110)
            plt.close(fig)

"""SOFA (Spatially Oriented Format for Acoustics) HRIR/BRIR loading.

The reference uses pysofaconventions (generate_anechoic_data.py:35-46),
which is not available here — but SOFA files ARE HDF5, so h5py reads them
directly: Data.IR (M, R, N[, ...]), Data.SamplingRate, SourcePosition
(M, 3) = [azimuth_deg, elevation_deg, distance_m].
"""

from __future__ import annotations

import numpy as np


def load_sofa_hrir(path: str, fs_target: int = 16000):
    """Load an anechoic HRIR SOFA and resample to fs_target.

    Returns (ir (M, 2, L) float32, az_deg (M,), dist_m (M,)).
    Resampling parity: polyphase up/down by the rate gcd
    (generate_anechoic_data.py:48-69)."""
    import h5py
    from scipy.signal import resample_poly

    with h5py.File(path, "r") as f:
        ir = np.asarray(f["Data.IR"])
        fs = float(np.asarray(f["Data.SamplingRate"]).reshape(-1)[0])
        pos = np.asarray(f["SourcePosition"])
    if ir.ndim != 3:
        raise ValueError(f"expected anechoic (M, R, N) IR, got {ir.shape}")
    az = pos[:, 0] % 360.0
    dist = pos[:, 2]
    if fs != fs_target:
        g = np.gcd(int(fs), int(fs_target))
        ir = resample_poly(ir, int(fs_target // g), int(fs // g), axis=-1)
    return ir.astype(np.float32), az.astype(np.float64), dist.astype(np.float64)


def load_sofa_brir(path: str, fs_target: int = 16000):
    """Load a multi-emitter BRIR SOFA (Data.IR (M, 2, E, N)).

    Returns (ir (M, 2, E, L), listener_view_or_none, source_pos)."""
    import h5py
    from scipy.signal import resample_poly

    with h5py.File(path, "r") as f:
        ir = np.asarray(f["Data.IR"])
        fs = float(np.asarray(f["Data.SamplingRate"]).reshape(-1)[0])
        pos = np.asarray(f["SourcePosition"]) if "SourcePosition" in f else None
        view = np.asarray(f["ListenerView"]) if "ListenerView" in f else None
    if fs != fs_target:
        g = np.gcd(int(fs), int(fs_target))
        ir = resample_poly(ir, int(fs_target // g), int(fs // g), axis=-1)
    return ir.astype(np.float32), view, pos

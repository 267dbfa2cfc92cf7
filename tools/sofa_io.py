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


def _vec_to_az_deg(v):
    v = np.asarray(v, np.float64).reshape(-1)
    return float(np.degrees(np.arctan2(v[1], v[0])) % 360.0)


def extract_head_yaw(view, source_pos, M: int):
    """Best-effort head-yaw (deg) per measurement, 4-tier parser with the
    reference's exact priority (generate_auditorium_data.py:133-181):

      1) ListenerView rows that look like unit-ish VECTORS (median norm in
         (0.5, 2)) -> atan2 azimuth;
      2) ListenerView[:, 0] that looks like DEGREES (within [-360, 360]);
      3) SourcePosition[:, 0] degrees, else SourcePosition vector rows;
      4) fallback linspace(-90, 90) % 360.

    Returns (yaw (M,) float64 in [0, 360), source_tag str)."""
    lv = None if view is None else np.squeeze(np.asarray(view, np.float64))
    if lv is not None and lv.ndim == 2 and lv.shape[0] == M and lv.shape[1] >= 2:
        if lv.shape[1] >= 3:
            norms = np.linalg.norm(lv[:, :3], axis=1)
            if 0.5 < np.median(norms) < 2.0:
                yaw = np.array([_vec_to_az_deg(lv[m, :3]) for m in range(M)])
                return yaw, "ListenerView(vector)->az"
        if -360 <= np.nanmin(lv[:, 0]) and np.nanmax(lv[:, 0]) <= 360:
            return lv[:, 0] % 360.0, "ListenerView[:,0](deg)"
    sp = (None if source_pos is None
          else np.squeeze(np.asarray(source_pos, np.float64)))
    if sp is not None and sp.ndim == 2 and sp.shape[0] == M and sp.shape[1] >= 1:
        if -360 <= np.nanmin(sp[:, 0]) and np.nanmax(sp[:, 0]) <= 360:
            return sp[:, 0] % 360.0, "SourcePosition[:,0](deg)"
        if sp.shape[1] >= 3:
            norms = np.linalg.norm(sp[:, :3], axis=1)
            if 0.5 < np.median(norms) < 2.0:
                yaw = np.array([_vec_to_az_deg(sp[m, :3]) for m in range(M)])
                return yaw, "SourcePosition(vector)->az"
    return (np.linspace(-90.0, 90.0, M) % 360.0), "fallback linspace(-90,90)"


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

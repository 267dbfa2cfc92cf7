"""H5 dataset schemas: writers and readers for both reference formats.

Active schema (written by create_h5_data/data_h5_save.py:15-83 from raw
wavs): datasets x1 = left wav (N, 16000), x2 = right wav, x3 = CC (N, 100),
y = labels (N, 56), chunked in 256-row blocks.

Passive schema (the gt_group_phase files): x1/x2 mag feats (N, 19, 100),
x3 CC, x4/x5 phase feats, y.

The reader replaces the reference's per-index torch Dataset (+ the MISSING
DeepEarH5Dataset_Active module, SURVEY.md §2.9) with contiguous
chunk-granular reads: training batches come from an in-RAM (or
memory-mapped-style windowed) numpy store feeding whole device batches —
per-sample h5 reads are pure overhead on a TPU host.
"""

from __future__ import annotations

import numpy as np

try:
    import h5py
except ImportError:                       # pragma: no cover
    h5py = None


def _require_h5():
    if h5py is None:
        raise ImportError("h5py is required for the H5 data path")


def save_active_h5(path, x1, x2, x3, y, compress: bool = False,
                   chunk_rows: int = 256):
    """Write the active 4-tuple schema (data_h5_save.py:15-83)."""
    _require_h5()
    kw = dict(compression="gzip", compression_opts=4) if compress else {}
    with h5py.File(path, "w") as f:
        for name, arr in (("x1", x1), ("x2", x2), ("x3", x3), ("y", y)):
            arr = np.asarray(arr, np.float32)
            chunks = (min(chunk_rows, len(arr)),) + arr.shape[1:]
            f.create_dataset(name, data=arr, chunks=chunks, **kw)


def save_passive_h5(path, x1, x2, x3, x4, x5, y, compress: bool = False,
                    chunk_rows: int = 256):
    """Write the passive 6-tuple schema."""
    _require_h5()
    kw = dict(compression="gzip", compression_opts=4) if compress else {}
    with h5py.File(path, "w") as f:
        for name, arr in (("x1", x1), ("x2", x2), ("x3", x3),
                          ("x4", x4), ("x5", x5), ("y", y)):
            arr = np.asarray(arr, np.float32)
            chunks = (min(chunk_rows, len(arr)),) + arr.shape[1:]
            f.create_dataset(name, data=arr, chunks=chunks, **kw)


def load_arrays_from_h5(path):
    """Whole-file load -> tuple of arrays in schema order
    (data_save.py:318-329, generalised to both schemas)."""
    _require_h5()
    with h5py.File(path, "r") as f:
        keys = [k for k in ("x1", "x2", "x3", "x4", "x5", "y") if k in f]
        return tuple(f[k][:] for k in keys)


class _H5Dataset:
    """Array-of-record access over an H5 file.

    preload=True (default) reads everything into RAM once — the reference
    datasets are ~4 GB for the 72k active split, trivially resident on a
    TPU host. preload=False keeps the file open (SWMR read-only) and
    serves contiguous row ranges on demand."""

    KEYS: tuple = ()

    def __init__(self, path, preload: bool = True):
        _require_h5()
        self.path = path
        self.preload = preload
        with h5py.File(path, "r") as f:
            for k in self.KEYS:
                if k not in f:
                    raise KeyError(f"{path} missing dataset '{k}' "
                                   f"(expected schema {self.KEYS})")
            self.length = f[self.KEYS[0]].shape[0]
            self.shapes = {k: f[k].shape[1:] for k in self.KEYS}
            if preload:
                self._data = {k: f[k][:].astype(np.float32) for k in self.KEYS}
        self._file = None

    def _f(self):
        if self._file is None:
            self._file = h5py.File(self.path, "r", libver="latest", swmr=True)
        return self._file

    def __len__(self):
        return self.length

    def rows(self, idx):
        """Gather rows by (sorted-friendly) index array -> tuple of arrays."""
        idx = np.asarray(idx)
        if self.preload:
            return tuple(self._data[k][idx] for k in self.KEYS)
        f = self._f()
        # h5py fancy selection needs sorted UNIQUE indices; read the unique
        # set and expand back to the requested order.
        uniq, inverse = np.unique(idx, return_inverse=True)
        return tuple(f[k][uniq][inverse].astype(np.float32)
                     for k in self.KEYS)

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None


class ActiveH5Dataset(_H5Dataset):
    """The 4-tuple (wavL, wavR, x3, y) reader — the data module the
    reference lost (SURVEY.md §2.9; contract from train_biear.py:283-287)."""
    KEYS = ("x1", "x2", "x3", "y")


class PassiveH5Dataset(_H5Dataset):
    """The 6-tuple (x1, x2, x3, x4, x5, y) reader (data_save.py:239-316)."""
    KEYS = ("x1", "x2", "x3", "x4", "x5", "y")

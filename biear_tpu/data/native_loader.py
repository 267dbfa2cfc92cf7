"""ctypes bindings for the native (C++) binary-shard data loader.

The shard format and gather/decode core live in native/loader.cc; this
module compiles it on demand (g++ -O3 -shared), binds it via ctypes, and
wraps it in the same `.rows()` dataset interface the H5 readers expose —
so the runner/pipeline consume it interchangeably. Raw int16 waveform
shards decode to float32 in native code during the gather (half the disk
and memory bandwidth of float wav storage).

Writer: `write_shard(path, arrays, dtypes)`; converter from H5 in
tools/h5_to_shard.py.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_MAGIC = 0x42494541525F4250
_HERE = os.path.dirname(os.path.abspath(__file__))
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cc")
_SO = os.path.join(_NATIVE_DIR, "libbiear_loader.so")

_lib = None


def _build_if_needed() -> str:
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
               _SRC, "-o", _SO]
        subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build_if_needed())
        lib.bl_open.restype = ctypes.c_void_p
        lib.bl_open.argtypes = [ctypes.c_char_p]
        lib.bl_meta.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_uint64),
                                ctypes.POINTER(ctypes.c_uint32)]
        lib.bl_field_elems.restype = ctypes.c_uint64
        lib.bl_field_elems.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.bl_field_dtype.restype = ctypes.c_uint32
        lib.bl_field_dtype.argtypes = [ctypes.c_void_p, ctypes.c_uint32]
        lib.bl_gather.restype = ctypes.c_int
        lib.bl_gather.argtypes = [ctypes.c_void_p, ctypes.c_uint32,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.c_int64,
                                  ctypes.POINTER(ctypes.c_float),
                                  ctypes.c_float, ctypes.c_int]
        lib.bl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def write_shard(path: str, arrays, dtypes=None):
    """Write a shard: arrays = list of (N, ...) numpy arrays (same N);
    dtypes[i] in {'f32','i16'} (i16 stores round(x * 32767))."""
    n = len(arrays[0])
    dtypes = dtypes or ["f32"] * len(arrays)
    with open(path, "wb") as f:
        f.write(struct.pack("<QII Q", _MAGIC, 1, len(arrays), n))
        for a, d in zip(arrays, dtypes):
            assert len(a) == n
            elems = int(np.prod(a.shape[1:], dtype=np.int64))
            f.write(struct.pack("<IQ", 1 if d == "i16" else 0, elems))
        for a, d in zip(arrays, dtypes):
            flat = np.ascontiguousarray(a).reshape(n, -1)
            if d == "i16":
                flat = np.clip(np.round(flat * 32767.0), -32768,
                               32767).astype("<i2")
            else:
                flat = flat.astype("<f4")
            f.write(flat.tobytes())


class ShardDataset:
    """Native-backed dataset with the standard .rows()/__len__ interface.

    shapes: optional list of per-row shapes to reshape fields into
    (default: flat rows). int16 fields decode with scale 1/32767."""

    def __init__(self, path: str, shapes=None, n_threads: int | None = None):
        self._lib = _load()
        self._h = self._lib.bl_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open shard {path}")
        n_rows = ctypes.c_uint64()
        n_fields = ctypes.c_uint32()
        self._lib.bl_meta(self._h, ctypes.byref(n_rows),
                          ctypes.byref(n_fields))
        self.length = int(n_rows.value)
        self.n_fields = int(n_fields.value)
        self._elems = [int(self._lib.bl_field_elems(self._h, i))
                       for i in range(self.n_fields)]
        self._dtypes = [int(self._lib.bl_field_dtype(self._h, i))
                        for i in range(self.n_fields)]
        if shapes is not None:
            if len(shapes) != self.n_fields:
                raise ValueError(
                    f"{path}: shard has {self.n_fields} fields but "
                    f"{len(shapes)} shapes were given — wrong schema "
                    f"(active is 4 fields, passive 6)?")
            for i, shp in enumerate(shapes):
                want = int(np.prod(shp, dtype=np.int64))
                if want != self._elems[i]:
                    raise ValueError(
                        f"{path}: field {i} holds {self._elems[i]} elems "
                        f"per row, but shape {tuple(shp)} needs {want} — "
                        f"shard geometry does not match the run config")
        self.shapes = shapes
        self.n_threads = n_threads or min(4, os.cpu_count() or 1)

    def __len__(self):
        return self.length

    def rows(self, idx):
        idx = np.ascontiguousarray(np.asarray(idx, np.int64))
        out = []
        for i in range(self.n_fields):
            buf = np.empty((len(idx), self._elems[i]), np.float32)
            scale = (1.0 / 32767.0) if self._dtypes[i] == 1 else 1.0
            rc = self._lib.bl_gather(
                self._h, i,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(idx),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.c_float(scale), self.n_threads)
            if rc != 0:
                raise RuntimeError(f"bl_gather failed on field {i}")
            if self.shapes is not None:
                buf = buf.reshape((len(idx),) + tuple(self.shapes[i]))
            out.append(buf)
        return tuple(out)

    def close(self):
        if self._h:
            self._lib.bl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

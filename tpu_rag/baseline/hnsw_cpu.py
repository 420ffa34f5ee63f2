"""ctypes binding for the first-party C++ HNSW (native/hnsw.cc).

This is the honest CPU-ANN baseline mandated by BASELINE.md config #1: the
reference serves ANN queries through Chroma -> hnswlib (C++), which is not in
this image, so bench.py measures the TPU engine's QPS ratio against this
implementation of the same algorithm (cosine HNSW, ef-beam search) instead of
numpy brute force.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _HERE / "libhnsw.so"
_build_lock = threading.Lock()
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _build_lock:
        if _lib is not None:
            return _lib
        if not _LIB_PATH.is_file():
            subprocess.run(["make", "-C", str(_HERE), "libhnsw.so"], check=True,
                           capture_output=True, timeout=180)
        lib = ctypes.CDLL(str(_LIB_PATH))
        c_float_p = ctypes.POINTER(ctypes.c_float)
        c_i64_p = ctypes.POINTER(ctypes.c_int64)
        lib.hnsw_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                    ctypes.c_int, ctypes.c_uint]
        lib.hnsw_create.restype = ctypes.c_void_p
        lib.hnsw_free.argtypes = [ctypes.c_void_p]
        lib.hnsw_size.argtypes = [ctypes.c_void_p]
        lib.hnsw_size.restype = ctypes.c_int
        lib.hnsw_add.argtypes = [ctypes.c_void_p, c_float_p, c_i64_p, ctypes.c_int]
        lib.hnsw_add.restype = ctypes.c_int
        lib.hnsw_search.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int,
                                    ctypes.c_int, c_i64_p, c_float_p]
        lib.hnsw_search.restype = ctypes.c_int
        lib.hnsw_search_batch.argtypes = [ctypes.c_void_p, c_float_p, ctypes.c_int,
                                          ctypes.c_int, ctypes.c_int, c_i64_p,
                                          c_float_p, ctypes.c_int]
        lib.hnsw_save.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.hnsw_save.restype = ctypes.c_int
        lib.hnsw_load.argtypes = [ctypes.c_char_p]
        lib.hnsw_load.restype = ctypes.c_void_p
        _lib = lib
    return _lib


def _as_f32_c(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.float32)


class CpuHnswIndex:
    """Cosine-space HNSW over float32 vectors (M/ef defaults match hnswlib's
    common configuration; Chroma 0.5 uses M=16, ef_construction=100)."""

    def __init__(self, dim: int, max_elements: int, *, m: int = 16,
                 ef_construction: int = 100, seed: int = 100) -> None:
        self._lib = _load_lib()
        self.dim = dim
        self._handle = self._lib.hnsw_create(dim, max_elements, m,
                                             ef_construction, seed)
        if not self._handle:
            raise RuntimeError("hnsw_create failed")

    def __len__(self) -> int:
        return self._lib.hnsw_size(self._handle)

    def add(self, vectors: np.ndarray, ids: np.ndarray | None = None) -> int:
        vectors = _as_f32_c(vectors)
        n = vectors.shape[0]
        if ids is None:
            ids = np.arange(len(self), len(self) + n, dtype=np.int64)
        ids = np.ascontiguousarray(ids, dtype=np.int64)
        added = self._lib.hnsw_add(
            self._handle,
            vectors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n)
        if added != n:
            raise RuntimeError(f"index full: added {added}/{n}")
        return added

    def search(self, queries: np.ndarray, k: int, *, ef: int = 64,
               n_threads: int | None = None) -> tuple[np.ndarray, np.ndarray]:
        """Batch query. Returns (ids [nq,k] int64 with -1 padding,
        distances [nq,k] float32, cosine distance = 1 - cos)."""
        queries = _as_f32_c(np.atleast_2d(queries))
        nq = queries.shape[0]
        if n_threads is None:
            n_threads = min(nq, os.cpu_count() or 1)
        out_ids = np.empty((nq, k), dtype=np.int64)
        out_scores = np.empty((nq, k), dtype=np.float32)
        self._lib.hnsw_search_batch(
            self._handle,
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nq, k,
            max(ef, k),
            out_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            n_threads)
        return out_ids, out_scores

    def save(self, path: str) -> None:
        """Persist graph + vectors (analogue of hnswlib's on-disk segments)."""
        if self._lib.hnsw_save(self._handle, str(path).encode()) != 0:
            raise RuntimeError(f"hnsw_save failed: {path}")

    @classmethod
    def load(cls, path: str) -> "CpuHnswIndex":
        lib = _load_lib()
        handle = lib.hnsw_load(str(path).encode())
        if not handle:
            raise RuntimeError(f"hnsw_load failed: {path}")
        obj = cls.__new__(cls)
        obj._lib = lib
        obj._handle = handle
        # recover dim from a probe search buffer-free call path: store not
        # needed — dim only matters for input reshaping, read from file header
        with open(path, "rb") as f:
            import struct
            header = struct.unpack("<6i", f.read(24))
        obj.dim = header[1]
        return obj

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.hnsw_free(self._handle)
        except Exception:
            pass

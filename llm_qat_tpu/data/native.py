"""ctypes bindings for the native C++ data kernels (native/fast_data.cpp).

Compiles the shared library on first use (g++ -O3) into
`native/libfastdata.so` and exposes `chunk_tokens_native` /
`gather_rows_native` with the exact semantics of the Python
`lm_datasets.chunk_tokens`. Falls back to the Python implementations if the
toolchain is unavailable (`is_available()` reports which path is active).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "fast_data.cpp"
_LIB = _REPO_ROOT / "native" / "libfastdata.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or (_SRC.exists()
                             and _SRC.stat().st_mtime > _LIB.stat().st_mtime):
        if not _SRC.exists() or not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.count_windows.restype = ctypes.c_int64
        lib.count_windows.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_bool]
        lib.chunk_tokens.restype = ctypes.c_int64
        lib.chunk_tokens.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_bool,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.gather_rows.restype = None
        lib.gather_rows.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def is_available() -> bool:
    return _load() is not None


def _ptr32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def chunk_tokens_native(tokens: np.ndarray, max_length: int, doc_stride: int,
                        pad_id: int, drop_partial: bool = False
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Native chunking; returns None when the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    tokens = np.ascontiguousarray(tokens, np.int32)
    step = doc_stride if doc_stride > 0 else max_length
    n_rows = lib.count_windows(len(tokens), max_length, step, drop_partial)
    ids = np.empty((n_rows, max_length), np.int32)
    labels = np.empty((n_rows, max_length), np.int32)
    if n_rows:
        written = lib.chunk_tokens(
            _ptr32(tokens), len(tokens), max_length, step, pad_id,
            drop_partial, _ptr32(ids), _ptr32(labels),
        )
        assert written == n_rows, (written, n_rows)
    return ids, labels


def gather_rows_native(data: np.ndarray,
                       indices: np.ndarray) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.int32)
    indices = np.ascontiguousarray(indices, np.int64)
    out = np.empty((len(indices), data.shape[1]), np.int32)
    lib.gather_rows(
        _ptr32(data), data.shape[1],
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), _ptr32(out),
    )
    return out

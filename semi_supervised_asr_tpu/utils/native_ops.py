"""ctypes bindings for the native C++ scoring kernel, with numpy fallback.

The shared library is built lazily on first use (g++ -O2 -shared) and cached
next to the source; pybind11 is not in this image, so plain ctypes is the
binding layer (a C ABI with int32 buffers).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_SRC = _NATIVE_DIR / "edit_distance.cpp"
_SO = _NATIVE_DIR / "libedit_distance.so"

_lib = None
_build_failed = False


def _load() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO))
        lib.batch_edit_distance.restype = None
        lib.batch_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except Exception:
        _build_failed = True
        return None
    return _lib


def _as_i32(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x), dtype=np.int32)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _edit_distance_py(a: np.ndarray, b: np.ndarray) -> int:
    """Pure-numpy rolling-row Levenshtein (fallback)."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    row = np.arange(lb + 1, dtype=np.int32)
    for i in range(1, la + 1):
        prev_diag = row[0]
        row[0] = i
        for j in range(1, lb + 1):
            cur = row[j]
            row[j] = min(
                prev_diag + (a[i - 1] != b[j - 1]),
                cur + 1,
                row[j - 1] + 1,
            )
            prev_diag = cur
    return int(row[lb])


def _map_seq_py(seq: np.ndarray, table: np.ndarray | None) -> np.ndarray:
    if table is None:
        return seq
    valid = (seq >= 0) & (seq < len(table))
    mapped = table[np.clip(seq, 0, len(table) - 1)]
    return mapped[valid & (mapped >= 0)]


def batch_edit_distance(
    hyps: np.ndarray,        # [B, Uh] int padded
    hyp_lens: np.ndarray,    # [B]
    refs: np.ndarray,        # [B, Ur] int padded
    ref_lens: np.ndarray,    # [B]
    fold_table: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """-> (distances [B], folded ref lengths [B]).

    If ``fold_table`` is given (e.g. vocab.timit_39_id_map), both sides are
    mapped through it first; -1 entries delete the token (TIMIT 'q',
    specials).
    """
    hyps, refs = _as_i32(hyps), _as_i32(refs)
    hyp_lens, ref_lens = _as_i32(hyp_lens), _as_i32(ref_lens)
    b = hyps.shape[0]
    assert refs.shape[0] == b
    lib = _load()
    out = np.zeros(b, np.int32)
    reflen = np.zeros(b, np.int32)
    if lib is not None:
        table = _as_i32(fold_table) if fold_table is not None else None
        lib.batch_edit_distance(
            _ptr(hyps), _ptr(hyp_lens), hyps.shape[1],
            _ptr(refs), _ptr(ref_lens), refs.shape[1], b,
            _ptr(table) if table is not None else None,
            len(table) if table is not None else 0,
            _ptr(out), _ptr(reflen),
        )
        return out, reflen
    # numpy fallback
    table = _as_i32(fold_table) if fold_table is not None else None
    for i in range(b):
        a = _map_seq_py(hyps[i, : hyp_lens[i]], table)
        r = _map_seq_py(refs[i, : ref_lens[i]], table)
        out[i] = _edit_distance_py(a, r)
        reflen[i] = len(r)
    return out, reflen


def native_available() -> bool:
    return _load() is not None

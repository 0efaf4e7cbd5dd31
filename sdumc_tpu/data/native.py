"""ctypes bindings for the native C++ data plane (native/sdumc_data.cc).

Replaces the reference's 12-process .npy reader pool
(toolkit/utils/read_data.py:70-91) and python collater with a thread-pooled
C++ reader that pads / mean-pool-compresses directly into the batch buffer.
Falls back to the pure-python path when the library isn't built
(``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libsdumc_data.so",
)
_lib = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sdumc_fill_batch.restype = ctypes.c_int
    lib.sdumc_fill_batch.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.sdumc_read_npy_into.restype = ctypes.c_int64
    lib.sdumc_read_npy_into.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def fill_batch(paths: List[str], bucket: int, dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel-read `paths` into a zero-padded [B, bucket, dim] batch.

    Overlong clips are mean-pool-compressed into the bucket with the
    reference's func_mapping_feature semantics. Returns (batch, lengths).
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built; run native/build.sh")
    b = len(paths)
    out = np.zeros((b, bucket, dim), np.float32)
    lengths = np.zeros((b,), np.int64)
    blob = b"\x00".join(p.encode() for p in paths) + b"\x00"
    rc = lib.sdumc_fill_batch(
        blob, b, bucket, dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise IOError(f"native batch fill failed for one of {len(paths)} files")
    return out, lengths


def fill_batch_packed(bin_path: str, entries: List[Tuple[int, int, int]],
                      bucket: int, dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel-read clips from a packed blob (data/packed.py layout) into a
    zero-padded [B, bucket, dim] batch with the same pad-or-compress
    semantics as fill_batch. ``entries`` are (float_offset, rows, cols)
    triples from the PackedSource index."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built; run native/build.sh")
    if not hasattr(lib, "_packed_bound"):
        lib.sdumc_fill_batch_packed.restype = ctypes.c_int
        lib.sdumc_fill_batch_packed.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
        ]
        lib._packed_bound = True
    b = len(entries)
    offs = np.ascontiguousarray([e[0] for e in entries], np.int64)
    rows = np.ascontiguousarray([e[1] for e in entries], np.int64)
    cols = np.ascontiguousarray([e[2] for e in entries], np.int64)
    out = np.zeros((b, bucket, dim), np.float32)
    lengths = np.zeros((b,), np.int64)
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    rc = lib.sdumc_fill_batch_packed(
        bin_path.encode(), i64p(offs), i64p(rows), i64p(cols),
        b, bucket, dim,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), i64p(lengths))
    if rc != 0:
        raise IOError(f"native packed batch fill failed ({b} clips)")
    return out, lengths

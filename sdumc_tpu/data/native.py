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
                      bucket: int, dim: int, dtype: str = "float32",
                      out: Optional[np.ndarray] = None,
                      prev_lengths: Optional[np.ndarray] = None,
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Parallel-read clips from a packed blob (data/packed.py layout) into a
    zero-padded [B, bucket, dim] batch with the same pad-or-compress
    semantics as fill_batch. ``entries`` are (element_offset, rows, cols)
    triples from the PackedSource index; ``dtype`` is the blob's payload
    dtype ('float32' | 'bfloat16') and the output dtype.

    Uses the single-touch mmap fill (sdumc_fill_batch_packed2): every output
    byte is written at most once in C++, so the batch buffer is allocated
    UNINITIALIZED here — the producer is host-memory-bandwidth-bound and a
    redundant zero pass costs throughput one-for-one.

    Ring-buffer reuse: pass ``out`` (a buffer from a previous call) together
    with ``prev_lengths`` (that call's returned lengths). Rows beyond each
    slot's previous extent are still zero, so the pad memset shrinks to
    [new_len, prev_len) — and reuse avoids fresh-page faults entirely."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built; run native/build.sh")
    if not hasattr(lib, "_packed_bound"):
        lib.sdumc_fill_batch_packed2.restype = ctypes.c_int
        lib.sdumc_fill_batch_packed2.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ]
        lib._packed_bound = True
    if dtype == "bfloat16":
        import ml_dtypes

        np_dtype, dt_code = np.dtype(ml_dtypes.bfloat16), 1
    elif dtype == "int8":
        np_dtype, dt_code = np.dtype(np.int8), 2
    else:
        np_dtype, dt_code = np.dtype(np.float32), 0
    if isinstance(entries, tuple) and len(entries) >= 3 and isinstance(
            entries[0], np.ndarray):
        # vectorized form: (offs, rows, cols) arrays from
        # PackedSource.entry_arrays — no per-clip python tuples
        offs = np.ascontiguousarray(entries[0], np.int64)
        rows = np.ascontiguousarray(entries[1], np.int64)
        cols = np.ascontiguousarray(entries[2], np.int64)
        b = len(offs)
    else:
        b = len(entries)
        offs = np.ascontiguousarray([e[0] for e in entries], np.int64)
        rows = np.ascontiguousarray([e[1] for e in entries], np.int64)
        cols = np.ascontiguousarray([e[2] for e in entries], np.int64)
    i64p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    if out is None:
        out = np.empty((b, bucket, dim), np_dtype)
        prev_p = None
    else:
        assert out.shape == (b, bucket, dim) and out.dtype == np_dtype
        if prev_lengths is None:
            prev_p = None  # unknown history: full pad zeroing
        else:
            prev = np.ascontiguousarray(prev_lengths, np.int64)
            assert prev.shape == (b,)
            prev_p = i64p(prev)
    lengths = np.empty((b,), np.int64)
    rc = lib.sdumc_fill_batch_packed2(
        bin_path.encode(), i64p(offs), i64p(rows), i64p(cols),
        b, bucket, dim, ctypes.c_void_p(out.ctypes.data), i64p(lengths),
        dt_code, prev_p)
    if rc != 0:
        raise IOError(f"native packed batch fill failed ({b} clips)")
    return out, lengths

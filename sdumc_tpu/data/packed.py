"""Packed single-file feature store (the LMDB-store equivalent).

The reference ships a lazy LMDB dataset variant that is broken (lmdb never
imported, feat_data.py:452-554). This is the working TPU-era counterpart:
all of a feature type's [T, D] clips concatenated into one blob with a JSON
index — one file handle, mmap reads, trivially rsync/GCS-friendly for
multi-host streaming.

Payload dtype is float32 (checkpoint-exact parity path) or bfloat16 (the
benchmarked production path: the device consumes bf16 features, so a bf16
blob halves both the disk bytes and the host-side batch-assembly bytes —
the producer is memory-bandwidth-bound, so that is a direct 2x).

    pack:   {dir}/{clip}.npy ...  ->  {out}.bin + {out}.json
    read:   PackedSource(out).get(clip) -> np.ndarray [T, D] (zero-copy view)
"""

from __future__ import annotations


import json
import os
from typing import Dict, Sequence

import numpy as np


def _np_dtype(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def pack_features(src_dir: str, out_prefix: str, names: Sequence[str] | None = None,
                  dtype: str = "float32") -> str:
    # os.listdir, NOT glob: the live feat4 dir name contains glob
    # metacharacters ("...wav+prompt[take_generate_wordembed_-4]") that turn
    # a glob pattern into an (empty) character-class match
    files = (
        [os.path.join(src_dir, n + ".npy") for n in names]
        if names is not None
        else sorted(os.path.join(src_dir, f) for f in os.listdir(src_dir)
                    if f.endswith(".npy"))
    )
    dt = _np_dtype(dtype)
    index: Dict[str, list] = {}
    offset = 0
    with open(out_prefix + ".bin", "wb") as blob:
        for path in files:
            arr = np.load(path)
            if arr.ndim == 1:
                arr = arr[None, :]
            arr = np.ascontiguousarray(arr.astype(dt))
            clip = os.path.basename(path)[:-4]
            index[clip] = [offset, int(arr.shape[0]), int(arr.shape[1])]
            blob.write(arr.tobytes())
            offset += arr.size
    with open(out_prefix + ".json", "w") as f:
        json.dump({"dtype": dtype, "index": index}, f)
    return out_prefix


class PackedSource:
    """Feature source over a packed blob; same protocol as NpyDirSource
    (get / dim / length_of), mmap-backed so reads are lazy and shared."""

    def __init__(self, prefix: str, name: str = "packed"):
        self.name = name
        self._prefix = prefix
        with open(prefix + ".json") as f:
            meta = json.load(f)
        self._index = meta["index"]
        self.dtype_name = meta.get("dtype", "float32")
        self._dtype = _np_dtype(self.dtype_name)
        self._blob = np.memmap(prefix + ".bin", dtype=self._dtype, mode="r")

    def get(self, clip: str) -> np.ndarray:
        off, rows, cols = self._index[clip]
        return np.asarray(self._blob[off : off + rows * cols]).reshape(rows, cols)

    def length_of(self, clip: str) -> int:
        return self._index[clip][1]

    @property
    def dim(self) -> int:
        return next(iter(self._index.values()))[2]

    def __contains__(self, clip: str) -> bool:
        return clip in self._index


def fill_batch_from_packed(src: "PackedSource", names, bucket: int,
                           dim: int | None = None):
    """[B, bucket, dim] batch straight out of the packed blob — native
    single-touch mmap fill when libsdumc_data is built
    (sdumc_fill_batch_packed2), python mmap gather otherwise. Same
    pad-or-mean-pool semantics as the .npy path (collate.mapping_feature).
    Output dtype == the store's payload dtype. Returns (batch, lengths)."""
    dim = dim or src.dim
    entries = [tuple(src._index[n]) for n in names]
    try:
        from sdumc_tpu.data import native

        if native.available():
            return native.fill_batch_packed(
                src._prefix + ".bin", entries, bucket, dim,
                dtype=src.dtype_name)
    except Exception:
        pass
    from sdumc_tpu.data.collate import mapping_feature

    out = np.zeros((len(names), bucket, dim), src._dtype)
    lengths = np.zeros((len(names),), np.int64)
    for i, n in enumerate(names):
        raw = src.get(n)
        if len(raw) > bucket:
            # pool in f32 (the C++ path accumulates f32 too), cast back
            feat = mapping_feature(raw.astype(np.float32), bucket).astype(src._dtype)
        else:
            feat = raw
        out[i, : len(feat), : feat.shape[1]] = feat
        lengths[i] = len(feat)
    return out, lengths

"""Packed single-file feature store (the LMDB-store equivalent).

The reference ships a lazy LMDB dataset variant that is broken (lmdb never
imported, feat_data.py:452-554). This is the working TPU-era counterpart:
all of a feature type's [T, D] clips concatenated into one float32 blob with
a JSON index — one file handle, mmap reads, trivially rsync/GCS-friendly for
multi-host streaming.

    pack:   {dir}/{clip}.npy ...  ->  {out}.bin + {out}.json
    read:   PackedSource(out).get(clip) -> np.ndarray [T, D] (zero-copy view)
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Sequence

import numpy as np


def pack_features(src_dir: str, out_prefix: str, names: Sequence[str] | None = None) -> str:
    files = (
        [os.path.join(src_dir, n + ".npy") for n in names]
        if names is not None
        else sorted(glob.glob(os.path.join(src_dir, "*.npy")))
    )
    index: Dict[str, list] = {}
    offset = 0
    with open(out_prefix + ".bin", "wb") as blob:
        for path in files:
            arr = np.load(path)
            if arr.ndim == 1:
                arr = arr[None, :]
            arr = np.ascontiguousarray(arr, dtype=np.float32)
            clip = os.path.basename(path)[:-4]
            index[clip] = [offset, int(arr.shape[0]), int(arr.shape[1])]
            blob.write(arr.tobytes())
            offset += arr.size
    with open(out_prefix + ".json", "w") as f:
        json.dump({"dtype": "float32", "index": index}, f)
    return out_prefix


class PackedSource:
    """Feature source over a packed blob; same protocol as NpyDirSource
    (get / dim / length_of), mmap-backed so reads are lazy and shared."""

    def __init__(self, prefix: str, name: str = "packed"):
        self.name = name
        with open(prefix + ".json") as f:
            meta = json.load(f)
        self._index = meta["index"]
        self._blob = np.memmap(prefix + ".bin", dtype=np.float32, mode="r")

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

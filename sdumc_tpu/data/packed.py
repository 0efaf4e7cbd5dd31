"""Packed single-file feature store (the LMDB-store equivalent).

The reference ships a lazy LMDB dataset variant that is broken (lmdb never
imported, feat_data.py:452-554). This is the working TPU-era counterpart:
all of a feature type's [T, D] clips concatenated into one blob with a JSON
index — one file handle, mmap reads, trivially rsync/GCS-friendly for
multi-host streaming.

Payload dtype is float32 (checkpoint-exact parity path), bfloat16 (halves
the host bytes; the device consumes bf16 features), or int8 (halves them
AGAIN): the 1-core producer is memory-bandwidth-bound at ~12 GB/s of
read+write payload touches (bench.py host bound proof), so payload width
converts to clips/s one-for-one. int8 stores per-clip per-CHANNEL symmetric
scales in a ``{out}.scales.bin`` sidecar ([cols] f32 per clip, offsets in
the index); dequantization happens ON DEVICE inside the jitted step
(train/step.py dequant_features) where HBM runs at 819 GB/s — the host
never touches a float.

    pack:   {dir}/{clip}.npy ...  ->  {out}.bin + {out}.json [+ .scales.bin]
    read:   PackedSource(out).get(clip) -> np.ndarray [T, D] (zero-copy view
            for f32/bf16; int8 stores dequantize in get() — use
            fill_batch_from_packed + scales_for for the raw production path)
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


def quantize_clip(arr: np.ndarray):
    """Symmetric per-channel int8: [T, D] f32 -> (int8 [T, D], f32 [D]
    scales). absmax/127 per channel; all-zero channels get scale 1 so the
    round-trip stays exact-zero."""
    amax = np.abs(arr).max(axis=0).astype(np.float32)
    scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(arr / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale


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
    quant = dtype == "int8"
    dt = _np_dtype(dtype)
    index: Dict[str, list] = {}
    offset = 0
    scale_off = 0
    scales_f = open(out_prefix + ".scales.bin", "wb") if quant else None
    with open(out_prefix + ".bin", "wb") as blob:
        for path in files:
            arr = np.load(path)
            if arr.ndim == 1:
                arr = arr[None, :]
            clip = os.path.basename(path)[:-4]
            if quant:
                q, scale = quantize_clip(np.asarray(arr, np.float32))
                # index entry: [offset, rows, cols, scale_offset]
                index[clip] = [offset, int(q.shape[0]), int(q.shape[1]),
                               scale_off]
                blob.write(np.ascontiguousarray(q).tobytes())
                scales_f.write(scale.tobytes())
                offset += q.size
                scale_off += scale.size
            else:
                arr = np.ascontiguousarray(arr.astype(dt))
                index[clip] = [offset, int(arr.shape[0]), int(arr.shape[1])]
                blob.write(arr.tobytes())
                offset += arr.size
    if scales_f is not None:
        scales_f.close()
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
        self._scales = (np.memmap(prefix + ".scales.bin", dtype=np.float32,
                                  mode="r")
                        if self.dtype_name == "int8" else None)
        # vectorized index arrays: the per-batch python loops over
        # per-clip index entries (lengths, offsets) were measurable once
        # int8 halved the payload bytes — one fancy-index replaces them
        ncols = 4 if self.dtype_name == "int8" else 3
        self._entry_mat = np.array(
            [e[:ncols] for e in self._index.values()], np.int64).reshape(
            len(self._index), ncols)
        self._row_of = {n: i for i, n in enumerate(self._index)}

    def entry_arrays(self, names):
        """(offs, rows, cols[, soffs]) int64 arrays for a name batch —
        one gather instead of B python index lookups."""
        rows = np.fromiter((self._row_of[n] for n in names), np.int64,
                           len(names))
        return self._entry_mat[rows].T

    def lengths_for(self, names) -> np.ndarray:
        return self.entry_arrays(names)[1]

    def get(self, clip: str) -> np.ndarray:
        entry = self._index[clip]
        off, rows, cols = entry[:3]
        raw = np.asarray(self._blob[off : off + rows * cols]).reshape(rows, cols)
        if self._scales is not None:  # generic consumers get dequantized f32
            return raw.astype(np.float32) * self.scales_for(clip)[None, :]
        return raw

    def get_raw(self, clip: str) -> np.ndarray:
        """Payload codes without dequantization (the production fill path)."""
        off, rows, cols = self._index[clip][:3]
        return np.asarray(self._blob[off : off + rows * cols]).reshape(rows, cols)

    def scales_for(self, clip: str) -> np.ndarray:
        """[cols] f32 per-channel scales of an int8 store (zero-copy view)."""
        entry = self._index[clip]
        off, rows, cols = entry[:3]
        soff = entry[3]
        return np.asarray(self._scales[soff : soff + cols])

    def scales_matrix(self):
        """[n_clips, dim] view of the scale sidecar when every clip has the
        same channel count (enables the vectorized batch_scales gather);
        None for non-int8 stores or ragged channel counts."""
        if self._scales is None:
            return None
        if not hasattr(self, "_scales_mat"):
            cols = {e[2] for e in self._index.values()}
            self._scales_mat = (
                np.asarray(self._scales).reshape(-1, cols.pop())
                if len(cols) == 1 and self._scales.size else None)
        return self._scales_mat

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
    entries = [tuple(src._index[n][:3]) for n in names]
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
        raw = src.get_raw(n) if src.dtype_name == "int8" else src.get(n)
        if len(raw) > bucket:
            # pool in f32 (the C++ path accumulates f32 too), cast back —
            # for int8 the C cast and numpy astype both truncate toward 0
            feat = mapping_feature(raw.astype(np.float32), bucket).astype(src._dtype)
        else:
            feat = raw
        out[i, : len(feat), : feat.shape[1]] = feat
        lengths[i] = len(feat)
    return out, lengths


def batch_scales(src: "PackedSource", names, dim: int | None = None) -> np.ndarray:
    """[B, dim] f32 per-clip per-channel dequant scales of an int8 store
    (tiny next to the payload: B x dim floats vs B x bucket x dim codes).
    One vectorized row gather when every clip has ``dim`` channels (the
    production case) — the per-clip memmap-slice loop was ~9% of the whole
    producer once int8 halved the payload bytes."""
    dim = dim or src.dim
    mat = src.scales_matrix()
    if mat is not None and mat.shape[1] == dim:
        rows = np.fromiter((src._index[n][3] for n in names), np.int64,
                           len(names)) // dim
        return mat[rows]
    out = np.zeros((len(names), dim), np.float32)
    for i, n in enumerate(names):
        s = src.scales_for(n)
        out[i, : len(s)] = s
    return out

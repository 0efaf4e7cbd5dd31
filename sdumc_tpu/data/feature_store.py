"""Feature stores: where per-clip [T, D] arrays come from.

The L1->L3 contract (reference config.py:28-35 + feature dirs): a directory
per feature type holding ``{clip}.npy``. The reference eagerly loads *every*
file of all four feature sets into RAM through a 12-process pool at dataset
construction (toolkit/utils/read_data.py:70-91, feat_data.py:195-198). Here
the default is lazy mmap with an optional preload that goes through the
native C++ reader when built (native/, exposed via ctypes) and a thread pool
otherwise.
"""

from __future__ import annotations

import concurrent.futures as futures
import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class NpyDirSource:
    """Reads ``{root}/{feature_name}/{clip}.npy`` -> float32 [T, D].

    Utterance-level [D] files are promoted to [1, D]
    (read_data.py:36-38 semantics).
    """

    def __init__(self, feature_root: str, feature_name: str, preload_names: Optional[Sequence[str]] = None):
        self.root = os.path.join(feature_root, feature_name)
        self.name = feature_name
        self._cache: Dict[str, np.ndarray] = {}
        if preload_names is not None:
            self.preload(preload_names)

    def _read(self, clip: str) -> np.ndarray:
        arr = np.load(os.path.join(self.root, clip + ".npy"))
        arr = np.asarray(arr, dtype=np.float32)
        if arr.ndim == 1:
            arr = arr[None, :]
        return arr

    def preload(self, names: Sequence[str], workers: int = 12) -> None:
        with futures.ThreadPoolExecutor(max_workers=workers) as pool:
            for clip, arr in zip(names, pool.map(self._read, names)):
                self._cache[clip] = arr

    def get(self, clip: str) -> np.ndarray:
        arr = self._cache.get(clip)
        if arr is None:
            arr = self._read(clip)
        return arr

    def path_for(self, clip: str) -> str:
        return os.path.join(self.root, clip + ".npy")

    def length_of(self, clip: str) -> int:
        """Sequence length from the npy header only (no payload read)."""
        shape = npy_header_shape(self.path_for(clip))
        return shape[0] if len(shape) > 1 else 1

    @property
    def dim(self) -> int:
        if self._cache:
            return next(iter(self._cache.values())).shape[-1]
        for fn in os.listdir(self.root):
            if fn.endswith(".npy"):
                return self._read(fn[:-4]).shape[-1]
        raise FileNotFoundError(f"no .npy files under {self.root}")


def npy_header_shape(path: str) -> tuple:
    """Parse just the .npy header for the array shape (cheap length probe
    used by the native batching fast path)."""
    import ast

    with open(path, "rb") as f:
        magic = f.read(8)
        assert magic[:6] == b"\x93NUMPY", path
        if magic[6] == 1:
            (hlen,) = np.frombuffer(f.read(2), "<u2")
        else:
            (hlen,) = np.frombuffer(f.read(4), "<u4")
        header = ast.literal_eval(f.read(int(hlen)).decode("latin1"))
    return tuple(header["shape"])


class SyntheticSource:
    """Deterministic synthetic [T, D] features keyed by clip name.

    Stands in for the real feature store in tests and benchmarks: lengths
    and values are a pure function of (clip, feature_name, seed), so every
    process/host generates identical data. Length statistics default to the
    MOSEI regime (WavLM 50 Hz frames, LLM tokens, video frames).
    """

    def __init__(self, feature_name: str, dim: int, min_len: int = 8, max_len: int = 400, seed: int = 0, cache: bool = True):
        self.name = feature_name
        self._dim = dim
        self.min_len = min_len
        self.max_len = max_len
        self.seed = seed
        self._cache: Dict[str, np.ndarray] = {} if cache else None

    def _rng(self, clip: str) -> np.random.Generator:
        key = abs(hash((clip, self.name, self.seed))) % (2**32)
        return np.random.default_rng(key)

    def get(self, clip: str) -> np.ndarray:
        if self._cache is not None and clip in self._cache:
            return self._cache[clip]
        rng = self._rng(clip)
        t = int(rng.integers(self.min_len, self.max_len + 1))
        arr = rng.normal(size=(t, self._dim)).astype(np.float32)
        if self._cache is not None:
            self._cache[clip] = arr
        return arr

    @property
    def dim(self) -> int:
        return self._dim


def check_feature_completeness(source, names: Sequence[str]) -> List[str]:
    """Feature-store integrity check (reference
    toolkit/utils/functions.py:297-325): returns clips that fail to load."""
    bad = []
    for n in names:
        try:
            arr = source.get(n)
            if arr.size == 0 or not np.isfinite(arr).all():
                bad.append(n)
        except Exception:
            bad.append(n)
    return bad

"""OpenFace artifact readers (.hog binaries and per-frame .csv tables).

The reference's visual pipeline consumes OpenFace (a host-side C++ face
tracker) outputs from disk; these readers are its ingestion layer
(feature_extraction/visual/util.py:10-78). OpenFace itself stays an
external binary by design (SURVEY §2.1) — the contract is the files.

.hog layout (per frame): i32 num_cols, i32 num_rows, i32 num_channels,
f32 is_valid, then rows*cols*channels f32 features in row-major order.
OpenFace emits 12*12*31 = 4464 features per frame.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np


def read_hog(filename: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read an OpenFace .hog file.

    Returns (is_valid [num_frames], features [num_frames, num_features]).
    Vectorized re-derivation of the reference's batched struct loop
    (util.py:10-67): every frame record has the same 3-int header, so the
    whole file maps onto one [n_frames, 4 + n_feat] f32 view.
    """
    with open(filename, "rb") as f:
        header = f.read(12)
        if len(header) < 12:
            return np.zeros((0,)), np.zeros((0, 0))
        num_cols, num_rows, num_channels = struct.unpack("3i", header)
        num_feat = num_rows * num_cols * num_channels
        body = np.fromfile(f, dtype="<f4")
    rec = 1 + num_feat  # is_valid + features; header ints re-appear per frame
    # frame 0's header was consumed above; subsequent frames repeat it
    first = body[:rec]
    rest = body[rec:]
    n_rest = len(rest) // (3 + rec)
    rest = rest[: n_rest * (3 + rec)].reshape(n_rest, 3 + rec)[:, 3:]
    all_rows = np.concatenate([first[None, :], rest], axis=0) if len(first) == rec \
        else rest
    return all_rows[:, 0].copy(), all_rows[:, 1:].copy()


def read_csv(filename: str, start_idx: int) -> np.ndarray:
    """Read an OpenFace per-frame csv, keeping columns from ``start_idx``
    (reference util.py:71-78). Returns [num_frames, num_kept_columns]."""
    import pandas as pd

    data = pd.read_csv(filename)
    return data.iloc[:, start_idx:].to_numpy()

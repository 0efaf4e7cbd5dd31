"""Length remapping and batch assembly.

Reference semantics (toolkit/utils/read_data.py):

* ``func_mapping_feature`` (:120-137): shorter -> zero-pad at the end;
  longer -> *left*-pad with zeros to a multiple, reshape, mean over adjacent
  frames. Used for ``--feat_scale`` compression and utt/align modes.
* ``pad_to_maxlen_pre_modality_tensor_4`` (:223-248): per-batch max-length
  zero padding per modality, returning pad lengths.

TPU-first deltas: batches are padded up to a *static bucket* boundary and
carry the dynamic batch max as ``t_max`` so the model's softmax masks
reproduce the reference's batch-max numerics under one compiled graph per
bucket combination (see ops/masking.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import numpy as np


def mapping_feature(feature: np.ndarray, dst_len: int) -> np.ndarray:
    """Exact re-derivation of func_mapping_feature (read_data.py:120-137)."""
    featlen, featdim = feature.shape
    if featlen == dst_len:
        return feature
    if featlen < dst_len:
        pad = np.zeros((dst_len - featlen, featdim), dtype=feature.dtype)
        return np.concatenate([feature, pad], axis=0)
    if featlen % dst_len == 0:
        pad_len = 0
        pool = featlen // dst_len
    else:
        pad_len = dst_len - featlen % dst_len
        pool = featlen // dst_len + 1
    pad = np.zeros((pad_len, featdim), dtype=feature.dtype)
    feature = np.concatenate([pad, feature]).reshape(dst_len, pool, featdim)
    return feature.mean(axis=1)


def scale_compress(feature: np.ndarray, scale: int) -> np.ndarray:
    """--feat_scale pre-compression (read_data.py:186-191)."""
    if scale <= 1:
        return feature
    return mapping_feature(feature, math.ceil(len(feature) / scale))


def bucket_for(length: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= length; the largest bucket is a hard cap (features
    longer than it are mean-pool-compressed into it, preserving the
    reference's everything-fits contract instead of deleting clips)."""
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


@dataclasses.dataclass
class Batch:
    """One device-ready batch (all arrays static-shaped)."""

    audio: np.ndarray   # [B, Ta_bucket, Da]
    text: np.ndarray    # [B, Tt_bucket, Dt]
    video: np.ndarray   # [B, Tv_bucket, Dv]
    feat4: np.ndarray   # [B, Tf_bucket, Df]
    t_max: Tuple[int, int, int, int]   # dynamic batch max per modality
    lengths: np.ndarray  # [4, B] true sequence lengths
    emos: np.ndarray     # [B]
    vals: np.ndarray     # [B]
    names: List[str]
    # int8 feature store only: {"audio": [B, Da] f32, ...} per-clip
    # per-channel dequant scales; the arrays above then hold int8 codes and
    # the jitted step dequantizes on device (train/step.py dequant_features)
    scales: dict | None = None

    @property
    def size(self) -> int:
        return self.audio.shape[0]


def _pad_stack(feats: List[np.ndarray], bucket: int) -> np.ndarray:
    b = len(feats)
    d = feats[0].shape[-1]
    out = np.zeros((b, bucket, d), dtype=np.float32)
    for i, f in enumerate(feats):
        if len(f) > bucket:  # cap overflow: mean-pool into the largest bucket
            f = mapping_feature(f, bucket)
        out[i, : len(f)] = f
    return out


def make_batch(
    audios: List[np.ndarray],
    texts: List[np.ndarray],
    videos: List[np.ndarray],
    feat4s: List[np.ndarray],
    emos: np.ndarray,
    vals: np.ndarray,
    names: List[str],
    buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096),
) -> Batch:
    """Collate one batch with bucketed static shapes + reference t_max."""
    groups = (audios, texts, videos, feat4s)
    lengths = np.array([[len(f) for f in g] for g in groups], dtype=np.int32)
    t_max = tuple(int(min(lengths[i].max(), buckets[-1])) for i in range(4))
    padded = [
        _pad_stack(list(g), bucket_for(t_max[i], buckets))
        for i, g in enumerate(groups)
    ]
    return Batch(
        audio=padded[0],
        text=padded[1],
        video=padded[2],
        feat4=padded[3],
        t_max=t_max,
        lengths=np.minimum(lengths, buckets[-1]),
        emos=np.asarray(emos, dtype=np.float32),
        vals=np.asarray(vals, dtype=np.float32),
        names=list(names),
    )

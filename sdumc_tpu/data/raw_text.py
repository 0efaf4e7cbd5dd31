"""Raw-transcript dataset variant: tokenize in the collate.

Reference: ``Data_Feat_Vicuna_MOSEI_EmoVal_4F``
(toolkit/data/feat_data.py:263-365) — three pre-extracted feature streams
plus *raw English transcripts* read from a CSV, tokenized per batch with
the Vicuna tokenizer (``padding=True`` + attention mask), feeding
end-to-end LLM paths where the text tower runs inside the train graph. Its
collater pads the feature modalities with
``pad_to_maxlen_pre_modality_tensor_ReAMask`` (read_data.py:251-281) whose
masks are **1 at padding, 0 at valid frames**.

TPU-first deltas:

* token ids are padded to a *static bucket* boundary (one compiled program
  per bucket, no per-batch dynamic shapes) on the **left**, so the last
  token of every row sits at a fixed position — the layout autoregressive
  taps want;
* the tokenizer is pluggable: `hf_tokenizer(model_dir)` adapts any HF
  tokenizer (the reference hardcodes a local vicuna-7b-v1.5 path,
  feat_data.py:292), `WhitespaceTokenizer` is the hermetic stand-in for
  tests and smoke runs;
* masks follow the HF convention (1 = valid) — the model side already
  consumes lengths/masks, not the reference's inverted ReAMask.
"""

from __future__ import annotations

import csv
import dataclasses
from typing import Callable, Dict, List, Sequence, Tuple

import numpy as np

from sdumc_tpu.data.collate import Batch, bucket_for, make_batch


def read_transcripts(csv_path: str, name_col: str = "name",
                     text_col: str = "english") -> Dict[str, str]:
    """name -> transcript from the transcription CSV (feat_data.py:287-294;
    the same file preprocess/cmumosei.py writes)."""
    out = {}
    with open(csv_path, encoding="utf-8") as f:
        for row in csv.DictReader(f):
            out[row[name_col]] = row[text_col]
    return out


class WhitespaceTokenizer:
    """Deterministic hermetic tokenizer: hashed whitespace tokens over a
    fixed vocab, BOS prepended — enough to drive the end-to-end LLM path
    without a checkpoint on disk."""

    def __init__(self, vocab_size: int = 32000, bos_id: int = 1):
        self.vocab_size = vocab_size
        self.bos_id = bos_id

    def __call__(self, texts: Sequence[str]) -> List[List[int]]:
        import hashlib

        out = []
        for t in texts:
            ids = [self.bos_id]
            for w in t.split():
                h = int.from_bytes(
                    hashlib.md5(w.lower().encode()).digest()[:4], "little")
                ids.append(2 + h % (self.vocab_size - 2))
            out.append(ids)
        return out


def hf_tokenizer(model_dir: str) -> Callable[[Sequence[str]], List[List[int]]]:
    """Adapt an HF tokenizer dir (e.g. vicuna-7b-v1.5) to the ragged-ids
    contract; padding happens in our collate, not the tokenizer."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(model_dir, use_fast=False)

    def run(texts: Sequence[str]) -> List[List[int]]:
        return [tok(t).input_ids for t in texts]

    return run


def tokenize_left_pad(
    texts: Sequence[str],
    tokenizer: Callable[[Sequence[str]], List[List[int]]],
    buckets: Sequence[int] = (16, 32, 64, 128, 256),
    pad_id: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """-> (ids [B, T_bucket], mask [B, T_bucket] 1=valid, t_max).

    Left padding into a static bucket; rows longer than the largest bucket
    keep their **tail** (the generation-relevant suffix), matching the
    keep-the-recent-context convention rather than the reference's
    hard-truncate-at-1024-head (read_data.py:309)."""
    ragged = tokenizer(texts)
    t_max = min(max(len(r) for r in ragged), buckets[-1])
    T = bucket_for(t_max, buckets)
    B = len(ragged)
    ids = np.full((B, T), pad_id, np.int32)
    mask = np.zeros((B, T), np.int32)
    for i, r in enumerate(ragged):
        r = r[-T:]
        ids[i, T - len(r):] = r
        mask[i, T - len(r):] = 1
    return ids, mask, t_max


@dataclasses.dataclass
class TokenizedBatch:
    """A feature Batch (audio/text/video/feat4 placeholder) plus the raw
    transcripts' token ids for in-graph text towers."""

    features: Batch
    text_ids: np.ndarray    # [B, T_bucket] int32, left-padded
    text_mask: np.ndarray   # [B, T_bucket] int32, 1 = valid
    text_t_max: int

    @property
    def size(self) -> int:
        return self.features.size


class VicunaRawTextDataset:
    """Three feature streams + raw transcripts; tokenization in collate.

    Wraps a MoseiDataset (whose feat4 source is unused by this path — the
    pseudo-text stream is what the in-graph LLM will produce) and a
    transcript dict. The reference fixes dims (1024/4096/1024/4096,
    feat_data.py:308-311); here they come from the sources.
    """

    def __init__(self, dataset, transcripts: Dict[str, str], tokenizer,
                 token_buckets: Sequence[int] = (16, 32, 64, 128, 256),
                 pad_id: int = 0):
        self.ds = dataset
        self.transcripts = transcripts
        self.tokenizer = tokenizer
        self.token_buckets = tuple(token_buckets)
        self.pad_id = pad_id

    def __len__(self):
        return len(self.ds)

    def collate(self, indices: Sequence[int],
                buckets: Sequence[int] = (64, 128, 256, 512, 1024, 2048, 4096)
                ) -> TokenizedBatch:
        feats, emos, vals, names = [], [], [], []
        for i in indices:
            f, e, v, n = self.ds.example(int(i))
            feats.append(f)
            emos.append(e)
            vals.append(v)
            names.append(n)
        batch = make_batch(
            [f["audio"] for f in feats], [f["text"] for f in feats],
            [f["video"] for f in feats], [f["feat4"] for f in feats],
            np.array(emos), np.array(vals), names, buckets=buckets)
        ids, mask, t_max = tokenize_left_pad(
            [self.transcripts[n] for n in names], self.tokenizer,
            self.token_buckets, self.pad_id)
        return TokenizedBatch(batch, ids, mask, t_max)

    def batches(self, batch_size: int, *, shuffle: bool = False,
                seed: int = 100, epoch: int = 0):
        idx = np.arange(len(self.ds))
        if shuffle:
            np.random.default_rng((seed, epoch)).shuffle(idx)
        for s in range(0, len(idx), batch_size):
            yield self.collate(idx[s: s + batch_size])

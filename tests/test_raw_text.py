"""Tokenize-in-collate dataset variant (reference feat_data.py:263-365)."""

import numpy as np

from sdumc_tpu.core.config import DataConfig, PathsConfig
from sdumc_tpu.data.pipeline import build_loaders
from sdumc_tpu.data.raw_text import (VicunaRawTextDataset,
                                     WhitespaceTokenizer, read_transcripts,
                                     tokenize_left_pad)


def _transcripts(names):
    words = ["the", "movie", "was", "really", "good", "bad", "so", "boring"]
    rng = np.random.default_rng(0)
    return {n: " ".join(rng.choice(words, size=rng.integers(1, 12)))
            for n in names}


def test_csv_roundtrip(tmp_path):
    p = tmp_path / "transcription.csv"
    p.write_text("name,english\nclip_a,hello there\nclip_b,\"one, two\"\n")
    t = read_transcripts(str(p))
    assert t == {"clip_a": "hello there", "clip_b": "one, two"}


def test_left_pad_layout():
    tok = WhitespaceTokenizer()
    ids, mask, t_max = tokenize_left_pad(["a b c", "a"], tok, buckets=(8,))
    assert ids.shape == (2, 8) and mask.shape == (2, 8)
    # left padding: valid tokens end at the last column
    assert mask[0].tolist() == [0, 0, 0, 0, 1, 1, 1, 1]
    assert mask[1].tolist() == [0, 0, 0, 0, 0, 0, 1, 1]
    assert t_max == 4  # BOS + 3 words
    # BOS sits at the first valid position
    assert ids[0, 4] == tok.bos_id and ids[1, 6] == tok.bos_id
    # identical words hash identically across rows
    assert ids[0, 5] == ids[1, 7]


def test_overflow_keeps_tail():
    tok = WhitespaceTokenizer()
    long = " ".join(f"w{i}" for i in range(20))
    ids_small, mask_small, _ = tokenize_left_pad([long], tok, buckets=(8,))
    ids_big, _, _ = tokenize_left_pad([long], tok, buckets=(64,))
    assert mask_small.sum() == 8
    # the kept suffix equals the tail of the untruncated encoding
    np.testing.assert_array_equal(ids_small[0], ids_big[0, -8:])


def test_pad_invariance_under_bucket_choice():
    """Embedding-lookup + masked mean must not depend on the bucket the
    batch landed in: compare an 8-wide vs 32-wide padding of the same
    texts."""
    tok = WhitespaceTokenizer(vocab_size=512)
    texts = ["a b c d", "a b"]
    emb = np.random.default_rng(1).normal(size=(512, 16)).astype(np.float32)

    def pooled(buckets):
        ids, mask, _ = tokenize_left_pad(texts, tok, buckets=buckets)
        e = emb[ids] * mask[..., None]
        return e.sum(1) / mask.sum(1, keepdims=True)

    np.testing.assert_allclose(pooled((8,)), pooled((32,)), rtol=1e-6)


def test_dataset_collate_end_to_end():
    cfg = DataConfig()
    train, _, _ = build_loaders(cfg, PathsConfig(), synthetic=True,
                                synthetic_sizes=(12, 4, 4))
    trans = _transcripts(train.names)
    ds = VicunaRawTextDataset(train, trans, WhitespaceTokenizer())
    batches = list(ds.batches(5))
    assert [b.size for b in batches] == [5, 5, 2]
    b = batches[0]
    # feature side keeps the 4F Batch contract
    assert b.features.audio.ndim == 3 and b.features.t_max[0] >= 1
    # token side: static bucket, mask rows sum to the true lengths
    assert b.text_ids.shape == b.text_mask.shape
    lens = [1 + len(trans[n].split()) for n in b.features.names]
    capped = [min(l, ds.token_buckets[-1]) for l in lens]
    assert b.text_mask.sum(1).tolist() == capped
    assert b.text_t_max == max(capped)
    # deterministic across identical iterations
    b2 = next(iter(ds.batches(5)))
    np.testing.assert_array_equal(b.text_ids, b2.text_ids)

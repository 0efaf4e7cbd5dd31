"""Input-pipeline determinism + parity with the reference padding/compress
semantics (toolkit/utils/read_data.py)."""

import numpy as np
import pytest

from sdumc_tpu.core.config import DataConfig, PathsConfig
from sdumc_tpu.data import (
    Batch,
    MoseiDataset,
    SyntheticSource,
    TOO_LONG_TRAIN_CLIPS,
    make_batch,
    mapping_feature,
)
from sdumc_tpu.data.collate import bucket_for, scale_compress
from sdumc_tpu.data.pipeline import BatchIterator, build_loaders


pytestmark = pytest.mark.fast  # pre-commit smoke tier (PARITY.md)

@pytest.fixture(scope="module")
def ref_read_data():
    """Golden: execute just func_mapping_feature from the reference file
    (its module has relative imports and can't be loaded standalone)."""
    import ast
    import math as _math
    import pathlib
    import types

    src = pathlib.Path("/root/reference/toolkit/utils/read_data.py").read_text()
    tree = ast.parse(src)
    wanted = {
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "func_mapping_feature"
    }
    if not wanted:
        pytest.skip("reference func_mapping_feature unavailable")
    mod = types.SimpleNamespace()
    glb = {"np": np, "math": _math}
    exec(compile(ast.Module(body=list(wanted), type_ignores=[]), "<ref>", "exec"), glb)
    mod.func_mapping_feature = glb["func_mapping_feature"]
    return mod


def test_mapping_feature_matches_reference(ref_read_data):
    rng = np.random.default_rng(0)
    for featlen, dst in [(10, 10), (4, 9), (20, 7), (21, 7), (100, 32)]:
        x = rng.normal(size=(featlen, 5))
        ref = ref_read_data.func_mapping_feature(x.copy(), dst)
        got = mapping_feature(x.copy(), dst)
        np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_scale_compress_matches_reference(ref_read_data):
    import math
    rng = np.random.default_rng(1)
    x = rng.normal(size=(37, 4))
    ref = ref_read_data.func_mapping_feature(x.copy(), math.ceil(37 / 4))
    np.testing.assert_allclose(scale_compress(x.copy(), 4), ref, rtol=1e-6)


def test_bucket_for():
    buckets = (64, 128, 256)
    assert bucket_for(1, buckets) == 64
    assert bucket_for(64, buckets) == 64
    assert bucket_for(65, buckets) == 128
    assert bucket_for(999, buckets) == 256  # capped


def test_make_batch_padding_and_tmax():
    rng = np.random.default_rng(2)
    lens = [5, 9, 3]
    audios = [rng.normal(size=(l, 4)).astype(np.float32) for l in lens]
    texts = [rng.normal(size=(l + 1, 6)).astype(np.float32) for l in lens]
    videos = [rng.normal(size=(l, 4)).astype(np.float32) for l in lens]
    feat4s = [rng.normal(size=(2, 6)).astype(np.float32) for _ in lens]
    b = make_batch(audios, texts, videos, feat4s,
                   np.zeros(3), np.arange(3.0), ["x", "y", "z"], buckets=(16, 32))
    assert b.audio.shape == (3, 16, 4) and b.t_max[0] == 9
    assert b.text.shape == (3, 16, 6) and b.t_max[1] == 10
    assert b.t_max[3] == 2
    # zero padding beyond each row's true length
    np.testing.assert_array_equal(b.audio[2, 3:], 0.0)
    np.testing.assert_allclose(b.audio[1, :9], audios[1])
    assert list(b.lengths[0]) == lens


def test_overlong_clip_is_meanpooled_into_cap():
    rng = np.random.default_rng(3)
    x = [rng.normal(size=(40, 4)).astype(np.float32)]
    short = [rng.normal(size=(4, 4)).astype(np.float32)]
    b = make_batch(x, short, short, short, np.zeros(1), np.zeros(1), ["a"], buckets=(8, 16))
    assert b.audio.shape[1] == 16 and b.t_max[0] == 16
    np.testing.assert_allclose(b.audio[0], mapping_feature(x[0], 16), rtol=1e-6)


def test_too_long_list_has_51_clips():
    assert len(TOO_LONG_TRAIN_CLIPS) == 51


def test_synthetic_determinism_and_pipeline():
    cfg = DataConfig(batch_size=8, length_buckets=(64, 128, 256, 512, 1024, 2048))
    train, val, test = build_loaders(cfg, PathsConfig(), synthetic=True,
                                     synthetic_sizes=(32, 8, 8))
    assert train.input_dims() == (1024, 4096, 1024, 4096)
    a1 = train.sources["audio"].get("train_0")
    a2 = train.sources["audio"].get("train_0")
    np.testing.assert_array_equal(a1, a2)

    it = lambda ep: BatchIterator(train, 8, shuffle=True, seed=1, epoch=ep,
                                  buckets=cfg.length_buckets, drop_remainder=True)
    names_e0_a = [b.names for b in it(0)]
    names_e0_b = [b.names for b in it(0)]
    names_e1 = [b.names for b in it(1)]
    assert names_e0_a == names_e0_b, "same-seed epoch must be deterministic"
    assert names_e0_a != names_e1, "different epochs must reshuffle"
    flat = [n for bn in names_e0_a for n in bn]
    assert len(set(flat)) == len(flat) == 32


def test_sharded_iteration_is_disjoint_and_complete():
    cfg = DataConfig(batch_size=4)
    train, _, _ = build_loaders(cfg, PathsConfig(), synthetic=True, synthetic_sizes=(20, 4, 4))
    seen = []
    for shard in range(2):
        it = BatchIterator(train, 4, shuffle=True, seed=3, epoch=0,
                           shard_index=shard, shard_count=2, prefetch=0)
        seen.append({n for b in it for n in b.names})
    assert seen[0] & seen[1] == set()
    assert seen[0] | seen[1] == {f"train_{i}" for i in range(20)}


def test_prefetch_propagates_errors():
    class Boom(SyntheticSource):
        def get(self, clip):
            raise RuntimeError("boom")

    ds = MoseiDataset(
        ["a"], [{"emo": 0, "val": 0}],
        {k: Boom(k, 4) for k in ("audio", "text", "video", "feat4")},
    )
    with pytest.raises(RuntimeError, match="boom"):
        list(BatchIterator(ds, 1, shuffle=False))


def test_packed_feature_store_roundtrip(tmp_path):
    """Packed blob store (the working LMDB-variant equivalent) round-trips
    and serves the source protocol."""
    import os

    from sdumc_tpu.data.packed import PackedSource, pack_features

    rng = np.random.default_rng(7)
    src = tmp_path / "feat"
    os.makedirs(src)
    arrays = {}
    for i in range(5):
        arr = rng.normal(size=(int(rng.integers(1, 9)), 6)).astype(np.float32)
        arrays[f"c{i}"] = arr
        np.save(src / f"c{i}.npy", arr)
    # one utterance-level [D] clip
    utt = rng.normal(size=(6,)).astype(np.float32)
    arrays["utt"] = utt[None]
    np.save(src / "utt.npy", utt)

    prefix = str(tmp_path / "pack")
    pack_features(str(src), prefix)
    store = PackedSource(prefix)
    assert store.dim == 6
    for name, arr in arrays.items():
        np.testing.assert_array_equal(store.get(name), arr)
        assert store.length_of(name) == len(arr)
        assert name in store


def test_dataset_registry_dispatch():
    """get_loaders routes names through core.registry.DATASETS (the
    reference's get_dataloaders dispatch with its dead CROSSDIM/CROSSDIS
    imports replaced by a live extension point)."""
    from sdumc_tpu.core.config import DataConfig, PathsConfig
    from sdumc_tpu.core.registry import DATASETS
    from sdumc_tpu.data.pipeline import get_loaders

    assert "CMU-MOSEI" in DATASETS and "CMU-MOSI" in DATASETS
    assert "CROSSDIM" in DATASETS and "CROSSDIS" in DATASETS
    tr, va, te = get_loaders("CMU-MOSEI", DataConfig(), PathsConfig(),
                             synthetic=True, synthetic_sizes=(8, 4, 4))
    assert (len(tr), len(va), len(te)) == (8, 4, 4)

    with pytest.raises(KeyError, match="NOSUCH"):
        get_loaders("NOSUCH", DataConfig(), PathsConfig())

    # registering a cross-corpus loader is one decorator — verify the seam
    @DATASETS.register("CROSSDIM-test")
    def _crossdim(cfg, paths, **kw):
        return ("train-from", "test-from")

    try:
        assert get_loaders("CROSSDIM-test", DataConfig(), PathsConfig()) == (
            "train-from", "test-from")
    finally:
        DATASETS._entries.pop("CROSSDIM-test")


def _write_corpus(root, tag, n_per_split):
    """Tiny on-disk corpus honoring the L1->L3 contract: per-feature npy
    dirs + a label npz with {split}_corpus dicts."""
    import os

    rng = np.random.default_rng(abs(hash(tag)) % 2**31)
    cfg = DataConfig(
        audio_feature="a", text_feature="t", video_feature="v",
        feat4_feature="f4", drop_too_long_train_clips=False)
    dims = {"a": 6, "t": 8, "v": 6, "f4": 8}
    feat_dir = os.path.join(root, tag, "features")
    corpora = {}
    for split, n in zip(("train", "val", "test"), n_per_split):
        corpus = {}
        for i in range(n):
            clip = f"{tag}_{split}_{i}"
            corpus[clip] = {"emo": 0.0, "val": float(rng.uniform(-3, 3))}
            for feat, d in dims.items():
                os.makedirs(os.path.join(feat_dir, feat), exist_ok=True)
                np.save(os.path.join(feat_dir, feat, clip + ".npy"),
                        rng.normal(size=(int(rng.integers(2, 9)), d)).astype(np.float32))
        corpora[f"{split}_corpus"] = corpus
    label_path = os.path.join(root, tag, "labels.npz")
    np.savez_compressed(label_path, **corpora)
    paths = PathsConfig(features_dir=feat_dir, label_path=label_path)
    return cfg, paths


def test_cross_corpus_loaders(tmp_path):
    """CROSSDIM semantics: train/val from the train corpus, test from the
    test corpus (reference toolkit/dataloader/__init__.py:31-36; the
    crossdim/crossdis modules are stripped from the snapshot)."""
    from sdumc_tpu.data.pipeline import build_cross, get_loaders

    cfg_a, paths_a = _write_corpus(str(tmp_path), "mosei", (6, 3, 3))
    _, paths_b = _write_corpus(str(tmp_path), "mosi", (4, 2, 5))

    tr, va, te = build_cross(cfg_a, paths_a, test_paths=paths_b)
    assert all(n.startswith("mosei_train_") for n in tr.names)
    assert all(n.startswith("mosei_val_") for n in va.names)
    assert all(n.startswith("mosi_test_") for n in te.names)
    assert (len(tr), len(va), len(te)) == (6, 3, 5)
    # loaders serve real features from the right corpus dirs
    b = next(iter(BatchIterator(te, 2, shuffle=False, prefetch=0, buckets=(16,))))
    assert b.audio.shape[0] == 2 and b.names[0].startswith("mosi_test_")

    # front-door routing: setting train_dataset switches to CROSSDIM
    import dataclasses
    cfg_x = dataclasses.replace(cfg_a, train_dataset="CMU-MOSEI",
                                test_dataset="CMU-MOSI")
    tr2, _, _ = get_loaders("CMU-MOSEI", cfg_x, paths_a, test_paths=paths_b)
    assert [n for n in tr2.names] == [n for n in tr.names]
    # family mismatch is rejected (reference asserts the same, :32-35)
    cfg_bad = dataclasses.replace(cfg_a, train_dataset="CMU-MOSEI",
                                  test_dataset="MELD")
    with pytest.raises(AssertionError, match="DIM family"):
        get_loaders("CMU-MOSEI", cfg_bad, paths_a, test_paths=paths_b)


def test_packed_batch_iterator_matches_npy_iterator(tmp_path):
    """BatchIterator over PackedSources (the production producer,
    pipeline._packed_batch) yields batches identical to the per-clip .npy
    path — same buckets, t_max, lengths, payload, labels."""
    import os

    from sdumc_tpu.data.feature_store import NpyDirSource
    from sdumc_tpu.data.packed import PackedSource, pack_features
    from sdumc_tpu.data.pipeline import MoseiDataset

    rng = np.random.default_rng(11)
    names = [f"c{i}" for i in range(9)]
    dims = {"audio": 6, "text": 8, "video": 6, "feat4": 8}
    for key, d in dims.items():
        os.makedirs(tmp_path / key)
        for n in names:
            arr = rng.normal(size=(int(rng.integers(2, 30)), d)).astype(np.float32)
            np.save(tmp_path / key / f"{n}.npy", arr)
        pack_features(str(tmp_path / key), str(tmp_path / key))

    labels = [{"emo": 0.0, "val": float(i)} for i in range(9)]
    npy_ds = MoseiDataset(names, labels,
                          {k: NpyDirSource(str(tmp_path), k) for k in dims})
    pk_ds = MoseiDataset(names, labels,
                         {k: PackedSource(str(tmp_path / k), k) for k in dims})

    kw = dict(shuffle=False, prefetch=0, buckets=(8, 16, 32))
    ref = list(BatchIterator(npy_ds, 4, **kw))
    got = list(BatchIterator(pk_ds, 4, **kw))
    assert len(ref) == len(got) == 3
    for rb, gb in zip(ref, got):
        assert rb.t_max == gb.t_max and rb.names == gb.names
        np.testing.assert_array_equal(rb.lengths, gb.lengths)
        np.testing.assert_array_equal(rb.vals, gb.vals)
        for key in ("audio", "text", "video", "feat4"):
            np.testing.assert_array_equal(getattr(rb, key), getattr(gb, key))


def test_build_sources_prefers_packed_store(tmp_path):
    """build_sources auto-selects PackedSource when a pack sits next to the
    per-clip dirs (the production fast path)."""
    import os

    from sdumc_tpu.core.config import DataConfig, PathsConfig
    from sdumc_tpu.data.feature_store import NpyDirSource
    from sdumc_tpu.data.packed import PackedSource, pack_features
    from sdumc_tpu.data.pipeline import build_sources

    cfg = DataConfig()
    feat_names = {"audio": cfg.audio_feature, "text": cfg.text_feature,
                  "video": cfg.video_feature, "feat4": cfg.feat4_feature}
    rng = np.random.default_rng(3)
    for key, feat in feat_names.items():
        os.makedirs(tmp_path / feat)
        np.save(tmp_path / feat / "c0.npy",
                rng.normal(size=(4, 6)).astype(np.float32))
        if key != "video":  # leave one modality npy-only
            pack_features(str(tmp_path / feat), str(tmp_path / feat))

    paths = PathsConfig(features_dir=str(tmp_path), label_path="")
    sources = build_sources(cfg, paths)
    assert isinstance(sources["audio"], PackedSource)
    assert isinstance(sources["text"], PackedSource)
    assert isinstance(sources["feat4"], PackedSource)
    assert isinstance(sources["video"], NpyDirSource)


def test_ring_buffer_iterator_matches_fresh_buffers(tmp_path):
    """reuse_buffers ring mode must yield payload-identical batches to the
    fresh-buffer packed path when the consumer copies within the ring
    window (here: immediately). Multi-epoch: ring slots get re-filled with
    different occupants, exercising the prev_rows partial pad-zeroing."""
    import os

    from sdumc_tpu.data import native
    from sdumc_tpu.data.packed import PackedSource, pack_features
    from sdumc_tpu.data.pipeline import MoseiDataset

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(13)
    names = [f"c{i}" for i in range(8)]
    dims = {"audio": 6, "text": 8, "video": 6, "feat4": 8}
    for key, d in dims.items():
        os.makedirs(tmp_path / key)
        for n in names:
            # lengths straddle bucket edges incl. an overlong (compress) clip
            arr = rng.normal(size=(int(rng.integers(2, 40)), d)).astype(np.float32)
            np.save(tmp_path / key / f"{n}.npy", arr)
        pack_features(str(tmp_path / key), str(tmp_path / key),
                      dtype="bfloat16")

    labels = [{"emo": 0.0, "val": float(i)} for i in range(8)]
    ds = MoseiDataset(names, labels,
                      {k: PackedSource(str(tmp_path / k), k) for k in dims})
    kw = dict(shuffle=True, seed=5, buckets=(8, 16, 32))
    ring_it = BatchIterator(ds, 4, prefetch=1, reuse_buffers=3, **kw)
    fresh_it = BatchIterator(ds, 4, prefetch=0, **kw)
    for epoch in range(3):  # same epoch => same shuffle order across the two
        ring_it.epoch = fresh_it.epoch = epoch
        for rb, gb in zip(ring_it, fresh_it):
            assert rb.names == gb.names and rb.t_max == gb.t_max
            for key in dims:
                got = getattr(rb, key)
                np.testing.assert_array_equal(
                    got.copy(), getattr(gb, key),
                    err_msg=f"epoch {epoch} {key}")
            np.testing.assert_array_equal(rb.lengths, gb.lengths)


def test_ring_depth_must_cover_prefetch():
    ds = MoseiDataset([], [], {})
    with pytest.raises(AssertionError):
        BatchIterator(ds, 4, shuffle=False, prefetch=4, reuse_buffers=3)

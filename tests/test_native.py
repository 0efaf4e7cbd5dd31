"""Native C++ data plane vs the python reference semantics."""

import os
import subprocess

import numpy as np
import pytest

from sdumc_tpu.data import native
from sdumc_tpu.data.collate import mapping_feature

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


pytestmark = pytest.mark.fast  # pre-commit smoke tier (PARITY.md)

@pytest.fixture(scope="module", autouse=True)
def built_library():
    if not native.available():
        rc = subprocess.run(
            ["sh", os.path.join(REPO, "native", "build.sh")],
            capture_output=True, text=True,
        )
        if rc.returncode != 0:
            pytest.skip(f"native build failed: {rc.stderr[-500:]}")
    assert native.available()


def test_fill_batch_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    dim, bucket = 24, 16
    lens = [5, 16, 3, 40]  # includes an overlong clip (mean-pool compress)
    paths = []
    arrays = []
    for i, ln in enumerate(lens):
        arr = rng.normal(size=(ln, dim)).astype(np.float32)
        p = tmp_path / f"clip_{i}.npy"
        np.save(p, arr)
        paths.append(str(p))
        arrays.append(arr)

    batch, lengths = native.fill_batch(paths, bucket, dim)
    assert batch.shape == (4, bucket, dim)
    for i, arr in enumerate(arrays):
        expected = np.zeros((bucket, dim), np.float32)
        mapped = mapping_feature(arr, bucket) if len(arr) > bucket else arr
        expected[: len(mapped)] = mapped
        np.testing.assert_allclose(batch[i], expected, rtol=1e-5, atol=1e-6,
                                   err_msg=f"clip {i} len {lens[i]}")
        assert lengths[i] == min(lens[i], bucket)


def test_float64_and_1d_inputs(tmp_path):
    rng = np.random.default_rng(1)
    a64 = rng.normal(size=(6, 8))  # float64
    a1d = rng.normal(size=(8,)).astype(np.float32)  # utterance-level [D]
    np.save(tmp_path / "f64.npy", a64)
    np.save(tmp_path / "f1d.npy", a1d)
    batch, lengths = native.fill_batch(
        [str(tmp_path / "f64.npy"), str(tmp_path / "f1d.npy")], 8, 8
    )
    np.testing.assert_allclose(batch[0, :6], a64.astype(np.float32), rtol=1e-6)
    np.testing.assert_allclose(batch[1, :1], a1d[None], rtol=1e-6)
    assert list(lengths) == [6, 1]


def test_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.fill_batch([str(tmp_path / "nope.npy")], 8, 8)


def test_pipeline_native_path_matches_python(tmp_path):
    """BatchIterator's C++ fast path must emit byte-identical batches to the
    pure-python collate."""
    from sdumc_tpu.data.feature_store import NpyDirSource
    from sdumc_tpu.data.pipeline import BatchIterator, MoseiDataset

    rng = np.random.default_rng(3)
    dims = {"audio": 12, "text": 20, "video": 12, "feat4": 20}
    names = [f"c{i}" for i in range(6)]
    for feat, d in dims.items():
        os.makedirs(tmp_path / feat, exist_ok=True)
        for i, n in enumerate(names):
            ln = int(rng.integers(3, 40))
            np.save(tmp_path / feat / f"{n}.npy",
                    rng.normal(size=(ln, d)).astype(np.float32))
    sources = {k: NpyDirSource(str(tmp_path), k) for k in dims}
    labels = [{"emo": 0.0, "val": float(i)} for i in range(6)]
    ds = MoseiDataset(names, labels, sources)

    def batches(force_python):
        it = BatchIterator(ds, 3, shuffle=False, buckets=(8, 16, 32), prefetch=0)
        if force_python:
            it._native_usable = lambda: False
        return list(it)

    native_batches = batches(False)
    python_batches = batches(True)
    assert len(native_batches) == len(python_batches) == 2
    for nb, pb in zip(native_batches, python_batches):
        assert nb.t_max == pb.t_max
        np.testing.assert_allclose(nb.audio, pb.audio, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(nb.text, pb.text, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(nb.feat4, pb.feat4, rtol=1e-6, atol=1e-7)
        np.testing.assert_array_equal(nb.lengths, pb.lengths)
        np.testing.assert_array_equal(nb.vals, pb.vals)
        assert nb.names == pb.names


def test_fill_batch_packed_matches_npy_path(tmp_path):
    """Native packed-store batch fill == native .npy-dir batch fill for the
    same clips (same pad/mean-pool semantics, one file instead of N)."""
    import numpy as np

    from sdumc_tpu.data import native
    from sdumc_tpu.data.packed import (
        PackedSource, fill_batch_from_packed, pack_features)

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    rng = np.random.default_rng(0)
    d = tmp_path / "feats"
    d.mkdir()
    names = []
    for i, t in enumerate((4, 9, 23, 1)):  # 23 > bucket -> compress path
        name = f"clip{i}"
        np.save(d / f"{name}.npy", rng.normal(size=(t, 6)).astype(np.float32))
        names.append(name)
    prefix = pack_features(str(d), str(tmp_path / "pack"))
    src = PackedSource(prefix)

    bucket = 16
    ref, ref_len = native.fill_batch(
        [str(d / f"{n}.npy") for n in names], bucket, 6)
    got, got_len = fill_batch_from_packed(src, names, bucket, 6)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got_len, ref_len)


def test_fill_batch_packed_bf16(tmp_path):
    """bf16 packed store: the single-touch mmap fill must match the pure
    python gather bit-for-bit (same bf16 payload, same f32-accumulated
    mean-pool), and approximate the f32 path within bf16 resolution."""
    import ml_dtypes

    from sdumc_tpu.data.packed import (
        PackedSource, fill_batch_from_packed, pack_features)

    rng = np.random.default_rng(7)
    d = tmp_path / "feats"
    d.mkdir()
    names = []
    for i, t in enumerate((4, 16, 37, 1)):  # 37 > bucket -> compress path
        name = f"clip{i}"
        np.save(d / f"{name}.npy", rng.normal(size=(t, 6)).astype(np.float32))
        names.append(name)
    f32 = PackedSource(pack_features(str(d), str(tmp_path / "p32")))
    bf16 = PackedSource(pack_features(str(d), str(tmp_path / "p16"),
                                      dtype="bfloat16"))
    assert bf16.dtype_name == "bfloat16"

    bucket = 16
    ref, ref_len = fill_batch_from_packed(f32, names, bucket, 6)
    got, got_len = fill_batch_from_packed(bf16, names, bucket, 6)
    assert got.dtype == np.dtype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(got_len, ref_len)
    # bf16 has ~3 decimal digits; values here are O(1)
    np.testing.assert_allclose(got.astype(np.float32), ref,
                               rtol=2e-2, atol=2e-2)

    # native fill == python fallback fill, bit for bit
    import sdumc_tpu.data.packed as packed_mod

    native_avail = native.available()
    assert native_avail
    entries = [tuple(bf16._index[n]) for n in names]
    nat, nat_len = native.fill_batch_packed(
        bf16._prefix + ".bin", entries, bucket, 6, dtype="bfloat16")
    py_src = PackedSource(str(tmp_path / "p16"))

    def python_fill():
        from sdumc_tpu.data.collate import mapping_feature

        out = np.zeros((len(names), bucket, 6), py_src._dtype)
        lens = np.zeros((len(names),), np.int64)
        for i, n in enumerate(names):
            raw = py_src.get(n)
            feat = (mapping_feature(raw.astype(np.float32), bucket)
                    .astype(py_src._dtype) if len(raw) > bucket else raw)
            out[i, : len(feat)] = feat
            lens[i] = len(feat)
        return out, lens

    py, py_len = python_fill()
    np.testing.assert_array_equal(
        nat.view(np.uint16), py.view(np.uint16))
    np.testing.assert_array_equal(nat_len, py_len)


def test_fill_batch_packed_reuses_buffer(tmp_path):
    """Ring-buffer producers pass `out=`; a stale buffer must be fully
    overwritten (single-touch contract: payload memcpy or pad memset)."""
    from sdumc_tpu.data.packed import PackedSource, pack_features

    rng = np.random.default_rng(9)
    d = tmp_path / "feats"
    d.mkdir()
    np.save(d / "a.npy", rng.normal(size=(3, 4)).astype(np.float32))
    np.save(d / "b.npy", rng.normal(size=(11, 4)).astype(np.float32))
    src = PackedSource(pack_features(str(d), str(tmp_path / "p")))
    entries = [tuple(src._index[n]) for n in ("a", "b")]

    stale = np.full((2, 8, 4), np.nan, np.float32)
    out, lens = native.fill_batch_packed(
        src._prefix + ".bin", entries, 8, 4, out=stale)
    assert out is stale
    assert np.isfinite(out).all()  # every stale byte overwritten
    assert list(lens) == [3, 8]
    assert (out[0, 3:] == 0).all()  # pad region zeroed, not stale

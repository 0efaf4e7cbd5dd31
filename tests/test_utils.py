"""Utility-subsystem tests: noise SNR, file IO, preprocess, tuner, modules."""

import os
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_wav(path, data_i16, framerate=16000):
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(framerate)
        f.writeframes(np.asarray(data_i16, "<i2").tobytes())


def test_noise_injection_hits_target_snr(tmp_path):
    from sdumc_tpu.utils.noise import add_noise_dir, read_pcm16, rms

    rng = np.random.default_rng(0)
    clean_dir = tmp_path / "audio"
    noise_dir = tmp_path / "noise"
    os.makedirs(clean_dir), os.makedirs(noise_dir)
    clean = (rng.normal(size=16000) * 3000).astype(np.int16)
    _write_wav(clean_dir / "a.wav", clean)
    _write_wav(noise_dir / "n.wav", (rng.normal(size=48000) * 3000).astype(np.int16))

    out_dir = add_noise_dir(str(clean_dir), str(noise_dir), [10.0], workers=1)
    mixed, _ = read_pcm16(os.path.join(out_dir, "a.wav"))
    noise_part = mixed - clean.astype(np.float64)
    snr = 20 * np.log10(rms(clean.astype(np.float64)) / rms(noise_part))
    assert abs(snr - 10.0) < 1.0, snr


def test_key_csv_roundtrip(tmp_path):
    from sdumc_tpu.utils.files import read_key_csv, write_key_csv

    names = ["a", "b"]
    write_key_csv(tmp_path / "t.csv", names, {"a": ["hi"], "b": ["yo"]}, ["english"])
    got_names, mapping = read_key_csv(tmp_path / "t.csv", "english")
    assert got_names == names and mapping == {"a": "hi", "b": "yo"}


def test_preprocess_label_npz_roundtrip(tmp_path):
    import pickle

    from sdumc_tpu.data.labels import read_names_labels
    from sdumc_tpu.preprocess.cmumosei import generate_transcription, normalize_dataset_format

    videoIDs = {"vidA": ["vidA_0", "vidA_1"], "vidB": ["vidB_0"]}
    videoLabels = {"vidA": [1.5, -0.5], "vidB": [2.0]}
    videoSentences = {"vidA": ["hello there", "again"], "vidB": ["bye"]}
    blob = (videoIDs, videoLabels, None, videoSentences, ["vidA"], ["vidB"], ["vidA"])
    pkl = tmp_path / "labels.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(blob, f)

    npz = tmp_path / "label.npz"
    normalize_dataset_format(str(pkl), str(npz))
    names, labels = read_names_labels(str(npz), "train")
    assert names == ["vidA_0", "vidA_1"]
    assert labels[0] == {"emo": 0, "val": 1.5}

    csv_path = tmp_path / "trans.csv"
    generate_transcription(str(pkl), str(csv_path))
    from sdumc_tpu.utils.files import read_key_csv

    got, mapping = read_key_csv(csv_path, "english")
    assert mapping["vidA_0"] == "hello there"


def test_ms_to_timestamp():
    from sdumc_tpu.preprocess.cmumosei import ms_to_timestamp

    assert ms_to_timestamp(0) == "00:00:00.000"
    assert ms_to_timestamp(3_723_456) == "01:02:03.456"


def test_tuner_draws_within_grid():
    from sdumc_tpu.core.tuner import TUNE_GRIDS, merge_args_config, random_select

    grid = TUNE_GRIDS["wengnet_mosei_mult_views_text_missing"]
    draw = random_select(grid, seed=0)
    assert set(draw) == set(grid)
    for k, v in draw.items():
        assert v in grid[k]
    assert random_select(grid, seed=0) == draw  # seeded determinism

    import types

    args = types.SimpleNamespace(lr=0.0, batch_size=0, unknown=1)
    args, applied = merge_args_config(args, "wengnet_mosei_mult_views_text_missing", seed=1)
    assert args.lr in grid["lr"] and args.batch_size in grid["batch_size"]


def test_cross_modal_encoder_shapes_and_grad():
    from sdumc_tpu.models.modules import CrossModalTransformerEncoder, sinusoidal_positions

    table = sinusoidal_positions(10, 8)
    assert table.shape == (10, 8)
    enc = CrossModalTransformerEncoder(dim=16, layers=2, heads=4)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
    kv = jnp.asarray(rng.normal(size=(2, 9, 16)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), q, kv)["params"]
    out = enc.apply({"params": params}, q, kv)
    assert out.shape == (2, 5, 16)
    self_out = enc.apply({"params": params}, q)
    assert self_out.shape == (2, 5, 16)
    g = jax.grad(lambda p: jnp.sum(enc.apply({"params": p}, q, kv) ** 2))(params)
    assert np.isfinite(float(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))


def test_lstm_and_mlp_encoders():
    from sdumc_tpu.models.modules import LSTMEncoder, MLPEncoder

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 7, 12)), jnp.float32)
    lstm = LSTMEncoder(hidden=8, out_dim=6)
    p = lstm.init(jax.random.PRNGKey(0), x)["params"]
    assert lstm.apply({"params": p}, x).shape == (3, 6)

    u = jnp.asarray(rng.normal(size=(3, 12)), jnp.float32)
    mlp = MLPEncoder(hidden=8, out_dim=6)
    p = mlp.init(jax.random.PRNGKey(0), u)["params"]
    assert mlp.apply({"params": p}, u).shape == (3, 6)


def test_step_timer_and_trace_noop():
    from sdumc_tpu.utils.profiling import StepTimer, trace

    t = StepTimer()
    for _ in range(3):
        with t:
            pass
    assert t.count == 3 and t.avg is not None
    with trace(enabled=False):
        pass


def test_cmumosi_preprocess_roundtrip(tmp_path):
    """MOSI pkl 7-tuple -> label npz + transcription csv (reference
    toolkit/preprocess/cmumosi.py:45-87; no ffmpeg stage for MOSI)."""
    import pickle

    from sdumc_tpu.data.labels import read_names_labels
    from sdumc_tpu.preprocess.cmumosi import (
        generate_transcription, normalize_dataset_format, read_train_val_test)
    from sdumc_tpu.utils.files import read_key_csv

    video_ids = {"vidA": ["vidA_0", "vidA_1"], "vidB": ["vidB_0"]}
    video_labels = {"vidA": [1.5, -0.5], "vidB": [2.0]}
    video_sentences = {"vidA": ["hello there", "ok bye"], "vidB": ["mosi"]}
    blob = (video_ids, video_labels, None, video_sentences,
            ["vidA"], [], ["vidB"])
    save_root = tmp_path / "mosi"
    save_root.mkdir()
    with open(save_root / "CMUMOSI_features_raw_2way.pkl", "wb") as f:
        pickle.dump(blob, f)

    names, labels = read_train_val_test(
        str(save_root / "CMUMOSI_features_raw_2way.pkl"), "train")
    assert names == ["vidA_0", "vidA_1"] and labels == [1.5, -0.5]

    counts = normalize_dataset_format(
        str(tmp_path), str(save_root), copy_videos=False,
        translate=lambda s: s.upper())
    assert counts == {"train": 2, "val": 0, "test": 1}

    tr_names, tr_labels = read_names_labels(str(save_root / "label.npz"), "train")
    assert tr_names == ["vidA_0", "vidA_1"]
    assert tr_labels[0]["val"] == 1.5 and tr_labels[0]["emo"] == 0

    csv_names, name2eng = read_key_csv(
        str(save_root / "transcription.csv"), "english")
    assert csv_names == ["vidA_0", "vidA_1", "vidB_0"]
    assert name2eng["vidB_0"] == "mosi"
    _, name2chi = read_key_csv(str(save_root / "transcription.csv"), "chinese")
    assert name2chi["vidA_0"] == "HELLO THERE"


def test_openface_readers_match_reference(tmp_path):
    """read_hog/read_csv vs the reference implementations on synthetic
    OpenFace artifacts (visual/util.py:10-78)."""
    import importlib.util
    import struct as st

    from sdumc_tpu.extract.openface import read_csv, read_hog

    spec = importlib.util.spec_from_file_location(
        "ref_util", "/root/reference/feature_extraction/visual/util.py")
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    # synthetic .hog: 2x2x3 features, 7 frames
    rng = np.random.default_rng(0)
    cols, rows, ch, n_frames = 2, 2, 3, 7
    nf = cols * rows * ch
    feats = rng.normal(size=(n_frames, nf)).astype(np.float32)
    valid = (rng.uniform(size=n_frames) > 0.3).astype(np.float32)
    hog_path = tmp_path / "clip.hog"
    with open(hog_path, "wb") as f:
        for i in range(n_frames):
            f.write(st.pack("3i", cols, rows, ch))
            f.write(st.pack("f", valid[i]))
            f.write(feats[i].tobytes())

    ref_valid, ref_feats = ref.read_hog(str(hog_path), batch_size=3)
    got_valid, got_feats = read_hog(str(hog_path))
    np.testing.assert_allclose(got_valid, ref_valid)
    np.testing.assert_allclose(got_feats, ref_feats)
    np.testing.assert_allclose(got_valid, valid)
    np.testing.assert_allclose(got_feats, feats, rtol=1e-6)

    # csv reader
    csv_path = tmp_path / "clip.csv"
    arr = rng.normal(size=(5, 8))
    with open(csv_path, "w") as f:
        f.write(",".join(f"c{i}" for i in range(8)) + "\n")
        for row in arr:
            f.write(",".join(f"{x:.6f}" for x in row) + "\n")
    ref_csv = ref.read_csv(str(csv_path), 3)
    got_csv = read_csv(str(csv_path), 3)
    np.testing.assert_allclose(got_csv, ref_csv)
    assert got_csv.shape == (5, 5)


def test_labelstudio_task_roundtrip(tmp_path):
    """Task init -> update -> split -> read annotations (reference
    read_files.py:9-134 surface)."""
    import json

    from sdumc_tpu.utils.files import (
        labelstudio_init_tasks, labelstudio_update_key,
        read_labelstudio_values, split_json_tasks)

    tasks = labelstudio_init_tasks(
        "sent", ["clip_a", "clip_b"], [["hello", "there"], ["hi"]])
    assert tasks[0]["data"]["sent0"] == "hello"
    assert tasks[1]["data"]["sent1"] == ""  # ragged pad
    # simulate one annotation
    tasks[0]["annotations"] = [{"result": [
        {"value": {"choices": ["positive"]}},
        {"value": {"text": [" great "]}},
    ]}]
    path = tmp_path / "tasks.json"
    path.write_text(json.dumps(tasks))

    labelstudio_update_key(str(path), "val", {"clip_a": "1.5", "clip_b": "-1"})
    data = json.loads(path.read_text())
    assert data[0]["data"]["val"] == "1.5"

    got = read_labelstudio_values(str(path))
    assert got["clip_a"] == ["positive", "great"]
    assert got["clip_b"] == []

    paths = split_json_tasks(str(path), str(tmp_path / "splits"), split_num=3)
    total = sum(len(json.loads(open(p).read())) for p in paths)
    assert total == 2 and len(paths) == 3

    # uuid-prefixed filename normalization
    pref = [{"data": {"video": "x/def5d5b7-clip_c.webm"}, "annotations": []}]
    p2 = tmp_path / "pref.json"
    p2.write_text(json.dumps(pref))
    assert "clip_c" in read_labelstudio_values(str(p2))


def test_media_helpers(tmp_path):
    """avi->mp4 + 16k wav split drivers (functions.py:18-31,269-284); with
    no ffmpeg on PATH the jobs fail gracefully and the checker reports the
    missing outputs."""
    import shutil

    from sdumc_tpu.preprocess.media import (
        avi_to_mp4, find_missing_audio, split_audio_from_video_16k)

    vids = tmp_path / "videos"
    vids.mkdir()
    (vids / "clip_a.avi").write_bytes(b"not a real video")
    (vids / "clip_b.mp4").write_bytes(b"not a real video")

    has_ffmpeg = shutil.which("ffmpeg") is not None
    n = avi_to_mp4(str(vids), workers=2, remove_src=False)
    if not has_ffmpeg:
        assert n == 0  # graceful failure, nothing deleted
        assert (vids / "clip_a.avi").exists()

    out = tmp_path / "wavs"
    split_audio_from_video_16k(str(vids), str(out), workers=2)
    missing = find_missing_audio(str(vids), str(out))
    # fake bytes can't decode -> every clip shows up as missing
    assert set(missing) >= {"clip_a", "clip_b"} - (
        set() if not has_ffmpeg else set(missing))

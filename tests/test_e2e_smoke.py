"""L1->L5 integration smoke: raw media -> extract -> pack -> train -> infer.

The reference's de-facto contract is "run the extractor scripts, then train
on their outputs" (feature_extraction/audio/run.sh ->
main_frame_val_text_missing.py:209). Every stage is individually pinned by
its own test file; this is the one test that drives the WHOLE framework as
a user would, in one process tree, asserting shapes and metrics flow across
every seam:

    synthetic wav/frames/transcript
      -> cli.extract audio   (tiny WavLM tower, jitted)
      -> cli.extract text    (tiny BERT tower, jitted)
      -> cli.extract visual  (MANet, reference-shape torch ckpt)
      -> cli.extract feat4   (tiny llama beam decode over the wavlm feats)
      -> cli.extract pack    (bf16 packed store, the production layout)
      -> cli.train           (2 epochs, orbax best-checkpoints)
      -> cli.infer --savewhole (8-stream embedding dump + metrics)

torch/HF appear only in FIXTURE SETUP (writing tiny checkpoints in the
released formats); every compute stage below runs through the jax towers.
"""

import csv
import os
import pathlib
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REF_MANET = pathlib.Path("/root/reference/feature_extraction/visual/manet/model")

N_CLIPS = 10
SPLITS = {"train": 6, "val": 2, "test": 2}
WORDS = ["today", "is", "a", "good", "day", "bad", "happy", "sad", "very"]


def _clip_names():
    out, i = [], 0
    for split, n in SPLITS.items():
        for j in range(n):
            out.append((f"{split}clip{j}", split))
            i += 1
    return out


def _write_wavs(audio_dir, rng):
    audio_dir.mkdir(parents=True)
    for name, _ in _clip_names():
        n = int(rng.integers(5600, 12800))
        pcm = (rng.normal(size=n) * 3000).astype("<i2")
        with wave.open(str(audio_dir / f"{name}.wav"), "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())


def _write_faces(face_dir, rng):
    from PIL import Image

    for name, _ in _clip_names():
        d = face_dir / name
        d.mkdir(parents=True)
        for k in range(3):
            arr = (rng.uniform(0, 255, size=(32, 32, 3))).astype(np.uint8)
            Image.fromarray(arr).save(d / f"frame_{k:03d}.jpg")


def _write_transcripts(csv_path, rng):
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "sentence"])
        for name, _ in _clip_names():
            k = int(rng.integers(3, 8))
            sent = " ".join(rng.choice(WORDS, size=k))
            w.writerow([name, sent])


def _save_tiny_wavlm(model_dir):
    import torch
    from transformers import WavLMConfig, WavLMModel

    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=40, max_bucket_distance=100,
        mask_time_prob=0.0, mask_feature_prob=0.0, layerdrop=0.0,
    )
    torch.manual_seed(0)
    WavLMModel(cfg).eval().save_pretrained(model_dir)


def _save_tiny_bert(model_dir):
    import torch
    from transformers import BertConfig, BertModel

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS
    model_dir.mkdir(parents=True)
    (model_dir / "vocab.txt").write_text("\n".join(vocab) + "\n")
    (model_dir / "tokenizer_config.json").write_text(
        '{"tokenizer_class": "BertTokenizer", "do_lower_case": true}')
    cfg = BertConfig(
        vocab_size=len(vocab), hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64)
    torch.manual_seed(1)
    BertModel(cfg).eval().save_pretrained(model_dir)


def _save_tiny_llama(model_dir):
    """Tiny HF llama CausalLM + a files-on-disk fast tokenizer (WordLevel
    tokenizer.json — no sentencepiece artifact needed, stays offline)."""
    import json

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    # hidden_size matches the bert tower: the fusion model shares its text
    # branch between the gt-text and feat4 views (reference contract — both
    # are 4096-d vicuna streams), so text_dim must equal feat4_dim.
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=1024)
    torch.manual_seed(2)
    LlamaForCausalLM(cfg).eval().save_pretrained(model_dir)
    vocab = {"[UNK]": 0, "<s>": 1, "</s>": 2}
    for i, w in enumerate(WORDS + ["transcribe", "speech", "to", "text"]):
        vocab[w] = 3 + i
    tok = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens": [],
        "normalizer": {"type": "Lowercase"},
        "pre_tokenizer": {"type": "Whitespace"},
        "post_processor": None,
        "decoder": None,
        "model": {"type": "WordLevel", "vocab": vocab, "unk_token": "[UNK]"},
    }
    (model_dir / "tokenizer.json").write_text(json.dumps(tok))
    (model_dir / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "PreTrainedTokenizerFast",
                    "eos_token": "</s>", "unk_token": "[UNK]"}))


def _save_projector(path, wavlm_dim=32, llm_dim=32, k=5, hidden=2048):
    import torch

    torch.manual_seed(3)
    torch.save({
        "encoder_projector.linear1.weight": torch.randn(hidden, k * wavlm_dim) * 0.05,
        "encoder_projector.linear1.bias": torch.zeros(hidden),
        "encoder_projector.linear2.weight": torch.randn(llm_dim, hidden) * 0.02,
        "encoder_projector.linear2.bias": torch.zeros(llm_dim),
    }, path)


def _save_manet(path):
    """Random-init reference-architecture MANet checkpoint (same AST import
    as tests/test_manet.py — the released .pth has this exact key layout)."""
    import ast

    import torch

    glb = {"torch": torch, "nn": torch.nn, "F": torch.nn.functional}
    att = ast.parse((REF_MANET / "attention.py").read_text())
    exec(compile(att, "<attention>", "exec"), glb)
    man = ast.parse((REF_MANET / "manet.py").read_text())
    body = [n for n in man.body
            if not isinstance(n, (ast.Import, ast.ImportFrom))
            and not (isinstance(n, ast.If)
                     and getattr(n.test.left, "id", "") == "__name__")]
    exec(compile(ast.Module(body=body, type_ignores=[]), "<manet>", "exec"), glb)
    torch.manual_seed(4)
    model = glb["manet"](num_classes=7).eval()
    torch.save({"state_dict": model.state_dict()}, path)


def _write_labels(label_path, rng):
    corpora = {f"{s}_corpus": {} for s in SPLITS}
    for name, split in _clip_names():
        corpora[f"{split}_corpus"][name] = {
            "emo": 0.0, "val": float(np.round(rng.uniform(-3, 3), 2))}
    label_path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(label_path, **corpora)


def test_l1_to_l5_smoke(tmp_path, monkeypatch):
    if not REF_MANET.exists():
        pytest.skip("reference MANet source unavailable")
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")

    from sdumc_tpu.cli import extract as extract_cli

    rng = np.random.default_rng(42)
    raw = tmp_path / "raw"
    _write_wavs(raw / "audio", rng)
    _write_faces(raw / "faces", rng)
    _write_transcripts(raw / "transcripts.csv", rng)

    models = tmp_path / "tools"
    _save_tiny_wavlm(models / "wavlm-tiny")
    _save_tiny_bert(models / "bert-tiny")
    _save_tiny_llama(models / "llama-tiny")
    _save_projector(models / "projector.pt")
    _save_manet(models / "manet.pth")

    feats = tmp_path / "stage_out"

    # ---- L1: the four extraction stages, each through the public CLI ----
    rc = extract_cli.main([
        "audio", "--model_dir", str(models / "wavlm-tiny"),
        "--audio_dir", str(raw / "audio"), "--save_dir", str(feats),
        "--model_name", "wavlm-tiny", "--layer_ids=-2",
        "--batch_size", "4"])
    assert not rc
    audio_out = feats / "wavlm-tiny-FRA_-2"
    audio_feats = sorted(audio_out.glob("*.npy"))
    assert len(audio_feats) == N_CLIPS
    a0 = np.load(audio_feats[0])
    assert a0.ndim == 2 and a0.shape[1] == 32 and np.isfinite(a0).all()

    text_out = feats / "bert-tiny-txt"
    rc = extract_cli.main([
        "text", "--model_dir", str(models / "bert-tiny"),
        "--trans_path", str(raw / "transcripts.csv"),
        "--save_dir", str(text_out), "--family", "bert",
        "--layer_ids=-2,-1", "--batch_size", "4"])
    assert not rc
    t0 = np.load(sorted(text_out.glob("*.npy"))[0])
    assert t0.ndim == 2 and t0.shape[1] == 32 and np.isfinite(t0).all()
    assert len(list(text_out.glob("*.npy"))) == N_CLIPS

    rc = extract_cli.main([
        "visual", "--checkpoint", str(models / "manet.pth"),
        "--face_dir", str(raw / "faces"), "--save_dir", str(feats),
        "--batch_size", "8"])
    assert not rc
    video_out = feats / "manet_FRA"
    v0 = np.load(sorted(video_out.glob("*.npy"))[0])
    assert v0.shape == (3, 1024) and np.isfinite(v0).all()

    feat4_out = feats / "feat4-tiny"
    rc = extract_cli.main([
        "feat4", "--llm_dir", str(models / "llama-tiny"),
        "--projector_path", str(models / "projector.pt"),
        "--wavlm_dir", str(audio_out), "--save_dir", str(feat4_out),
        "--num_beams", "2", "--max_new_tokens", "3", "--gen_batch", "2",
        "--tap_layers=-2,-1"])
    assert not rc
    f0 = np.load(sorted(feat4_out.glob("*.npy"))[0])
    assert f0.ndim == 2 and f0.shape[1] == 32 and np.isfinite(f0).all()
    assert len(list(feat4_out.glob("*.npy"))) == N_CLIPS

    # ---- L3: bf16 packed stores in the dataset layout -------------------
    data_root = tmp_path / "dataset"
    features_dir = data_root / "features" / "CMU-MOSEI"
    features_dir.mkdir(parents=True)
    feature_names = {
        "audio": "wavlm-tiny-FRA_-2", "text": "bert-tiny-txt",
        "video": "manet_FRA", "feat4": "feat4-tiny"}
    for src in (audio_out, text_out, video_out, feat4_out):
        rc = extract_cli.main([
            "pack", "--src_dir", str(src),
            "--out_prefix", str(features_dir / src.name),
            "--dtype", "bfloat16"])
        assert not rc
        assert (features_dir / f"{src.name}.bin").exists()
    _write_labels(data_root / "labels" / "CMU-MOSEI.npz", rng)
    monkeypatch.setenv("SDUMC_DATA_DIR", str(data_root))

    # ---- L5: train 2 epochs, then inference with the embedding dump -----
    from sdumc_tpu.cli import infer as infer_cli
    from sdumc_tpu.cli import train as train_cli

    common = [
        "--audio_feature", feature_names["audio"],
        "--text_feature", feature_names["text"],
        "--video_feature", feature_names["video"],
        "--feat4_feature", feature_names["feat4"],
        "--feature_dtype", "bfloat16",
        "--batch_size", "8", "--layers", "16,8", "--num_workers", "0",
        "--save_root", str(tmp_path / "saved"),
        "--checkpoint_dir", str(tmp_path / "ckpt"),
    ]
    result = train_cli.main(common + ["--epochs", "2", "--seed", "7"])
    assert np.isfinite(result["best_full"]["mse"])
    assert np.isfinite(result["best_missing"]["mae"])
    best = tmp_path / "ckpt" / "best_full"
    assert best.exists()

    out = infer_cli.main(common + ["--savewhole", "--checkpoint", str(best)])
    assert np.isfinite(out["full"]["mse"]) and np.isfinite(out["missing"]["mse"])
    dump = np.load(tmp_path / "saved" / "test_embeddings.npz")
    n_test = SPLITS["test"]
    for stream in ("full_rep", "missing_rep", "full_rnc", "missing_rnc",
                   "text_rep_query_full", "text_rep_query_missing",
                   "text_rep_full", "text_rep_missing"):
        assert dump[stream].shape[0] == n_test, stream
        assert np.isfinite(dump[stream]).all(), stream
    assert dump["val_preds_full"].shape == (n_test,)

"""Whisper ASR parity vs HF on a tiny random config (no download).

Closes the reference's ASR text-variant production gap
(shell/main_text_missing_icassp_inference.sh:6-9): encoder, cached
decoder, and the jitted greedy transcription loop must match HF."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert.hf_whisper import hf_whisper_to_params
from sdumc_tpu.models.whisper import (WhisperConfig, WhisperModel,
                                      greedy_transcribe, init_self_caches)


@pytest.fixture(scope="module")
def setup():
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=100, num_mel_bins=8, encoder_layers=2,
        encoder_attention_heads=2, decoder_layers=2,
        decoder_attention_heads=2, d_model=16, encoder_ffn_dim=32,
        decoder_ffn_dim=32, max_source_positions=50,
        max_target_positions=40, pad_token_id=0, bos_token_id=1,
        decoder_start_token_id=2, eos_token_id=3,
        begin_suppress_tokens=[7, 3], suppress_tokens=[9],
    )
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = WhisperConfig.from_hf(hf_cfg)
    params = hf_whisper_to_params(hf.state_dict())
    model = WhisperModel(cfg)
    rng = np.random.default_rng(0)
    mel = rng.normal(size=(2, 8, 100)).astype(np.float32)
    return hf, hf_cfg, cfg, model, params, mel


def test_converter_covers_structure(setup):
    _, _, cfg, model, params, mel = setup
    want = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.asarray(mel),
                           jnp.zeros((2, 4), jnp.int32)))["params"]
    got_paths = {tuple(map(str, p)) for p, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    want_paths = {tuple(map(str, p)) for p, _ in
                  jax.tree_util.tree_flatten_with_path(want)[0]}
    assert got_paths == want_paths


def test_encoder_matches_hf(setup):
    hf, _, cfg, model, params, mel = setup
    with torch.no_grad():
        ref = hf.model.encoder(torch.tensor(mel)).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(mel),
                                 method=WhisperModel.encode))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_forward_logits_match_hf(setup):
    hf, _, cfg, model, params, mel = setup
    ids = np.array([[2, 5, 11, 12], [2, 5, 30, 31]], np.int64)
    with torch.no_grad():
        ref = hf(input_features=torch.tensor(mel),
                 decoder_input_ids=torch.tensor(ids)).logits.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(mel),
                                 jnp.asarray(ids, jnp.int32))["logits"])
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_cached_decode_matches_uncached(setup):
    _, _, cfg, model, params, mel = setup
    ids = jnp.asarray([[2, 5, 11, 12]], jnp.int32)
    melj = jnp.asarray(mel[:1])
    full = model.apply({"params": params}, melj, ids)["logits"]

    enc = model.apply({"params": params}, melj, method=WhisperModel.encode)
    xkvs = model.apply({"params": params}, enc,
                       method=WhisperModel.decoder_cross_kv)
    caches = init_self_caches(cfg, 1, 8)
    outs = []
    for t in range(ids.shape[1]):
        mask = jnp.where(jnp.arange(8)[None, None, None, :] <= t, 0.0, -1e30)
        o = model.apply({"params": params}, ids[:, t:t + 1],
                        positions=jnp.full((1, 1), t, jnp.int32),
                        caches=caches, self_mask=mask, xkvs=xkvs,
                        method=WhisperModel.decode)
        caches = o["caches"]
        outs.append(np.asarray(o["logits"][:, 0]))
    np.testing.assert_allclose(np.stack(outs, 1), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_greedy_transcribe_matches_hf_generate(setup):
    hf, hf_cfg, cfg, model, params, mel = setup
    max_new = 12
    # this transformers version ignores config-level forced_decoder_ids in
    # generate — express the forced prefix as explicit decoder_input_ids
    # (equivalent semantics: position 1 forced to token 5) and pass the
    # suppress lists explicitly
    with torch.no_grad():
        ref = hf.generate(
            input_features=torch.tensor(mel),
            decoder_input_ids=torch.tensor(
                [[hf_cfg.decoder_start_token_id, 5]] * mel.shape[0]),
            suppress_tokens=[9], begin_suppress_tokens=[7, 3],
            # our max_new counts the forced position too; HF's counts only
            # tokens after the 2-token prompt
            max_new_tokens=max_new - 1, do_sample=False, num_beams=1).numpy()

    def apply_fn(method, *a, **kw):
        return model.apply({"params": params}, *a,
                           method=getattr(WhisperModel, method), **kw)

    got = jax.jit(lambda m: greedy_transcribe(
        apply_fn, m, cfg,
        start_id=hf_cfg.decoder_start_token_id,
        eos_id=hf_cfg.eos_token_id,
        max_new_tokens=max_new,
        forced_ids=((1, 5),),
        suppress_ids=(9,),
        begin_suppress_ids=(7, 3),
    ))(jnp.asarray(mel))

    toks = np.asarray(got["tokens"])
    for b in range(mel.shape[0]):
        # HF returns ONLY the free tokens (prompt stripped); our row is
        # [forced 5, free tokens...], EOS-padded
        assert toks[b][0] == 5
        hf_core = []
        for t in ref[b]:
            if t == hf_cfg.eos_token_id:
                break
            hf_core.append(int(t))
        ours_free = [int(t) for t in toks[b][1:1 + len(hf_core)]]
        assert ours_free == hf_core, (b, ours_free, hf_core)
        assert int(got["n_tokens"][b]) == 1 + len(hf_core)


def test_log_mel_matches_hf_extractor():
    from transformers import WhisperFeatureExtractor

    from sdumc_tpu.ops.mel import log_mel_spectrogram

    fe = WhisperFeatureExtractor(feature_size=80)
    rng = np.random.default_rng(0)
    wav = (rng.normal(size=(2, 16000 * 5)) * 0.1).astype(np.float32)
    ref = fe(list(wav), sampling_rate=16000, return_tensors="np").input_features
    got = np.asarray(log_mel_spectrogram(wav))
    assert got.shape == ref.shape == (2, 80, 3000)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_asr_pipeline_tokens_match_hf(setup):
    """wav -> our mel -> our encoder -> our greedy loop == HF feature
    extractor + generate, end to end on the tiny random model (the
    extract/asr.py path minus file IO/tokenizer decode)."""
    from transformers import WhisperFeatureExtractor

    from sdumc_tpu.ops.mel import log_mel_spectrogram

    hf, hf_cfg, cfg, model, params, _ = setup
    rng = np.random.default_rng(7)
    wav = (rng.normal(size=(2, 16000 * 3)) * 0.05).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=cfg.num_mel_bins)
    mel_hf = fe(list(wav), sampling_rate=16000,
                return_tensors="np").input_features
    # the tiny model's window is 2*max_source_positions=100 frames (a real
    # checkpoint's is the extractor's full 3000) — trim both sides alike
    mel_hf = mel_hf[:, :, :2 * cfg.max_source_positions]
    with torch.no_grad():
        ref = hf.generate(
            input_features=torch.tensor(mel_hf),
            suppress_tokens=[9], begin_suppress_tokens=[7, 3],
            max_new_tokens=10, do_sample=False, num_beams=1).numpy()

    def apply_fn(method, *a, **kw):
        return model.apply({"params": params}, *a,
                           method=getattr(WhisperModel, method), **kw)

    mel = log_mel_spectrogram(wav, n_mels=cfg.num_mel_bins)
    mel = mel[:, :, :2 * cfg.max_source_positions]
    got = jax.jit(lambda m: greedy_transcribe(
        apply_fn, m, cfg,
        start_id=hf_cfg.decoder_start_token_id, eos_id=hf_cfg.eos_token_id,
        max_new_tokens=10, suppress_ids=(9,), begin_suppress_ids=(7, 3),
    ))(mel)
    toks = np.asarray(got["tokens"])
    for b in range(2):
        hf_core = []
        for t in ref[b][1:]:  # strip leading start token
            if t == hf_cfg.eos_token_id:
                break
            hf_core.append(int(t))
        assert [int(t) for t in toks[b][:len(hf_core)]] == hf_core, b


def test_energy_vad_finds_bursts():
    """Synthetic silence + two tone bursts -> two segments covering the
    bursts; pure silence -> whole clip (robust-extractor fallback)."""
    from sdumc_tpu.extract.asr import energy_vad

    sr = 16000
    rng = np.random.default_rng(0)
    wav = rng.normal(size=sr * 6).astype(np.float32) * 1e-4  # noise floor
    t1 = np.arange(sr)
    wav[sr:2 * sr] += 0.3 * np.sin(2 * np.pi * 220 * t1 / sr)
    wav[4 * sr:5 * sr] += 0.3 * np.sin(2 * np.pi * 330 * t1 / sr)
    segs = energy_vad(wav, sr=sr)
    assert len(segs) == 2
    (s0, e0), (s1, e1) = segs
    assert s0 <= sr <= 2 * sr <= e0 + sr // 5
    assert s1 <= 4 * sr <= 5 * sr <= e1 + sr // 5
    assert e0 < 4 * sr  # the 2 s gap is NOT merged

    silent = rng.normal(size=sr).astype(np.float32) * 1e-5
    assert energy_vad(silent, sr=sr) == [(0, len(silent))]

"""WavLM encoder parity vs transformers (tiny random config, no download)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sdumc_tpu.convert.hf_wavlm import config_from_hf, hf_wavlm_to_params
from sdumc_tpu.models.wavlm import WavLMModel


def _build(feat_extract_norm, do_stable_layer_norm, seed=0):
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel as HFWavLM

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        conv_bias=True, feat_extract_norm=feat_extract_norm,
        do_stable_layer_norm=do_stable_layer_norm,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=40, max_bucket_distance=100,
        mask_time_prob=0.0, mask_feature_prob=0.0, layerdrop=0.0,
    )
    torch.manual_seed(seed)
    hf = HFWavLM(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = hf_wavlm_to_params(hf.state_dict())
    return hf, cfg, params


@pytest.mark.parametrize("norm,stable", [("layer", True), ("group", False)])
def test_wavlm_hidden_state_parity(norm, stable):
    hf, cfg, params = _build(norm, stable)
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 800)).astype(np.float32)
    with torch.no_grad():
        out_t = hf(torch.tensor(wav), output_hidden_states=True)
    model = WavLMModel(cfg)
    out_j = model.apply({"params": params}, jnp.array(wav), output_hidden_states=True)

    np.testing.assert_allclose(
        np.asarray(out_j["last_hidden_state"]),
        out_t.last_hidden_state.numpy(), rtol=2e-4, atol=2e-4,
    )
    assert len(out_j["hidden_states"]) == len(out_t.hidden_states)
    # the reference taps hidden_states[-5] on the 24-layer model
    # (extract_transformers_embedding.py:125); check every tap here
    for i, (hj, ht) in enumerate(zip(out_j["hidden_states"], out_t.hidden_states)):
        np.testing.assert_allclose(
            np.asarray(hj), ht.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"hidden_states[{i}]",
        )


def test_output_length_matches_hf_and_shapes():
    hf, cfg, params = _build("layer", True)
    n = 1234
    assert cfg.output_length(n) == int(
        hf._get_feat_extract_output_lengths(torch.tensor(n))
    )
    rng = np.random.default_rng(1)
    wav = rng.normal(size=(1, n)).astype(np.float32)
    model = WavLMModel(cfg)
    out = model.apply({"params": params}, jnp.array(wav))
    assert out["last_hidden_state"].shape == (1, cfg.output_length(n), cfg.hidden_size)


@pytest.mark.slow  # >20 s on this 1-core host; full suite still runs it
def test_batched_masked_extraction_matches_single():
    """Zero-padding + frame mask must reproduce per-clip extraction — the
    TPU replacement for the reference's one-wav-at-a-time loop."""
    hf, cfg, params = _build("layer", True)
    rng = np.random.default_rng(2)
    n1, n2 = 800, 520
    w1 = rng.normal(size=(n1,)).astype(np.float32)
    w2 = rng.normal(size=(n2,)).astype(np.float32)
    model = WavLMModel(cfg)

    single1 = model.apply({"params": params}, jnp.array(w1[None]))["last_hidden_state"]
    single2 = model.apply({"params": params}, jnp.array(w2[None]))["last_hidden_state"]

    batch = np.zeros((2, n1), np.float32)
    batch[0], batch[1, :n2] = w1, w2
    t1, t2 = cfg.output_length(n1), cfg.output_length(n2)
    mask = np.zeros((2, t1), bool)
    mask[0, :t1], mask[1, :t2] = True, True
    out = model.apply({"params": params}, jnp.array(batch), pad_mask=jnp.array(mask))[
        "last_hidden_state"
    ]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(single1[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[1, :t2]), np.asarray(single2[0]),
                               rtol=2e-4, atol=2e-4)


def test_extract_audio_features_budget_batched():
    """extract/audio.py's frame-budget batching == per-clip HF extraction."""
    import torch as _torch

    from sdumc_tpu.extract.audio import extract_audio_features, zero_mean_unit_var
    from sdumc_tpu.models.wavlm import WavLMModel

    hf, cfg, params = _build("layer", True)
    model = WavLMModel(cfg)
    rng = np.random.default_rng(3)
    wavs = [rng.normal(size=(n,)).astype(np.float32) for n in (300, 800, 555, 1200, 90)]
    feats = extract_audio_features(model, params, cfg, wavs, layer_ids=(-2,),
                                   batch_size=2, buckets=(400, 800, 1600))
    for i in (0, 3, 4):
        with _torch.no_grad():
            ref = hf(_torch.tensor(zero_mean_unit_var(wavs[i]))[None],
                     output_hidden_states=True).hidden_states[-2][0].numpy()
        np.testing.assert_allclose(feats[i], ref, rtol=3e-4, atol=3e-4)


@pytest.mark.parametrize("family", ["wav2vec2", "hubert"])
def test_wav2vec2_hubert_parity(family):
    """The same trunk with use_rel_pos_bias=False reproduces HF wav2vec2 and
    HuBERT (the audio extractor's other families)."""
    if family == "wav2vec2":
        from transformers import Wav2Vec2Config as HFConfig
        from transformers import Wav2Vec2Model as HFModel
    else:
        from transformers import HubertConfig as HFConfig
        from transformers import HubertModel as HFModel

    hf_cfg = HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        conv_bias=True, feat_extract_norm="layer", do_stable_layer_norm=True,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        mask_time_prob=0.0, mask_feature_prob=0.0, layerdrop=0.0,
    )
    torch.manual_seed(5)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert not cfg.use_rel_pos_bias
    params = hf_wavlm_to_params(hf.state_dict())
    rng = np.random.default_rng(0)
    wav = rng.normal(size=(2, 700)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(wav)).last_hidden_state.numpy()
    got = WavLMModel(cfg).apply({"params": params}, jnp.array(wav))["last_hidden_state"]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_extract_audio_features_bf16_close_to_f32():
    """The --dtype=bfloat16 fast path must track the exact f32 extraction
    closely (cosine > 0.995 per clip) — it is a throughput option, not a
    different feature."""
    from sdumc_tpu.extract.audio import extract_audio_features
    from sdumc_tpu.models.wavlm import WavLMModel

    _, cfg, params = _build("layer", True)
    model = WavLMModel(cfg)
    rng = np.random.default_rng(4)
    wavs = [rng.normal(size=(n,)).astype(np.float32) for n in (300, 800)]
    kw = dict(layer_ids=(-2,), batch_size=2, buckets=(400, 800))
    f32 = extract_audio_features(model, params, cfg, wavs, **kw)
    bf16 = extract_audio_features(model, params, cfg, wavs, dtype="bfloat16", **kw)
    for a, b in zip(f32, bf16):
        assert a.shape == b.shape
        cos = np.sum(a * b, -1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
        assert float(cos.min()) > 0.995, float(cos.min())

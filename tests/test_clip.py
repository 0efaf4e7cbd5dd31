"""CLIP vision tower parity vs HF transformers on a tiny random config
(the alternative visual extractor family,
extract_vision_huggingface.py:134-146)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sdumc_tpu.convert.hf_clip import config_from_hf, hf_clip_vision_to_params
from sdumc_tpu.models.clip_vit import CLIPVisionConfig, CLIPVisionTower


@pytest.fixture(scope="module")
def tiny_hf():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection as HFModel

    hf_cfg = HFCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=24, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    return hf, hf_cfg


def test_clip_vision_parity(tiny_hf):
    hf, hf_cfg = tiny_hf
    cfg = config_from_hf(hf_cfg)
    params = hf_clip_vision_to_params(hf.state_dict())
    model = CLIPVisionTower(cfg)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)  # NCHW
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pixels), output_hidden_states=True)
    got = model.apply(
        {"params": params}, jnp.asarray(pixels.transpose(0, 2, 3, 1))
    )

    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        ref.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["image_features"]),
        ref.image_embeds.numpy(), rtol=1e-4, atol=1e-5,
    )


def test_clip_config_roundtrip(tiny_hf):
    _, hf_cfg = tiny_hf
    cfg = config_from_hf(hf_cfg)
    assert cfg.num_positions == 17  # (32/8)^2 + 1
    assert cfg.hidden_act == "quick_gelu"
    assert cfg.projection_dim == 24


def test_clip_jit_batched(tiny_hf):
    """Batched jit forward — frames of a whole clip in one program."""
    hf, hf_cfg = tiny_hf
    cfg = config_from_hf(hf_cfg)
    params = hf_clip_vision_to_params(hf.state_dict())
    model = CLIPVisionTower(cfg)
    pixels = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 32, 32, 3)), jnp.float32)
    feats = jax.jit(lambda p, x: model.apply({"params": p}, x)["image_features"])(
        params, pixels)
    assert feats.shape == (8, 24)
    per_frame = [
        np.asarray(model.apply({"params": params}, pixels[i:i + 1])["image_features"])
        for i in range(3)
    ]
    np.testing.assert_allclose(
        np.asarray(feats[:3]), np.concatenate(per_frame), rtol=1e-5, atol=1e-6)


def test_vision_extract_dir_semantics(tmp_path):
    """Driver semantics: every-5th-frame resample, FRAME/UTTERANCE shapes,
    empty-video edge case (extract_vision_huggingface.py:100-107,186-200)."""
    from PIL import Image

    from sdumc_tpu.extract.vision_hf import (
        CLIP_MEAN, CLIP_STD, extract_dir, resample_frames, save_embeddings)

    face_dir = tmp_path / "faces"
    rng = np.random.default_rng(0)
    for vid, n in (("v_a", 12), ("v_b", 1), ("v_empty", 0)):
        d = face_dir / vid
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            ).save(d / f"{i:04d}.png")

    def fake_run(pixels):
        return jnp.mean(pixels, axis=(1, 2))  # [B, 3] "embedding"

    save_dir = tmp_path / "out"
    n = extract_dir(
        fake_run, str(face_dir), str(save_dir),
        image_size=8, mean=CLIP_MEAN, std=CLIP_STD, dim=3,
        feature_level="FRAME", resample_step=5, batch_size=4,
    )
    assert n == 3
    a = np.load(save_dir / "v_a.npy")
    assert a.shape == (3, 3)  # 12 frames, step 5 -> frames 0,5,10
    b = np.load(save_dir / "v_b.npy")
    assert b.shape == (1, 3)  # single frame stays 2-D
    e = np.load(save_dir / "v_empty.npy")
    assert e.shape == (1, 3) and not e.any()  # zeros placeholder

    # UTTERANCE semantics
    utt_dir = tmp_path / "utt"
    extract_dir(
        fake_run, str(face_dir), str(utt_dir),
        image_size=8, mean=CLIP_MEAN, std=CLIP_STD, dim=3,
        feature_level="UTTERANCE", resample_step=5, batch_size=4,
    )
    ua = np.load(utt_dir / "v_a.npy")
    np.testing.assert_allclose(ua, a.mean(axis=0), rtol=1e-6)
    assert np.load(utt_dir / "v_empty.npy").shape == (3,)

    assert resample_frames(list(range(11)), 5) == [0, 5, 10]


def test_dinov2_parity():
    """From-scratch DINOv2 == HF Dinov2Model on a tiny config (LayerScale
    residual branches, CLS pooling) — the second ViT alternative family."""
    import torch
    from transformers import Dinov2Config as HFCfg
    from transformers import Dinov2Model as HFModel

    from sdumc_tpu.convert.hf_dinov2 import config_from_hf, hf_dinov2_to_params
    from sdumc_tpu.models.dinov2 import Dinov2Model

    hf_cfg = HFCfg(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=4, image_size=28, patch_size=7,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = hf_dinov2_to_params(hf.state_dict(), cfg)
    model = Dinov2Model(cfg)

    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(np.transpose(pixels, (0, 3, 1, 2))))
    got = model.apply({"params": params}, jnp.asarray(pixels))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        ref.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got["pooled"]), ref.pooler_output.numpy(),
        rtol=1e-4, atol=1e-5)


def test_dinov2_swiglu_variant():
    """The giant-model SwiGLU FFN path also matches HF."""
    import torch
    from transformers import Dinov2Config as HFCfg
    from transformers import Dinov2Model as HFModel

    from sdumc_tpu.convert.hf_dinov2 import config_from_hf, hf_dinov2_to_params
    from sdumc_tpu.models.dinov2 import Dinov2Model

    hf_cfg = HFCfg(
        hidden_size=24, num_hidden_layers=2, num_attention_heads=4,
        mlp_ratio=4, image_size=21, patch_size=7, use_swiglu_ffn=True,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    params = hf_dinov2_to_params(hf.state_dict(), cfg)
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(1, 21, 21, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.tensor(np.transpose(pixels, (0, 3, 1, 2))))
    got = Dinov2Model(cfg).apply({"params": params}, jnp.asarray(pixels))
    np.testing.assert_allclose(
        np.asarray(got["pooled"]), ref.pooler_output.numpy(),
        rtol=1e-4, atol=1e-5)


def test_videomae_parity():
    """From-scratch VideoMAE == HF VideoMAEModel on a tiny config (tubelet
    3D patch conv, regenerated sinusoid table, q/v-only attention biases)."""
    import torch
    from transformers import VideoMAEConfig as HFCfg
    from transformers import VideoMAEModel as HFModel

    from sdumc_tpu.convert.hf_videomae import (
        config_from_hf, hf_videomae_to_params)
    from sdumc_tpu.models.videomae import VideoMAEModel

    hf_cfg = HFCfg(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, image_size=16, patch_size=8, num_frames=4,
        tubelet_size=2, attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.use_mean_pooling  # trunk has no final LN
    params = hf_videomae_to_params(hf.state_dict(), cfg)
    model = VideoMAEModel(cfg)

    rng = np.random.default_rng(0)
    video = rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        # HF layout: [B, T, C, H, W]
        ref = hf(torch.tensor(np.transpose(video, (0, 1, 4, 2, 3))))
    got = model.apply({"params": params}, jnp.asarray(video))
    np.testing.assert_allclose(
        np.asarray(got["last_hidden_state"]),
        ref.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5)

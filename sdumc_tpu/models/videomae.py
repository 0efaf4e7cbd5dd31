"""VideoMAE encoder — the temporal ViT alternative visual extractor.

The reference's alternative-visual family includes videomae-base/large
driven through HF over 16-frame face-crop windows
(feature_extraction/visual/extract_vision_huggingface.py:134-146;
toolkit/globals.py WHOLE_IMAGE). From-scratch JAX VideoMAE
(HF ``VideoMAEModel`` semantics):

  video [B, T, H, W, 3] -> 3D tubelet conv (tubelet x patch x patch)
  -> fixed sinusoid position table (regenerated, not stored) -> N pre-LN
  ViT layers with VideoMAE's asymmetric qkv bias (q/v biased, k bias
  pinned to zero) -> optional final LN (absent for use_mean_pooling
  checkpoints); the clip embedding is the token mean.

Parity oracle: HF ``VideoMAEModel`` on tiny configs (tests/test_clip.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class VideoMAEConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    num_frames: int = 16
    tubelet_size: int = 2
    layer_norm_eps: float = 1e-12
    qkv_bias: bool = True
    use_mean_pooling: bool = True    # True -> no final LN in the trunk
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return ((self.image_size // self.patch_size) ** 2
                * (self.num_frames // self.tubelet_size))

    @staticmethod
    def tiny(**kw) -> "VideoMAEConfig":
        base = dict(hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, image_size=16, patch_size=8,
                    num_frames=4, tubelet_size=2)
        base.update(kw)
        return VideoMAEConfig(**base)


def sinusoid_table(n_position: int, d: int) -> np.ndarray:
    """HF get_sinusoid_encoding_table (modeling_videomae.py:81-92)."""
    pos = np.arange(n_position)[:, None]
    i = np.arange(d)[None, :]
    angle = pos / np.power(10000, 2 * (i // 2) / d)
    table = np.zeros((n_position, d), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None]


class VideoMAELayer(nn.Module):
    cfg: VideoMAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        D, H = cfg.hidden_size, cfg.num_heads
        hd = D // H
        B, N, _ = x.shape

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_before")(x)
        # VideoMAE quirk: q and v carry biases, k's bias is pinned to zero
        q = nn.Dense(D, use_bias=cfg.qkv_bias, name="query")(h)
        k = nn.Dense(D, use_bias=False, name="key")(h)
        v = nn.Dense(D, use_bias=cfg.qkv_bias, name="value")(h)
        q = q.reshape(B, N, H, hd)
        k = k.reshape(B, N, H, hd)
        v = v.reshape(B, N, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        probs = jnp.asarray(
            jax.nn.softmax(scores.astype(jnp.float32), axis=-1), x.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, D)
        x = x + nn.Dense(D, name="attn_out")(att)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_after")(x)
        h = nn.Dense(cfg.intermediate_size, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(D, name="fc2")(h)


class VideoMAEModel(nn.Module):
    cfg: VideoMAEConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray):
        """video: [B, T, H, W, 3] (T == cfg.num_frames) -> dict with
        last_hidden_state [B, P, D] and pooled [B, D] (token mean)."""
        cfg = self.cfg
        B = video.shape[0]
        D = cfg.hidden_size
        p, tb = cfg.patch_size, cfg.tubelet_size
        kernel = self.param("patch_kernel", nn.initializers.he_normal(),
                            (tb, p, p, 3, D))
        bias = self.param("patch_bias", nn.initializers.zeros, (D,))
        x = jax.lax.conv_general_dilated(
            video, kernel, window_strides=(tb, p, p),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ) + bias
        x = x.reshape(B, -1, D)
        x = x + jnp.asarray(sinusoid_table(cfg.num_patches, D), x.dtype)

        for i in range(cfg.num_layers):
            x = VideoMAELayer(cfg, name=f"layers_{i}")(x)
        if not cfg.use_mean_pooling:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        return {"last_hidden_state": x, "pooled": jnp.mean(x, axis=1)}

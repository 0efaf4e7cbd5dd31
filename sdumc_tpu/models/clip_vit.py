"""CLIP vision tower (ViT) — the alternative visual extractor family.

The reference drives clip-vit-base/large (plus DINOv2/VideoMAE/EVA) through
HF ``model.get_image_features`` over OpenFace face crops
(feature_extraction/visual/extract_vision_huggingface.py:134-146,172-179).
This is a from-scratch JAX CLIP ViT:

  pixels [B, H, W, 3] -> patch conv (stride=patch, no bias) + CLS token
  + learned position embeddings -> pre-LN -> N pre-norm transformer layers
  (quick-gelu MLP) -> post-LN on the CLS token = pooled -> visual projection
  [B, proj_dim] (= get_image_features).

Everything is one jit; frames batch across the clip instead of the
reference's per-video python loop. TPU notes: images arrive NHWC (XLA's
native conv layout), attention is a single einsum per layer — at 257
tokens the MXU is fully tiled and flash-style kernels are unnecessary.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    dtype: Any = jnp.float32

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    @staticmethod
    def tiny(**kw) -> "CLIPVisionConfig":
        base = dict(hidden_size=32, intermediate_size=64, num_layers=2,
                    num_heads=4, image_size=32, patch_size=8,
                    projection_dim=24)
        base.update(kw)
        return CLIPVisionConfig(**base)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(name)


class CLIPAttention(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, T, D = x.shape
        H = c.num_heads
        hd = D // H
        q = nn.Dense(D, name="q_proj")(x).reshape(B, T, H, hd)
        k = nn.Dense(D, name="k_proj")(x).reshape(B, T, H, hd)
        v = nn.Dense(D, name="v_proj")(x).reshape(B, T, H, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.Dense(D, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        act = _act(c.hidden_act)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm1")(x)
        x = x + CLIPAttention(c, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = nn.Dense(c.hidden_size, name="fc2")(act(h))
        return x + h


class CLIPVisionTower(nn.Module):
    """Returns dict with pooled (post-LN CLS), image_features (projected),
    and last_hidden_state."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        """pixels: [B, H, W, 3] float (CLIP-normalized, NHWC)."""
        c = self.cfg
        B = pixels.shape[0]
        patches = nn.Conv(
            c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            name="patch_embedding",
        )(pixels.astype(c.dtype))                      # [B, h, w, D]
        patches = patches.reshape(B, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, c.hidden_size)).astype(c.dtype), patches],
            axis=1,
        )
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.num_positions, c.hidden_size))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="pre_layernorm")(x)
        for i in range(c.num_layers):
            x = CLIPLayer(c, name=f"layers_{i}")(x)
        pooled = nn.LayerNorm(epsilon=c.layer_norm_eps, name="post_layernorm")(
            x[:, 0]
        )
        feats = nn.Dense(c.projection_dim, use_bias=False,
                         name="visual_projection")(pooled)
        return {
            "last_hidden_state": x,
            "pooled": pooled,
            "image_features": feats,
        }

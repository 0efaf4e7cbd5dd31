"""DINOv2 vision tower — the self-supervised ViT alternative extractor.

The reference's alternative-visual family drives DINOv2 through HF
``AutoModel`` over face crops alongside CLIP/VideoMAE/EVA
(feature_extraction/visual/extract_vision_huggingface.py:134-146). This is
a from-scratch JAX DINOv2 (HF ``Dinov2Model`` semantics):

  pixels [B, H, W, 3] -> patch conv (+bias) + CLS token + learned position
  embeddings -> N pre-norm layers, each with **LayerScale** on both the
  attention and MLP residual branches (lambda1 vectors) -> final LayerNorm;
  the embedding is the CLS row (HF pooler_output).

Parity oracle: HF ``Dinov2Model`` on tiny configs (tests/test_clip.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    image_size: int = 518
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    use_swiglu_ffn: bool = False
    dtype: Any = jnp.float32

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def tiny(**kw) -> "Dinov2Config":
        base = dict(hidden_size=32, num_layers=2, num_heads=4,
                    image_size=28, patch_size=7)
        base.update(kw)
        return Dinov2Config(**base)


class Dinov2Layer(nn.Module):
    cfg: Dinov2Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        D, H = cfg.hidden_size, cfg.num_heads
        hd = D // H
        B, N, _ = x.shape

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        q = nn.Dense(D, name="query")(h).reshape(B, N, H, hd)
        k = nn.Dense(D, name="key")(h).reshape(B, N, H, hd)
        v = nn.Dense(D, name="value")(h).reshape(B, N, H, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        probs = jnp.asarray(
            nn.softmax(scores.astype(jnp.float32), axis=-1), x.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, D)
        att = nn.Dense(D, name="attn_out")(att)
        ls1 = self.param("layer_scale1", nn.initializers.ones, (D,))
        x = x + att * ls1

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        if cfg.use_swiglu_ffn:
            hidden = int(cfg.hidden_size * cfg.mlp_ratio * 2 / 3 + 7) // 8 * 8
            w12 = nn.Dense(2 * hidden, name="weights_in")(h)
            g, u = jnp.split(w12, 2, axis=-1)
            h = nn.Dense(D, name="weights_out")(nn.silu(g) * u)
        else:
            h = nn.Dense(cfg.hidden_size * cfg.mlp_ratio, name="fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(D, name="fc2")(h)
        ls2 = self.param("layer_scale2", nn.initializers.ones, (D,))
        return x + h * ls2


class Dinov2Model(nn.Module):
    cfg: Dinov2Config

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        """pixels: [B, H, W, 3] (NHWC) -> dict with last_hidden_state
        [B, 1+P, D] and pooled [B, D] (the post-LN CLS row, HF
        pooler_output)."""
        cfg = self.cfg
        B = pixels.shape[0]
        D = cfg.hidden_size
        patches = nn.Conv(
            D, kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            name="patch_embed",
        )(pixels).reshape(B, -1, D)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, D)), patches], axis=1)
        pos = self.param("position_embeddings", nn.initializers.zeros,
                         (1, cfg.num_patches + 1, D))
        x = x + pos

        for i in range(cfg.num_layers):
            x = Dinov2Layer(cfg, name=f"layers_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        return {"last_hidden_state": x, "pooled": x[:, 0]}

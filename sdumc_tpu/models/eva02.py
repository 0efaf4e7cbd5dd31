"""EVA-02 vision tower — the MIM-pretrained ViT alternative extractor.

The reference's 4th alternative visual family loads
``eva02_base_patch14_224.mim_in22k`` through timm
(feature_extraction/visual/extract_vision_huggingface.py:23,142-146) and
mean-pools the patch tokens into a [768] frame embedding. This is a
clean-room JAX EVA-02 built from the published architecture (EVA-02: "A
Visual Representation for Neon Genesis", arXiv:2303.11331):

  pixels [B, H, W, 3] -> patch conv (+bias) + CLS token + learned position
  embeddings -> N pre-norm blocks with

  * **2D axial rotary position embeddings** on q/k of every patch token
    (CLS excluded): per spatial axis, ``head_dim/4`` frequency bands
    ``temperature**(-i/(hd/4))``, coordinates rescaled to a reference grid,
    sin/cos concatenated over (axis, band) then interleave-duplicated to
    head_dim; rotation acts on interleaved pairs.
  * separate q/k/v projections where **k carries no bias** (the paper's
    trick for numerical symmetry under rope),
  * **SwiGLU FFN with sub-LN**: gate/value projections, SiLU gating, an
    extra LayerNorm on the hidden activations before the down projection.

  Final embedding (timm ``num_classes=0`` + default avg pool): mean over
  patch tokens, then the ``fc_norm`` LayerNorm.

Numeric oracle: timm itself is not installed (same reason the reference
pins ``timm==0.9.7``), so tests/goldens/make_eva02_golden.py renders the
published architecture independently in eager torch and checks in a
timm-schema state dict + golden activations (tests/goldens/eva02_tiny.npz);
test_eva02.py asserts converter+model output parity against it, plus
structural pins (rope algebra, k-bias absence, CLS exclusion, converter
key coverage).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Eva02Config:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    # published base recipe: mlp_ratio = 4 * 2/3 -> hidden 2048
    mlp_hidden: int = 2048
    image_size: int = 224
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    rope_temperature: float = 10000.0
    # rope coordinates are rescaled grid/ref_grid (matters only when the
    # input grid differs from the pretraining grid)
    ref_grid: Tuple[int, int] = (16, 16)
    dtype: Any = jnp.float32

    @property
    def grid(self) -> Tuple[int, int]:
        g = self.image_size // self.patch_size
        return (g, g)

    @property
    def num_patches(self) -> int:
        return self.grid[0] * self.grid[1]

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(**kw) -> "Eva02Config":
        base = dict(hidden_size=32, num_layers=2, num_heads=4, mlp_hidden=24,
                    image_size=28, patch_size=7, ref_grid=(4, 4))
        base.update(kw)
        return Eva02Config(**base)


def rope_2d(grid: Tuple[int, int], head_dim: int,
            ref_grid: Tuple[int, int] | None = None,
            temperature: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """Axial 2D rotary tables -> (sin, cos), each [H*W, head_dim].

    Per axis: ``head_dim/4`` bands with inverse-power frequencies; the
    (axis, band) sin/cos planes are flattened in axis-major order and each
    entry duplicated onto its interleaved pair, so rotation pairs
    (2i, 2i+1) share one angle.
    """
    nb = head_dim // 4
    assert nb * 4 == head_dim, f"head_dim {head_dim} must be divisible by 4"
    bands = 1.0 / temperature ** (np.arange(nb, dtype=np.float64) / nb)
    coords = [np.arange(s, dtype=np.float64) for s in grid]
    if ref_grid is not None:
        coords = [c / g * r for c, g, r in zip(coords, grid, ref_grid)]
    mesh = np.stack(np.meshgrid(*coords, indexing="ij"), axis=-1)  # [H,W,2]
    angles = mesh[..., None] * bands                               # [H,W,2,nb]
    flat = angles.reshape(-1, 2 * nb)                              # [N, hd/2]
    sin = np.repeat(np.sin(flat), 2, axis=-1).astype(np.float32)   # [N, hd]
    cos = np.repeat(np.cos(flat), 2, axis=-1).astype(np.float32)
    return sin, cos


def apply_rope(x: jnp.ndarray, sin: jnp.ndarray, cos: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs: x[..., N, hd] with sin/cos [N, hd]."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(x.shape)
    return x * cos + rot * sin


class Eva02Block(nn.Module):
    cfg: Eva02Config

    @nn.compact
    def __call__(self, x, sin, cos):
        cfg = self.cfg
        D, H, hd = cfg.hidden_size, cfg.num_heads, cfg.head_dim
        B, N, _ = x.shape

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm1")(x)
        q = nn.Dense(D, name="q_proj")(h).reshape(B, N, H, hd)
        k = nn.Dense(D, use_bias=False, name="k_proj")(h).reshape(B, N, H, hd)
        v = nn.Dense(D, name="v_proj")(h).reshape(B, N, H, hd)
        # rotate patch tokens only; the CLS row has no spatial coordinate
        q = jnp.concatenate(
            [q[:, :1], apply_rope(q[:, 1:].swapaxes(1, 2), sin, cos).swapaxes(1, 2)],
            axis=1)
        k = jnp.concatenate(
            [k[:, :1], apply_rope(k[:, 1:].swapaxes(1, 2), sin, cos).swapaxes(1, 2)],
            axis=1)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd)
        probs = jnp.asarray(
            nn.softmax(scores.astype(jnp.float32), axis=-1), x.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, N, D)
        x = x + nn.Dense(D, name="proj")(att)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="norm2")(x)
        g = nn.Dense(cfg.mlp_hidden, name="fc1_g")(h)
        u = nn.Dense(cfg.mlp_hidden, name="fc1_x")(h)
        h = nn.silu(g) * u
        # sub-LN: normalize the gated hidden before the down projection
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="mlp_norm")(h)
        return x + nn.Dense(D, name="fc2")(h)


class Eva02Model(nn.Module):
    cfg: Eva02Config

    @nn.compact
    def __call__(self, pixels: jnp.ndarray):
        """pixels: [B, H, W, 3] (NHWC) -> dict with last_hidden_state
        [B, 1+P, D] and pooled [B, D] (patch-token mean -> fc_norm, the
        timm num_classes=0 embedding the reference harvests)."""
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
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, cfg.num_patches + 1, D))
        x = x + pos

        sin_np, cos_np = rope_2d(cfg.grid, cfg.head_dim, cfg.ref_grid,
                                 cfg.rope_temperature)
        sin, cos = jnp.asarray(sin_np), jnp.asarray(cos_np)
        for i in range(cfg.num_layers):
            x = Eva02Block(cfg, name=f"blocks_{i}")(x, sin, cos)
        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="fc_norm")(
            x[:, 1:].mean(axis=1))
        return {"last_hidden_state": x, "pooled": pooled}

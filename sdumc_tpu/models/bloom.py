"""BLOOM decoder (bloom-7b1) — ALiBi-attention LLM text-feature family.

The reference's text extractor treats BLOOM like the other LLMs: fp16
forward, hidden layers [-4..-1] summed, special-token span stripped
(extract_text_embedding_huggingface.py:73,170,193-196). Architecture:

  word embeddings -> embedding LayerNorm -> N pre-LN layers with fused-QKV
  multi-head attention + ALiBi additive slopes (no positional embeddings)
  and gelu(tanh) MLP -> final LayerNorm.

ALiBi makes extraction buckets trivially shape-polymorphic: the bias is a
closed-form function of key position, computed in-graph per bucket.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BloomConfig:
    vocab_size: int = 250880
    hidden_size: int = 4096
    num_layers: int = 30
    num_heads: int = 32
    layer_norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def tiny(**kw) -> "BloomConfig":
        base = dict(vocab_size=96, hidden_size=32, num_layers=2, num_heads=4)
        base.update(kw)
        return BloomConfig(**base)


def alibi_slopes(num_heads: int) -> jnp.ndarray:
    """HF build_alibi_tensor's slope schedule."""
    closest = 2 ** math.floor(math.log2(num_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(closest) - 3)))
    slopes = [base ** (i + 1) for i in range(closest)]
    if closest != num_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * closest) - 3)))
        n_extra = min(closest, num_heads - closest)
        slopes += [extra_base ** (2 * i + 1) for i in range(n_extra)]
    return jnp.asarray(slopes, jnp.float32)


def build_alibi(pad_mask: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[B, T] attend-mask -> [B, H, 1, T] additive bias (HF semantics:
    position index = cumsum over unmasked keys - 1, masked keys get 0 —
    they are excluded by the attention mask anyway)."""
    slopes = alibi_slopes(num_heads)
    m = pad_mask.astype(jnp.float32)
    positions = (jnp.cumsum(m, axis=-1) - 1.0) * m           # [B, T]
    return slopes[None, :, None, None] * positions[:, None, None, :]


class BloomAttention(nn.Module):
    cfg: BloomConfig

    @nn.compact
    def __call__(self, x, alibi, attn_mask):
        c = self.cfg
        B, T, D = x.shape
        H, hd = c.num_heads, c.head_dim
        # fused QKV, HF's per-head-interleaved layout preserved by the
        # converter: output features ordered (h0:q,k,v)(h1:q,k,v)...
        qkv = nn.Dense(3 * D, name="query_key_value")(x)
        qkv = qkv.reshape(B, T, H, 3, hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
        scores = scores.astype(jnp.float32) + alibi[:, :, :, :].astype(jnp.float32)
        scores = scores + attn_mask
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return nn.Dense(D, name="dense")(out)


class BloomLayer(nn.Module):
    cfg: BloomConfig

    @nn.compact
    def __call__(self, x, alibi, attn_mask):
        c = self.cfg
        h = BloomAttention(c, name="self_attention")(
            nn.LayerNorm(epsilon=c.layer_norm_eps, name="input_layernorm")(x),
            alibi, attn_mask)
        x = x + h
        h = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="post_attention_layernorm")(x)
        h = nn.Dense(4 * c.hidden_size, name="dense_h_to_4h")(h)
        h = nn.gelu(h, approximate=True)  # BLOOM's tanh gelu
        h = nn.Dense(c.hidden_size, name="dense_4h_to_h")(h)
        return x + h


class BloomModel(nn.Module):
    cfg: BloomConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
    ):
        c = self.cfg
        B, T = input_ids.shape
        if pad_mask is None:
            pad_mask = jnp.ones((B, T), bool)
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                     name="word_embeddings")(input_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps,
                         name="word_embeddings_layernorm")(x)
        alibi = build_alibi(pad_mask, c.num_heads)
        causal = jnp.tril(jnp.ones((T, T), bool))
        ok = causal[None] & pad_mask[:, None, :]
        attn_mask = jnp.where(ok, 0.0, -1e30)[:, None]        # [B,1,T,T]

        hidden_states = [x] if output_hidden_states else None
        for i in range(c.num_layers):
            x = BloomLayer(c, name=f"h_{i}")(x, alibi, attn_mask)
            if output_hidden_states:
                hidden_states.append(x)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ln_f")(x)
        if output_hidden_states:
            hidden_states[-1] = x  # HF: last entry is post-final-LN
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
        }

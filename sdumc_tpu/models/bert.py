"""BERT-family bidirectional encoder (bert / roberta / macbert / simbert).

The reference's text extractor drives ~20 BERT-family checkpoints through
the same HF path: tokenize -> forward -> hidden_states[layer_ids] summed ->
meaningful-token span (extract_text_embedding_huggingface.py:17-47,139-282).
This is the post-LN transformer encoder in JAX:

  word + position + token-type embeddings -> LN
  -> N layers of (MHA -> add&LN -> gelu MLP -> add&LN)

RoBERTa differs only in the position-id offset (pad_token_id + 1 = 2).
Bidirectional attention means batched extraction needs only a key padding
mask — no causal structure, so whole buckets run in one MXU-friendly
forward (extract/text.py drives it with the same bucketing as LLaMA).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    position_offset: int = 0          # roberta: pad_token_id + 1 = 2
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**kw) -> "BertConfig":
        base = dict(vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64)
        base.update(kw)
        return BertConfig(**base)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, pad_mask=None):
        c = self.cfg
        B, T, D = x.shape
        H = c.num_heads
        hd = D // H
        q = nn.Dense(D, name="query")(x).reshape(B, T, H, hd)
        k = nn.Dense(D, name="key")(x).reshape(B, T, H, hd)
        v = nn.Dense(D, name="value")(x).reshape(B, T, H, hd)
        scores = jnp.einsum("bthd,bshd->bhts", q, k) / jnp.sqrt(hd)
        if pad_mask is not None:  # [B, T] True = attend
            scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        return jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, pad_mask=None):
        c = self.cfg
        h = BertSelfAttention(c, name="self_attn")(x, pad_mask)
        h = nn.Dense(c.hidden_size, name="attn_output")(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + h)
        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(x + h)


class BertModel(nn.Module):
    """Returns last_hidden_state + per-layer hidden_states (HF convention:
    entry 0 is the embedding output; post-LN means no extra final norm)."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        pad_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
    ):
        c = self.cfg
        B, T = input_ids.shape
        word = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                        name="word_embeddings")(input_ids)
        positions = jnp.arange(T)[None] + c.position_offset
        pos = nn.Embed(c.max_position_embeddings, c.hidden_size, dtype=c.dtype,
                       name="position_embeddings")(
            jnp.broadcast_to(positions, (B, T)))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, T), jnp.int32)
        tok = nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(
            word + pos + tok)

        hidden_states = [x] if output_hidden_states else None
        for i in range(c.num_layers):
            x = BertLayer(c, name=f"layers_{i}")(x, pad_mask)
            if output_hidden_states:
                hidden_states.append(x)
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
        }

"""ALBERT encoder (albert-base/large/xxlarge + Chinese tiny/small variants).

Part of the reference text-extractor family sweep
(extract_text_embedding_huggingface.py:21-23,56-57). ALBERT = BERT with a
factorized embedding (E=128 -> D projection) and ONE transformer layer's
parameters shared across all depth repeats — in Flax the sharing is just
calling the same module instance in a loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AlbertConfig:
    vocab_size: int = 30000
    embedding_size: int = 128
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu_new"
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**kw) -> "AlbertConfig":
        base = dict(vocab_size=99, embedding_size=16, hidden_size=32,
                    num_layers=3, num_heads=4, intermediate_size=64,
                    max_position_embeddings=64)
        base.update(kw)
        return AlbertConfig(**base)


def _act(name: str):
    if name in ("gelu_new", "gelu_python"):
        return lambda x: nn.gelu(x, approximate=True)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    if name == "relu":
        return nn.relu
    raise ValueError(name)


class AlbertLayer(nn.Module):
    cfg: AlbertConfig

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
        if pad_mask is not None:
            scores = jnp.where(pad_mask[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        h = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        h = nn.Dense(D, name="attn_dense")(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + h)
        h = nn.Dense(c.intermediate_size, name="ffn")(x)
        h = _act(c.hidden_act)(h)
        h = nn.Dense(D, name="ffn_output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="full_layer_ln")(x + h)


class AlbertModel(nn.Module):
    cfg: AlbertConfig

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
        word = nn.Embed(c.vocab_size, c.embedding_size, dtype=c.dtype,
                        name="word_embeddings")(input_ids)
        pos = nn.Embed(c.max_position_embeddings, c.embedding_size,
                       dtype=c.dtype, name="position_embeddings")(
            jnp.broadcast_to(jnp.arange(T)[None], (B, T)))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((B, T), jnp.int32)
        tok = nn.Embed(c.type_vocab_size, c.embedding_size, dtype=c.dtype,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(
            word + pos + tok)
        x = nn.Dense(c.hidden_size, name="embedding_projection")(x)

        shared = AlbertLayer(c, name="layer")  # ONE set of params
        hidden_states = [x] if output_hidden_states else None
        for _ in range(c.num_layers):
            x = shared(x, pad_mask)
            if output_hidden_states:
                hidden_states.append(x)
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
        }

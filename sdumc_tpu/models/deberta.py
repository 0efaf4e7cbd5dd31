"""DeBERTa (v1) encoder — disentangled-attention text-feature family.

The reference sweeps deberta-base/large and the Chinese deberta-large
through the same extractor path (extract_text_embedding_huggingface.py:
32-35,41). Architecture (per the released checkpoints: relative_attention
on, position_biased_input off — no absolute position embeddings):

  word embeddings -> LN -> pad rows zeroed
  -> N layers of disentangled attention + post-LN MLP, with a SHARED
     relative-position embedding table [2*max_rel, D]:
       score[t,s] = (q/√(3d))·k[s]                      content->content
                  + (q/√(3d))[t]·pos_k[δ(t,s)]          content->position
                  + k[s]·(pos_q/√(3d))[δ(t,s)]          position->content
     δ(t,s) = clamp(t - s + span, 0, 2span-1), span = min(T, max_rel).

The two position terms are dense [B,H,T,2span] matmuls followed by a
take_along_axis gather — MXU-friendly, no [T,T,D] tensors.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DebertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    max_relative_positions: int = 512   # = max_position_embeddings when -1
    type_vocab_size: int = 0
    position_biased_input: bool = False
    pos_att_type: tuple = ("c2p", "p2c")   # released checkpoints' setting
    layer_norm_eps: float = 1e-7
    dtype: Any = jnp.float32

    @staticmethod
    def tiny(**kw) -> "DebertaConfig":
        base = dict(vocab_size=99, hidden_size=32, num_layers=2, num_heads=4,
                    intermediate_size=64, max_position_embeddings=64,
                    max_relative_positions=16)
        base.update(kw)
        return DebertaConfig(**base)


class DisentangledAttention(nn.Module):
    cfg: DebertaConfig

    @nn.compact
    def __call__(self, x, rel_embed, valid):
        """x: [B,T,D]; rel_embed: [2*max_rel, D]; valid: [B,T] bool."""
        c = self.cfg
        B, T, D = x.shape
        H = c.num_heads
        hd = D // H
        scale = math.sqrt(hd * (1 + len(c.pos_att_type)))

        qkv = nn.Dense(3 * D, use_bias=False, name="in_proj")(x)
        qkv = qkv.reshape(B, T, H, 3, hd)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        q_bias = self.param("q_bias", nn.initializers.zeros, (D,))
        v_bias = self.param("v_bias", nn.initializers.zeros, (D,))
        q = q + q_bias.reshape(H, hd)
        v = v + v_bias.reshape(H, hd)
        q = q / scale

        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)

        if c.pos_att_type:
            span = min(T, c.max_relative_positions)
            rel_slice = rel_embed[
                c.max_relative_positions - span: c.max_relative_positions + span]
            rel = jnp.arange(T)[:, None] - jnp.arange(T)[None, :]   # t - s
            idx = jnp.clip(rel + span, 0, 2 * span - 1)             # [T, T]

            if "c2p" in c.pos_att_type:
                pos_k = nn.Dense(D, use_bias=False, name="pos_proj")(
                    rel_slice).reshape(2 * span, H, hd)
                c2p_full = jnp.einsum("bthd,mhd->bhtm", q, pos_k)
                c2p = jnp.take_along_axis(
                    c2p_full,
                    jnp.broadcast_to(idx[None, None], (B, H, T, T)), axis=-1)
                scores = scores + c2p.astype(jnp.float32)
            if "p2c" in c.pos_att_type:
                pos_q = (nn.Dense(D, name="pos_q_proj")(rel_slice)
                         / scale).reshape(2 * span, H, hd)
                p2c_full = jnp.einsum("bshd,mhd->bhsm", k, pos_q)
                p2c_st = jnp.take_along_axis(
                    p2c_full,
                    jnp.broadcast_to(idx.T[None, None], (B, H, T, T)), axis=-1)
                scores = scores + jnp.swapaxes(p2c_st, -1, -2).astype(jnp.float32)

        ok = valid[:, None, :, None] & valid[:, None, None, :]       # q AND k
        scores = jnp.where(ok, scores, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v).reshape(B, T, D)
        return out


class DebertaLayer(nn.Module):
    cfg: DebertaConfig

    @nn.compact
    def __call__(self, x, rel_embed, valid):
        c = self.cfg
        h = DisentangledAttention(c, name="self_attn")(x, rel_embed, valid)
        h = nn.Dense(c.hidden_size, name="attn_output")(h)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln")(x + h)
        h = nn.Dense(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="output_ln")(x + h)


class DebertaModel(nn.Module):
    cfg: DebertaConfig

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
        if pad_mask is None:
            pad_mask = jnp.ones((B, T), bool)
        x = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                     name="word_embeddings")(input_ids)
        if c.position_biased_input:
            x = x + nn.Embed(c.max_position_embeddings, c.hidden_size,
                             dtype=c.dtype, name="position_embeddings")(
                jnp.broadcast_to(jnp.arange(T)[None], (B, T)))
        if c.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros((B, T), jnp.int32)
            x = x + nn.Embed(c.type_vocab_size, c.hidden_size, dtype=c.dtype,
                             name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="embeddings_ln")(x)
        x = x * pad_mask[:, :, None].astype(x.dtype)  # HF zeroes pad rows

        rel_embed = self.param(
            "rel_embeddings", nn.initializers.normal(0.02),
            (2 * c.max_relative_positions, c.hidden_size))
        rel_embed = jnp.asarray(rel_embed)

        hidden_states = [x] if output_hidden_states else None
        for i in range(c.num_layers):
            x = DebertaLayer(c, name=f"layers_{i}")(x, rel_embed, pad_mask)
            if output_hidden_states:
                hidden_states.append(x)
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
        }

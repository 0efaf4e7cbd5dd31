"""Cross-modal transformer encoder + small encoders (baseline toolbox).

Reference: toolkit/models/modules/transformers_encoder/{transformer,
multihead_attention,position_embedding}.py (fairseq-derived MulT encoder
with cross-modal K/V and sinusoidal positions) and modules/encoder.py's
MLP/LSTM encoders — dormant on the live SDUMC path but the substrate for
the stripped MulT/TFN/LMF baseline families. Rebuilt TPU-idiomatically:
pre-LN blocks, one einsum attention, optional K/V from a second modality.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding table (reference position_embedding.py:29-79,
    fairseq convention: sin | cos halves, zero-pad odd dims)."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1) if half > 1 else 1.0
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    args = jnp.arange(length, dtype=jnp.float32)[:, None] * freqs[None, :]
    table = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        table = jnp.concatenate([table, jnp.zeros((length, 1))], axis=1)
    return table


class _Attention(nn.Module):
    dim: int
    heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, q, kv, *, mask=None, deterministic=True):
        h = self.heads
        hd = self.dim // h
        B, Tq, _ = q.shape
        Tk = kv.shape[1]
        qp = nn.Dense(self.dim, name="q_proj")(q).reshape(B, Tq, h, hd)
        kp = nn.Dense(self.dim, name="k_proj")(kv).reshape(B, Tk, h, hd)
        vp = nn.Dense(self.dim, name="v_proj")(kv).reshape(B, Tk, h, hd)
        scores = jnp.einsum("bqhd,bkhd->bhqk", qp, kp) / math.sqrt(hd)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vp).reshape(B, Tq, self.dim)
        return nn.Dense(self.dim, name="out_proj")(out)


class CrossModalTransformerEncoder(nn.Module):
    """Stack of pre-LN blocks; queries from `x`, keys/values from `x_kv`
    when given (MulT's cross-modal attention), else self-attention.
    Optionally causal ("attn_mask" in the reference)."""

    dim: int
    layers: int
    heads: int = 8
    ffn_mult: int = 4
    dropout: float = 0.0
    causal: bool = False
    scale_embeds: bool = True

    @nn.compact
    def __call__(self, x, x_kv: Optional[jnp.ndarray] = None, *,
                 deterministic: bool = True):
        scale = math.sqrt(self.dim) if self.scale_embeds else 1.0
        x = x * scale + sinusoidal_positions(x.shape[1], self.dim)[None]
        if x_kv is not None:
            x_kv = x_kv * scale + sinusoidal_positions(x_kv.shape[1], self.dim)[None]
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        mask = None
        if self.causal and x_kv is None:
            mask = jnp.tril(jnp.ones((x.shape[1], x.shape[1]), bool))[None, None]

        for i in range(self.layers):
            kv_in = x if x_kv is None else x_kv
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            kv = nn.LayerNorm(name=f"ln_kv_{i}")(kv_in) if x_kv is not None else h
            x = x + nn.Dropout(self.dropout, deterministic=deterministic)(
                _Attention(self.dim, self.heads, self.dropout, name=f"attn_{i}")(
                    h, kv, mask=mask, deterministic=deterministic
                )
            )
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(self.dim * self.ffn_mult, name=f"fc1_{i}")(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Dense(self.dim, name=f"fc2_{i}")(h)
            x = x + nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(name="ln_final")(x)


class MLPEncoder(nn.Module):
    """Utterance-level MLP encoder (reference modules/encoder.py:9-41)."""

    hidden: int
    out_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.out_dim, name="fc2")(x)
        return nn.relu(x)


class LSTMEncoder(nn.Module):
    """Frame-level Bi-LSTM encoder -> last-state concat (reference
    modules/encoder.py:45-72), via lax.scan-backed flax RNN."""

    hidden: int
    out_dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        fwd = nn.RNN(nn.LSTMCell(self.hidden), name="fwd")(x)
        bwd = nn.RNN(nn.LSTMCell(self.hidden), reverse=True, name="bwd")(x)
        last = jnp.concatenate([fwd[:, -1], bwd[:, 0]], axis=-1)
        last = nn.Dropout(self.dropout, deterministic=deterministic)(last)
        return nn.relu(nn.Dense(self.out_dim, name="out")(last))

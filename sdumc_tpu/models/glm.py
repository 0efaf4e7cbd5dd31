"""GLM/ChatGLM-family decoder (chatglm2-6b lineage) in JAX.

The reference's text extractor drives 'chatglm2-6b' through HF
(feature_extraction/text/extract_text_embedding_huggingface.py:139-282 with
the name registry entry toolkit/globals.py). chatglm2's own modeling code
ships only via trust_remote_code, but its architecture is exactly what
transformers later adopted as the HF-native ``GlmModel`` (glm/glm-4 lineage):
RMSNorm pre-norm blocks, **partial interleaved rotary** (GPT-J-style pairs on
the first ``partial_rotary_factor`` fraction of each head, pass-through for
the rest), grouped-query attention with QKV bias, and a fused
gate_up SwiGLU MLP. We implement that architecture once; the converter
(convert/hf_glm.py) accepts both HF-native Glm checkpoints and original
THUDM chatglm2 state dicts (fused query_key_value / dense_h_to_4h naming).

Parity oracle: HF ``GlmModel`` on tiny configs (tests/test_text_families.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sdumc_tpu.models.llama import RMSNorm, _dense


@dataclasses.dataclass(frozen=True)
class GlmConfig:
    vocab_size: int = 65024            # chatglm2-6b
    hidden_size: int = 4096
    intermediate_size: int = 13696
    num_layers: int = 28
    num_heads: int = 32
    num_kv_heads: int = 2              # chatglm2 multi-query groups
    head_dim: int = 128
    partial_rotary_factor: float = 0.5
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    attention_bias: bool = True
    dtype: Any = jnp.bfloat16

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @staticmethod
    def tiny(**kw) -> "GlmConfig":
        base = dict(vocab_size=128, hidden_size=64, intermediate_size=96,
                    num_layers=3, num_heads=4, num_kv_heads=2, head_dim=16,
                    dtype=jnp.float32)
        base.update(kw)
        return GlmConfig(**base)


def partial_interleaved_rope(x: jnp.ndarray, positions: jnp.ndarray,
                             rotary_dim: int, theta: float) -> jnp.ndarray:
    """GLM rotary: adjacent-pair (interleaved, GPT-J style) rotation on the
    first ``rotary_dim`` dims of each head; the rest passes through.
    x: [B, T, H, hd]; positions: [B, T]."""
    half = rotary_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * inv_freq   # [B,T,half]
    cos = jnp.cos(angles)[:, :, None, :]                           # [B,T,1,half]
    sin = jnp.sin(angles)[:, :, None, :]
    rot = x[..., :rotary_dim].astype(jnp.float32)
    rest = x[..., rotary_dim:]
    x1 = rot[..., 0::2]
    x2 = rot[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    out = jnp.stack([o1, o2], axis=-1).reshape(rot.shape).astype(x.dtype)
    return jnp.concatenate([out, rest], axis=-1)


def _bdense(features, name, dtype, use_bias):
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name,
                    kernel_init=nn.initializers.normal(0.02))


class GlmAttention(nn.Module):
    cfg: GlmConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        c = self.cfg
        B, T, _ = x.shape
        q = _bdense(c.num_heads * c.head_dim, "q_proj", c.dtype,
                    c.attention_bias)(x).reshape(B, T, c.num_heads, c.head_dim)
        k = _bdense(c.num_kv_heads * c.head_dim, "k_proj", c.dtype,
                    c.attention_bias)(x).reshape(B, T, c.num_kv_heads, c.head_dim)
        v = _bdense(c.num_kv_heads * c.head_dim, "v_proj", c.dtype,
                    c.attention_bias)(x).reshape(B, T, c.num_kv_heads, c.head_dim)
        q = partial_interleaved_rope(q, positions, c.rotary_dim, c.rope_theta)
        k = partial_interleaved_rope(k, positions, c.rotary_dim, c.rope_theta)
        if c.num_kv_heads != c.num_heads:
            rep = c.num_heads // c.num_kv_heads
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
        scores = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        scores = scores / jnp.sqrt(c.head_dim).astype(jnp.float32) + mask
        probs = jax.nn.softmax(scores, axis=-1).astype(c.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, v)
        out = out.reshape(B, T, c.num_heads * c.head_dim)
        return _dense(c.hidden_size, "o_proj", c.dtype)(out)


class GlmMLP(nn.Module):
    cfg: GlmConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate_up = _dense(2 * c.intermediate_size, "gate_up_proj", c.dtype)(x)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        return _dense(c.hidden_size, "down_proj", c.dtype)(up * nn.silu(gate))


class GlmLayer(nn.Module):
    cfg: GlmConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        h = GlmAttention(self.cfg, name="self_attn")(
            RMSNorm(self.cfg.rms_eps, name="input_layernorm")(x),
            positions, mask)
        x = x + h
        x = x + GlmMLP(self.cfg, name="mlp")(
            RMSNorm(self.cfg.rms_eps, name="post_attention_layernorm")(x))
        return x


class GlmModel(nn.Module):
    """Decoder trunk; returns final hidden + per-layer hidden taps
    (HF convention: hidden_states[0] is the embedding output, the last
    entry is post-final-norm)."""

    cfg: GlmConfig

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        positions: Optional[jnp.ndarray] = None,
        attn_mask: Optional[jnp.ndarray] = None,
        pad_mask: Optional[jnp.ndarray] = None,
        output_hidden_states: bool = False,
    ):
        c = self.cfg
        embed = nn.Embed(c.vocab_size, c.hidden_size, dtype=c.dtype,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embed_tokens")
        x = embed(input_ids) if inputs_embeds is None else inputs_embeds.astype(c.dtype)
        B, T, _ = x.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        if attn_mask is None:
            causal = jnp.tril(jnp.ones((T, T), bool))[None, :, :]
            if pad_mask is not None:
                causal = causal & pad_mask[:, None, :]
            attn_mask = jnp.where(causal, 0.0, -1e30)[:, None]

        hidden_states = [x] if output_hidden_states else None
        for i in range(c.num_layers):
            x = GlmLayer(c, name=f"layers_{i}")(x, positions, attn_mask)
            if output_hidden_states:
                hidden_states.append(x)
        x = RMSNorm(c.rms_eps, name="norm")(x)
        if output_hidden_states:
            hidden_states[-1] = x
        return {
            "last_hidden_state": x,
            "hidden_states": tuple(hidden_states) if output_hidden_states else None,
        }
